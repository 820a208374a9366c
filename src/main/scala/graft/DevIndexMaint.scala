package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness for CROSS-PROCESS ANN-index maintenance races: drives
  * `llm.Pq`'s build/extend/compact against an EXPLICIT durable root, so
  * two plain JVM processes can race the same index and the commit-log
  * arbitration (not the in-process lock) is what keeps them safe — the
  * `DevStateMaint` discipline, applied to the index whose MANIFEST swap
  * used to be the unarbitrated single-writer pattern. The audit op
  * verifies the code-for-code exactly-once law from outside: every
  * expected vec_id carries exactly m code rows and one cells row, no id
  * doubled by a replayed or raced extend, none dropped by a concurrent
  * compaction, and the id-Bloom sidecar answers a full-corpus
  * pendingArrivals probe with zero.
  *
  * Usage:
  *   runMain graft.DevIndexMaint --root /tmp/idx --op build --n 2000
  *   runMain graft.DevIndexMaint --root /tmp/idx --op extend \
  *     --seed 1000000 --n 5000 [--barrier /tmp/b]
  *   runMain graft.DevIndexMaint --root /tmp/idx --op compact
  *   runMain graft.DevIndexMaint --root /tmp/idx --op audit \
  *     --seeds 0:2000,1000000:5000
  */
object DevIndexMaint {
  private val Dim = 16
  private val M = 4

  /** Deterministic fabricated embeddings: `n` vectors with ids
    * [seed, seed+n) and sine-generated coordinates — content is a pure
    * function of the id, so racing processes fabricating the same
    * (seed, n) stage byte-identical deltas and the audit can recompute
    * any shard.
    */
  private def fab(spark: SparkSession, seed: Long, n: Long): DataFrame =
    spark.range(n).select(
      (col("id") + lit(seed)).as("vec_id"),
      expr(s"transform(sequence(0, ${Dim - 1}), " +
        s"j -> cast(sin((id + ${seed}L) * 131 + j) as float))")
        .as("embedding"))

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k -> v
    }.toMap
    val root = opts("--root")
    val op = opts.getOrElse("--op", "audit")
    val seed = opts.getOrElse("--seed", "0").toLong
    val n = opts.getOrElse("--n", "2000").toLong

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // race-alignment barrier (see DevStateMaint): both sessions come up
    // first, then spin until the orchestrator creates the barrier file
    opts.get("--barrier").foreach { b =>
      while (!java.nio.file.Files.exists(java.nio.file.Paths.get(b)))
        Thread.sleep(20)
    }

    op match {
      case "build" =>
        llm.Pq.buildIvfPqTrained(spark, root, fab(spark, seed, n),
          k = 8, m = M, kb = 8, iters = 0)
        println(s"[indexmaint] built $root: " +
          llm.Pq.codesOf(spark, root).select("vec_id").distinct()
            .count() + " ids")
      case "extend" =>
        val rounds = opts.getOrElse("--rounds", "1").toInt
        (0 until rounds).foreach { r =>
          val t0 = System.nanoTime()
          llm.Pq.extendIvfPqIndex(spark, root,
            fab(spark, seed + r * n, n))
          println(f"[indexmaint] extend seed=$seed round $r done in " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s: head=" +
            graft.io.CommitLog.currentVersion(root))
        }
      case "compact" =>
        val t0 = System.nanoTime()
        llm.Pq.compactIndex(spark, root, targetFiles = 4)
        println(f"[indexmaint] compacted $root in " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s: manifest=" +
          llm.Pq.liveIndexManifest(root).render)
      case "vacuum" =>
        val reaped = llm.Pq.vacuumIndex(root,
          opts.getOrElse("--older-ms", "0").toLong)
        println(s"[indexmaint] vacuumed $root: ${reaped.mkString(",")}")
      case "audit" =>
        // --seeds seed:n,seed:n — the union of the build and every
        // extend's id space; recomputed here, never read from state
        val expected = opts("--seeds").split(',').toSeq
          .map(_.split(':'))
          .map(a => fab(spark, a(0).toLong, a(1).toLong))
          .reduce(_.unionByName(_))
        val expectedIds = expected.select("vec_id")
        val nExpected = expectedIds.count()
        val codes = llm.Pq.codesOf(spark, root)
        val total = codes.count()
        val ids = codes.select("vec_id").distinct()
        val nIds = ids.count()
        val missing = expectedIds.join(ids, Seq("vec_id"), "left_anti")
          .count()
        val extra = ids.join(expectedIds, Seq("vec_id"), "left_anti")
          .count()
        // per-(vec_id, sub) multiplicity: any raced double-encode lands
        // duplicate code rows even if the id set looks right
        val dupPairs = codes.groupBy("vec_id", "sub").count()
          .filter(col("count") > 1).count()
        val cellsDup = llm.Pq.cellsOf(spark, root).groupBy("vec_id")
          .count().filter(col("count") > 1).count()
        val pending = llm.Pq.pendingArrivals(spark, root, expected)
          .count()
        println(s"[indexmaint] AUDIT ids=$nIds/$nExpected " +
          s"codeRows=$total (want ${nExpected * M}) missing=$missing " +
          s"extra=$extra dupPairs=$dupPairs cellsDup=$cellsDup " +
          s"pending=$pending head=" +
          graft.io.CommitLog.currentVersion(root) +
          " manifest=" + llm.Pq.liveIndexManifest(root).render)
        if (missing > 0 || extra > 0 || dupPairs > 0 || cellsDup > 0 ||
            total != nExpected * M || pending > 0) {
          println("[indexmaint] AUDIT FAILED")
          spark.stop(); sys.exit(1)
        }
        println("[indexmaint] AUDIT OK")
      case other => sys.error(s"unknown --op $other")
    }
    spark.stop()
  }
}
