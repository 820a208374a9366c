package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness for CROSS-PROCESS dedup-state maintenance races: drives
  * `llm.Selection`'s build/extend/compact against an EXPLICIT durable
  * root, so two plain JVM processes can race the same state and the
  * commit-log arbitration (not the in-process lock) is what keeps them
  * safe. The audit op verifies the exactly-once law from outside:
  * every salt's fabricated addresses present exactly once, no
  * duplicates anywhere, bloom consistent with the fingerprint set.
  *
  * Usage:
  *   runMain graft.DevStateMaint --root /tmp/state --op build \
  *     --dir /root/testdata/sf0.001
  *   runMain graft.DevStateMaint --root /tmp/state --op extend \
  *     --salt runA --n 5000 --rounds 3
  *   runMain graft.DevStateMaint --root /tmp/state --op compact
  *   runMain graft.DevStateMaint --root /tmp/state --op audit \
  *     --salt runA,runB --n 5000 --rounds 3
  */
object DevStateMaint {
  private def fabricated(spark: SparkSession, salt: String, n: Long) =
    spark.range(n).select(
      (col("id") + 9000000L).as("doc_id"),
      md5(concat(lit(s"race_${salt}_"), col("id").cast("string"))
        .cast("binary")).as("clean_md5"))

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k -> v
    }.toMap
    val root = opts("--root")
    val op = opts.getOrElse("--op", "audit")
    val dir = opts.getOrElse("--dir", "/root/testdata/sf0.001")
    val salt = opts.getOrElse("--salt", "a")
    val n = opts.getOrElse("--n", "5000").toLong
    val rounds = opts.getOrElse("--rounds", "1").toInt

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the probe's might_contain is session-registered (bloomBuild does
    // it as a side effect; a probe-only process must do it explicitly)
    llm.Selection.registerBloom(spark)
    // race-alignment barrier: JVM+Spark startup skew would otherwise
    // serialize "concurrent" processes — both sessions come up first,
    // then spin until the orchestrator creates the barrier file
    opts.get("--barrier").foreach { b =>
      while (!java.nio.file.Files.exists(java.nio.file.Paths.get(b)))
        Thread.sleep(20)
    }

    op match {
      case "build" =>
        llm.Selection.buildDedupStateAt(spark, dir, root)
        println(s"[statemaint] built $root: " +
          llm.Selection.liveFps(spark, root).count() + " fingerprints")
      case "extend" =>
        (0 until rounds).foreach { r =>
          val t0 = System.nanoTime()
          llm.Selection.extendDedupState(spark, root,
            fabricated(spark, s"${salt}_$r", n))
          println(f"[statemaint] extend $salt round $r done in " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s: head=" +
            graft.io.CommitLog.currentVersion(root))
        }
      case "compact" =>
        llm.Selection.compactDedupState(spark, root)
        println(s"[statemaint] compacted $root: manifest=" +
          llm.Selection.liveManifest(root).render)
      case "probe" =>
        // timed probe of a fabricated novel shard (2 repeats: cold then
        // warmed) — the drift-cycle measurement around a compaction
        val shard = fabricated(spark, salt, n)
        (1 to 2).foreach { i =>
          val t0 = System.nanoTime()
          val r = llm.Selection.probeDedupState(spark, root, shard)
            .filter(col("in_corpus")).count()
          println(f"[statemaint] probe $salt n=$n #$i " +
            f"${(System.nanoTime() - t0) / 1e9}%.2f s known=$r")
        }
      case "audit" =>
        val fps = llm.Selection.liveFps(spark, root)
        val total = fps.count()
        val distinct = fps.select("clean_md5").distinct().count()
        val salts = salt.split(',').toSeq
        val wanted = salts.flatMap(s => (0 until rounds).map(r =>
          fabricated(spark, s"${s}_$r", n)))
          .reduce(_.unionByName(_))
        val probed = llm.Selection.probeDedupState(spark, root, wanted)
        val missing = probed.filter(!col("in_corpus")).count()
        println(s"[statemaint] AUDIT total=$total distinct=$distinct " +
          s"dup=${total - distinct} missing=$missing head=" +
          graft.io.CommitLog.currentVersion(root) +
          " manifest=" + llm.Selection.liveManifest(root).render)
        if (total != distinct || missing > 0) {
          println("[statemaint] AUDIT FAILED")
          spark.stop(); sys.exit(1)
        }
        println("[statemaint] AUDIT OK")
      case other => sys.error(s"unknown --op $other")
    }
    spark.stop()
  }
}
