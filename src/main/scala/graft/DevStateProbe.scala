package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scale probe for the CROSS-RUN dedup state: builds (or
  * reuses, within one JVM) the persisted fingerprint state for a
  * corpus dir, then times probe jobs of varying shard sizes — the
  * daily-ingestion question "what does a probe COST as a function of
  * shard size now that the state is bucket-pruned?". Repeats each
  * probe so the warmed number is visible next to the cold one.
  *
  * Usage: runMain graft.DevStateProbe <sfDir> [shardDocs ...]
  */
object DevStateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sizes = if (args.length > 1) args.drop(1).map(_.toLong).toSeq
      else Seq(100L, 10000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STATEPROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val root = t("state build (memoized per JVM)") {
      llm.Selection.persistedDedupState(spark, dir)
    }
    // the declared query's replay-shaped shard (the degenerate class)
    // through the CANONICAL address chain — a drifting inline copy
    // would silently measure a different address space
    val full = llm.Selection.addressed(spark, dir)
      .filter(col("doc_id") % 10 === 7)
    (1 to 2).foreach(i => t(s"replay-shard probe #$i") {
      llm.Selection.probeDedupState(spark, root, full).count()
    })
    // daily-shaped shards: novel addresses, residue = Bloom FPs only
    sizes.foreach { n =>
      val shard = spark.range(n)
        .select(col("id").as("doc_id"),
          md5(concat(lit("novel-"), col("id").cast("string"))
            .cast("binary")).as("clean_md5"))
      (1 to 2).foreach(i => t(f"novel-shard n=$n probe #$i") {
        llm.Selection.probeDedupState(spark, root, shard).count()
      })
    }
    spark.stop()
  }
}
