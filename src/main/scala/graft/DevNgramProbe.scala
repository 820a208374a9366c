package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the n-gram-Jaccard pair pipeline. */
object DevNgramProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables(spark, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 3)
    for (round <- 1 to 2) {
      println(s"== round $round")
      val shAll = docs.filter(col("text").isNotNull)
        .select(col("doc_id"),
          explode(graft.functions.TextKernels.shingleHashCol(3, "xxh")(
            col("text"))).as("sh"))
      t("shAll count")(println("  rows=" + shAll.count()))
      t("distinct sh")(println("  n_sh=" +
        shAll.select("sh").distinct().count()))
      val pairs = t("full ngramJaccardPairs build+count")(
        graft.llm.Dedup.ngramJaccardPairs(docs, 3, 0.2).count())
      println("  pairs=" + pairs)
      graft.ops.Caches.drain()
    }
    spark.stop()
  }
}
