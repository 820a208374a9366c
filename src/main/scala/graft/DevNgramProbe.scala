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
      // stage-by-stage (mirrors Dedup.ngramJaccardPairs internals)
      val cappedAgg = org.apache.spark.sql.functions.udaf(
        new graft.llm.Dedup.CappedDocList(200),
        org.apache.spark.sql.Encoders.scalaLong)
      val posting = shAll.groupBy("sh")
        .agg(cappedAgg(col("doc_id")).as("ds"))
        .filter(size(col("ds")) > 0)
        .select("ds")
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      t("posting UDAF agg")(println("  postings=" + posting.count()))
      val sizes = posting.select(explode(col("ds")).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("sz"))
      t("sizes")(println("  sizes=" + sizes.count()))
      val inter = posting
        .select(explode(col("ds")).as("doc_a"), col("ds"))
        .select(col("doc_a"), explode(col("ds")).as("doc_b"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("inter"))
      t("inter pairs")(println("  inter=" + inter.count()))
      val joined = inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza"))
          .hint("shuffle_hash"), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb"))
          .hint("shuffle_hash"), "doc_b")
        .withColumn("jaccard", col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")))
        .filter(col("jaccard") >= 0.2)
      t("sizes joins + filter")(println("  out=" + joined.count()))
      posting.unpersist()
      val pairs = t("full ngramJaccardPairs build+count")(
        graft.llm.Dedup.ngramJaccardPairs(docs, 3, 0.2).count())
      println("  pairs=" + pairs)
      graft.ops.Caches.drain()
    }
    spark.stop()
  }
}
