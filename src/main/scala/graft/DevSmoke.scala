package graft

import org.apache.spark.sql.SparkSession

/** Dev-only smoke runner: drives the driver contract surfaces (entry(),
  * a named query, a bad-input probe) exactly as the harness would.
  * Usage: sbt "runMain graft.DevSmoke" [queryName ...]
  */
object DevSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(5, truncate = false)
    for (name <- args.filterNot(_.startsWith("--"))) {
      val out = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      println(s"$name rows=" + out.count())
      out.show(5, truncate = false)
      out.explain("formatted")
    }
    if (args.contains("--stream")) {
      // drive the stateful incremental-marginals streaming op end-to-end
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[stream.HicStream.ContactEvent]
      val q = stream.HicStream.incrementalMarginals(mem.toDS()).writeStream
        .format("memory").queryName("devsmoke_marg").outputMode("update")
        .start()
      val t0 = new java.sql.Timestamp(1704067200000L)
      mem.addData(stream.HicStream.ContactEvent(t0, "chr1", 2500, "chr1", 7500, 5))
      q.processAllAvailable()
      mem.addData(stream.HicStream.ContactEvent(t0, "chr1", 2500, "chr1", 12500, 3))
      q.processAllAvailable()
      println("STREAM_MARGINALS:")
      spark.table("devsmoke_marg").show(10, truncate = false)
      q.stop()
    }
    try {
      SparkEntry.queries("q_agg_q1")(spark, "/tmp/does_not_exist").count()
      println("PROBE_BAD_DIR=no-error (unexpected)")
    } catch {
      case e: Throwable =>
        println("PROBE_BAD_DIR=" + e.getClass.getSimpleName + ": " +
          String.valueOf(e.getMessage).linesIterator.next().take(140))
    }
    spark.stop()
  }
}
