package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the driver-generated test data (TESTDATA.md).
  * All schemas are fixed by the driver; see FIXTURES.md §1.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register the named tables as temp views for spark.sql-shaped queries
    * (one registration discipline — session-global replace — in one place).
    */
  def views(spark: SparkSession, sfDir: String, tableNames: String*): Unit =
    tableNames.foreach(t => apply(spark, sfDir, t).createOrReplaceTempView(t))

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects
      // outright (PARQUET_TYPE_ILLEGAL). Read nanos as long and floor to
      // microseconds — exactly what DuckDB's epoch_us sees.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
