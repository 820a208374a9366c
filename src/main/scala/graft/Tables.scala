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
      // events.ts has shipped as either parquet TIMESTAMP(NANOS) — which
      // Spark 4 rejects outright (PARQUET_TYPE_ILLEGAL) unless read as
      // long — or native TIMESTAMP(MICROS). Adapt on the actual footer
      // type: nanos-as-long gets floored to micros (exactly what DuckDB's
      // epoch_us sees); micros is already the target type.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
