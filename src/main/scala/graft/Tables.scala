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

  // Session-scoped table memo — the catalog role. spark.read.parquet
  // re-lists the directory and re-reads footers for schema inference on
  // EVERY call; across a 177-query × 3-run bench that is >1 000 redundant
  // driver-side footer reads. An analyzed DataFrame is an immutable
  // logical plan, so reusing it per (session, dir, table) changes no
  // query result — it only keeps the file index + schema, exactly what a
  // metastore-backed catalog provides. NOTE: weak keys alone cannot
  // evict here — the cached DataFrames strongly reference their session,
  // so the value pins the key; stopped sessions are instead PURGED
  // eagerly on every access (the map holds a handful of sessions, the
  // scan is trivial).
  private val memo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]())

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val perSession = memo.synchronized {
      val it = memo.keySet().iterator()
      while (it.hasNext) {
        val k = it.next()
        if (k != null && k.sparkContext.isStopped) it.remove()
      }
      var m = memo.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
        memo.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent((sfDir, name),
      _ => load(spark, sfDir, name))
  }

  private def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
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
