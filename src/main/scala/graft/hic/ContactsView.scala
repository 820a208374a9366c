package graft.hic

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic Hi-C "contacts" view over `lineitem` (FIXTURES.md §3).
  *
  * Gives every `q_hic_*` declared query an oracle-checkable input shaped
  * like the reference's interactions table (SURVEY.md §1.1 T2): per-pair
  * chromosome, bin midpoints, contact count, genomic distance, plus a
  * pseudo p-value column so the BH machinery (SURVEY A19) can be verified
  * in DuckDB without the binomial UDF.
  *
  * Float-parity note: `pseudo_p` uses `l_discount * 10` (not `/ 0.1`) so
  * the Spark and DuckDB expression trees perform the identical IEEE ops on
  * identical parquet-sourced bits.
  */
object ContactsView {
  /** One row per (chr, mid1, mid2) — contacts are unique per bin pair in
    * the Hi-C domain (SURVEY T2), so the view pre-aggregates lineitem
    * (whose (orderkey, linenumber) is NOT unique in the generated data).
    * (chr, mid1, mid2) is the total-order key for hash-matching.
    */
  def apply(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables(spark, sfDir, "lineitem")
      .groupBy("l_linestatus", "l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("long")).as("contactCount"),
        min(col("l_discount")).as("__mind"))
      .select(
        col("l_linestatus").as("chr"),
        (col("l_partkey") * 5000L + 2500L).as("mid1"),
        (col("l_suppkey") * 5000L + 2500L).as("mid2"),
        (abs(col("l_partkey") - col("l_suppkey")) * 5000L).as("dist"),
        col("contactCount"),
        least(greatest(col("__mind") * 10, lit(1e-9)), lit(1.0))
          .as("pseudo_p"))

  /** DuckDB CTE defining the identical view; prefix of every q_hic oracle. */
  val cte: String =
    "WITH c AS (SELECT l_linestatus AS chr, l_partkey*5000+2500 AS mid1, " +
      "l_suppkey*5000+2500 AS mid2, ABS(l_partkey-l_suppkey)*5000 AS dist, " +
      "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS contactCount, " +
      "LEAST(GREATEST(MIN(l_discount)*10, 1e-9), 1.0) AS pseudo_p " +
      "FROM lineitem GROUP BY l_linestatus, l_partkey, l_suppkey)"
}
