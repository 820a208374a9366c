package graft.hic

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic INTER-chromosomal contacts view over `lineitem`.
  *
  * [[ContactsView]] keys both ends to the same chromosome (chr1 ≡ chr2),
  * so the inter-chromosomal model (SURVEY.md A21) never fires on it. This
  * view puts the two ends in DISJOINT chromosome namespaces — chr1 from
  * l_returnflag ('A','N','R'), chr2 from 'z'+l_linestatus ('zF','zO') — so
  * every pair classifies as interAll and the q_hic_inter* queries exercise
  * the uniform-prior inter pipeline end to end.
  */
object InterView {
  /** One row per (chr1, mid1, chr2, mid2); total-order key for hashing. */
  def apply(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables(spark, sfDir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus", "l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("long")).as("contactCount"),
        min(col("l_discount")).as("__mind"))
      .select(
        col("l_returnflag").as("chr1"),
        (col("l_partkey") * 5000L + 2500L).as("mid1"),
        concat(lit("z"), col("l_linestatus")).as("chr2"),
        (col("l_suppkey") * 5000L + 2500L).as("mid2"),
        col("contactCount"),
        least(greatest(col("__mind") * 10, lit(1e-9)), lit(1.0))
          .as("pseudo_p"))

  /** DuckDB CTE defining the identical view (prefix of q_hic_inter*
    * oracles).
    */
  val cte: String =
    "WITH i AS (SELECT l_returnflag AS chr1, l_partkey*5000+2500 AS mid1, " +
      "'z' || l_linestatus AS chr2, l_suppkey*5000+2500 AS mid2, " +
      "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS contactCount, " +
      "LEAST(GREATEST(MIN(l_discount)*10, 1e-9), 1.0) AS pseudo_p " +
      "FROM lineitem GROUP BY l_returnflag, l_linestatus, l_partkey, " +
      "l_suppkey)"
}
