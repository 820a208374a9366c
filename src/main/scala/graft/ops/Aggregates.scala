package graft.ops

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Aggregation queries (SURVEY.md §2.B q_agg_*).
  *
  * Money math uses the exact-cents discipline: doubles that are
  * fixed-point-by-intent (prices) are scaled ×100, rounded to an exact
  * integer (identical IEEE ops on identical parquet bits in Spark and
  * DuckDB), summed as BIGINT (exact, order-independent), and only then
  * divided back — so hash-matching never depends on float summation order.
  */
object Aggregates {
  import Cols.cents

  def queries: Map[String, Q] = Map(
    "q_agg_q1" -> Q(
      (spark, dir) =>
        Tables(spark, dir, "lineitem")
          .filter(col("l_shipdate") <= Cols.ts("1998-09-02"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity").cast("long")).as("sum_qty"),
            sum(cents(col("l_extendedprice"))).as("__base_c"),
            sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
              .as("__disc_c"),
            count(lit(1)).as("count_order"))
          .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
            (col("__base_c").cast("double") / 100.0).as("sum_base"),
            (col("__disc_c").cast("double") / 100.0).as("sum_disc"),
            (col("sum_qty").cast("double") / col("count_order")).as("avg_qty"),
            col("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("SELECT l_returnflag, l_linestatus, " +
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, " +
        "CAST(CAST(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0 AS sum_base, " +
        "CAST(CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0 AS sum_disc, " +
        "CAST(CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS DOUBLE)/COUNT(*) AS avg_qty, " +
        "COUNT(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
        "GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus")))
}
