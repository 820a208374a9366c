package graft.ops

import graft.{Q, Tables}

/** Subquery-shaped relational operators (engine-completeness beyond
  * SURVEY.md §2.B's join/agg rows): uncorrelated scalar, correlated
  * scalar, and null-aware NOT IN. These go through `spark.sql` on
  * purpose — the operator under test is Catalyst's subquery planning
  * (ScalarSubquery reuse, RewriteCorrelatedScalarSubquery's
  * decorrelation into an aggregate + join, and the null-aware anti
  * join for NOT IN), which the DataFrame API cannot express directly.
  *
  * Money comparisons use the exact-cents lift (identical SQL text runs
  * on both engines, so threshold comparisons see identical IEEE ops).
  */
object Subqueries {
  private def views(spark: org.apache.spark.sql.SparkSession, dir: String,
      names: String*): Unit = Tables.views(spark, dir, names: _*)

  /** Exact average order price in cents: BIGINT sum, one double divide. */
  private val avgCents =
    "CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS DOUBLE)/COUNT(*)"

  def queries: Map[String, Q] = Map(
    "q_subquery_scalar" -> {
      // Uncorrelated scalar subquery: orders above 1.75× the global
      // average price (the driver data tops out just under 2×). Catalyst
      // runs the subquery once (its own tiny job) and folds the scalar
      // into the main scan's filter — at 100 TB the subquery is a
      // full-scan aggregate (unavoidable: the answer depends on every
      // row) but the outer pass stays a single scan.
      val sql = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "WHERE CAST(ROUND(o_totalprice*100,0) AS BIGINT) > " +
        s"1.75*(SELECT $avgCents FROM orders) " +
        "ORDER BY o_orderkey"
      Q((spark, dir) => { views(spark, dir, "orders"); spark.sql(sql) },
        Some(sql))
    },

    "q_subquery_correlated" -> {
      // Correlated scalar subquery with an aggregate: orders above 1.5×
      // their OWN customer's average. Catalyst decorrelates this into
      // groupBy(o_custkey) + equi-join — i.e. the per-row "subquery" never
      // executes per row; it becomes one shuffle aggregation reusing the
      // same key as the join. That rewrite is exactly what makes the
      // shape survive 100 TB.
      val sql = "SELECT o.o_orderkey, o.o_custkey, o.o_totalprice " +
        "FROM orders o " +
        "WHERE CAST(ROUND(o.o_totalprice*100,0) AS BIGINT) > " +
        "1.5*(SELECT " +
        "CAST(SUM(CAST(ROUND(o2.o_totalprice*100,0) AS BIGINT)) AS DOUBLE)" +
        "/COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) " +
        "ORDER BY o.o_orderkey"
      Q((spark, dir) => { views(spark, dir, "orders"); spark.sql(sql) },
        Some(sql))
    },

    "q_subquery_not_in" -> {
      // NOT IN subquery: customers with no 'F'-status order. Because the
      // parquet schema can't prove o_custkey non-null, Spark must honor
      // three-valued NOT IN semantics → null-aware anti join (broadcast
      // of the subquery side). At scale, when the column is known
      // non-null, NOT EXISTS (= plain left_anti, q_join_anti) is the
      // shuffle-able form — this query is the semantics-preserving twin.
      val sql = "SELECT c_custkey, c_name FROM customer " +
        "WHERE c_custkey NOT IN " +
        "(SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') " +
        "ORDER BY c_custkey"
      Q((spark, dir) => { views(spark, dir, "customer", "orders")
        spark.sql(sql) }, Some(sql))
    })
}
