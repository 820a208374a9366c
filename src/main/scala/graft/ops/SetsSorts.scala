package graft.ops

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Set-operation, multi-column sort, and top-k queries (SURVEY.md §2.B).
  * Null-ordering is pinned explicitly on both sides (Spark defaults
  * NULLS FIRST on ASC; DuckDB defaults NULLS LAST).
  */
object SetsSorts {
  def queries: Map[String, Q] = Map(
    "q_sort_multi" -> Q(
      (spark, dir) =>
        Tables(spark, dir, "orders")
          .withColumn("prio_n", nullif(col("o_orderpriority"), lit("1-URGENT")))
          .select("o_orderkey", "o_orderstatus", "prio_n", "o_totalprice")
          .orderBy(asc_nulls_first("o_orderstatus"),
            asc_nulls_first("prio_n"),
            desc_nulls_last("o_totalprice"),
            asc("o_orderkey")),
      Some("SELECT o_orderkey, o_orderstatus, " +
        "NULLIF(o_orderpriority, '1-URGENT') AS prio_n, o_totalprice " +
        "FROM orders ORDER BY o_orderstatus ASC NULLS FIRST, " +
        "prio_n ASC NULLS FIRST, o_totalprice DESC NULLS LAST, o_orderkey")),

    "q_topk" -> Q(
      (spark, dir) =>
        // orderBy+limit → TakeOrderedAndProjectExec (no global sort)
        Tables(spark, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
          .limit(25),
      Some("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 25")),

    "q_set_union" -> Q(
      (spark, dir) => {
        val o = Tables(spark, dir, "orders")
        val a = o.filter(col("o_totalprice") > 400000.0)
          .select("o_orderkey", "o_orderstatus")
        val b = o.filter(col("o_orderstatus") === "P")
          .select("o_orderkey", "o_orderstatus")
        a.unionByName(b).orderBy("o_orderkey", "o_orderstatus")
      },
      Some("SELECT o_orderkey, o_orderstatus FROM orders " +
        "WHERE o_totalprice > 400000.0 " +
        "UNION ALL " +
        "SELECT o_orderkey, o_orderstatus FROM orders " +
        "WHERE o_orderstatus = 'P' " +
        "ORDER BY o_orderkey, o_orderstatus")),

    "q_set_intersect" -> Q(
      (spark, dir) => {
        val o = Tables(spark, dir, "orders")
        val y95 = o.filter(col("o_orderdate") >= Cols.ts("1995-01-01") &&
          col("o_orderdate") < Cols.ts("1996-01-01")).select("o_custkey")
        val y96 = o.filter(col("o_orderdate") >= Cols.ts("1996-01-01") &&
          col("o_orderdate") < Cols.ts("1997-01-01")).select("o_custkey")
        y95.intersect(y96).orderBy("o_custkey")
      },
      Some("SELECT o_custkey FROM orders WHERE o_orderdate >= " +
        "TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01' " +
        "INTERSECT SELECT o_custkey FROM orders WHERE o_orderdate >= " +
        "TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01' " +
        "ORDER BY o_custkey")),

    "q_set_except" -> Q(
      (spark, dir) => {
        val o = Tables(spark, dir, "orders")
        val y95 = o.filter(col("o_orderdate") >= Cols.ts("1995-01-01") &&
          col("o_orderdate") < Cols.ts("1996-01-01")).select("o_custkey")
        val y96 = o.filter(col("o_orderdate") >= Cols.ts("1996-01-01") &&
          col("o_orderdate") < Cols.ts("1997-01-01")).select("o_custkey")
        y95.except(y96).orderBy("o_custkey")
      },
      Some("SELECT o_custkey FROM orders WHERE o_orderdate >= " +
        "TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01' " +
        "EXCEPT SELECT o_custkey FROM orders WHERE o_orderdate >= " +
        "TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01' " +
        "ORDER BY o_custkey")))
}
