package graft.ops

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Join queries (SURVEY.md §2.B q_join_*). Small dimension sides are
  * explicitly `broadcast()`-hinted; large⋈large pairs are left to
  * sort-merge + AQE.
  */
object Joins {
  def queries: Map[String, Q] = Map(
    "q_join_broadcast" -> Q(
      (spark, dir) => {
        val l = Tables(spark, dir, "lineitem")
        val p = Tables(spark, dir, "part")
        l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
          .groupBy("p_brand")
          .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
            count(lit(1)).as("n"))
          .orderBy("p_brand")
      },
      Some("SELECT p_brand, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)" +
        " AS sum_qty, COUNT(*) AS n FROM lineitem JOIN part " +
        "ON l_partkey = p_partkey GROUP BY p_brand ORDER BY p_brand")),

    "q_join_chain" -> Q(
      (spark, dir) => {
        // TPC-H Q5 shape: revenue by nation for one region + order year.
        val region = Tables(spark, dir, "region")
          .filter(col("r_name") === "ASIA")
        val nation = Tables(spark, dir, "nation")
        val cust = Tables(spark, dir, "customer")
        val ord = Tables(spark, dir, "orders")
          .filter(col("o_orderdate") >= Cols.ts("1995-01-01") &&
            col("o_orderdate") < Cols.ts("1997-01-01"))
        val li = Tables(spark, dir, "lineitem")
        val sup = Tables(spark, dir, "supplier")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 100, 0).cast("long")).as("__rev_c"),
            count(lit(1)).as("n"))
          .select(col("n_name"),
            (col("__rev_c").cast("double") / 100.0).as("revenue"), col("n"))
          .orderBy(desc("revenue"), col("n_name"))
      },
      Some("SELECT n_name, " +
        "CAST(CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)) AS BIGINT) AS DOUBLE)/100.0 AS revenue, " +
        "COUNT(*) AS n " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1995-01-01' " +
        "AND o_orderdate < TIMESTAMP '1997-01-01' " +
        "GROUP BY n_name ORDER BY revenue DESC, n_name")))
}
