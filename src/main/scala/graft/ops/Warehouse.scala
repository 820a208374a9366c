package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Warehouse-shaped workloads: the classic TPC-H join/agg compositions
  * (shipping-priority and local-supplier-volume) and an SCD2 dimension
  * build from the event stream — the shapes a lakehouse team runs daily.
  *
  * Scale notes (100 TB bar):
  *   - q3/q5: every dimension (customer at 1.5M rows/TB-of-lineitem,
  *     supplier, nation, region) broadcasts; lineitem — the fact — is
  *     filtered AT THE SCAN (date pushdown) and never shuffles except for
  *     the final small-key aggregation. Revenue math is an exact BIGINT
  *     lift (cents × basis points) so partial-agg order can't drift it.
  *   - SCD2: one per-entity window pass (lag to detect changes, lead to
  *     close intervals) — the standard change-data-capture build, no
  *     self-join, nothing global.
  */
object Warehouse {
  /** Σ l_extendedprice·(1−l_discount) in exact cent·percent units:
    * price cents × (100 − discount points), both integers.
    */
  private def revenueCp = sum(Cols.cents(col("l_extendedprice")) *
    (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
  private val revenueCpSql = "SUM(CAST(ROUND(l_extendedprice*100,0) AS " +
    "BIGINT) * (100 - CAST(ROUND(l_discount*100,0) AS BIGINT)))"
  /** cent·percent → currency, one double division (identical shape). */
  private def asMoney(c: org.apache.spark.sql.Column) =
    Cols.fround(c.cast("double") / lit(10000.0), 4)

  def queries: Map[String, Q] = Map(
    "q_tpch_q3" -> Q(
      (spark, dir) => {
        // shipping priority: top-10 unshipped BUILDING orders by revenue.
        // customer is a broadcast dim; orders/lineitem scans carry their
        // date predicates (pushdown); the groupBy keys on l_orderkey so
        // AQE sizes the one real shuffle; top-10 leaves as a TakeOrdered.
        val cut = Cols.ts("1998-01-01")
        val cust = Tables(spark, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
        val ord = Tables(spark, dir, "orders")
          .filter(col("o_orderdate") < cut)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        val li = Tables(spark, dir, "lineitem")
          .filter(col("l_shipdate") > cut)
          .select(col("l_orderkey"), col("l_extendedprice"),
            col("l_discount"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey", "o_orderdate")
          .agg(revenueCp.as("rev_cp"))
          .select(col("l_orderkey"), asMoney(col("rev_cp")).as("revenue"),
            col("o_orderdate"))
          .orderBy(desc("revenue"), asc("l_orderkey"))
          .limit(10)
      },
      Some("SELECT l_orderkey, " +
        Cols.froundSql(s"CAST($revenueCpSql AS DOUBLE)/10000.0", 4) +
        " AS revenue, o_orderdate " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "WHERE c_mktsegment = 'BUILDING' " +
        "AND o_orderdate < TIMESTAMP '1998-01-01' " +
        "AND l_shipdate > TIMESTAMP '1998-01-01' " +
        "GROUP BY l_orderkey, o_orderdate " +
        "ORDER BY revenue DESC, l_orderkey LIMIT 10")),

    "q_tpch_q5" -> Q(
      (spark, dir) => {
        // local-supplier volume: revenue per ASIA nation where the
        // customer and supplier share the nation. Four broadcast dims
        // chained onto the fact scan — the plan is one pipeline of
        // BroadcastHashJoins into a 5-row aggregate.
        val lo = Cols.ts("1996-01-01")
        val hi = Cols.ts("1997-01-01")
        val region = Tables(spark, dir, "region")
          .filter(col("r_name") === "ASIA").select("r_regionkey")
        val nation = Tables(spark, dir, "nation")
          .join(broadcast(region),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val cust = Tables(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
        val supp = Tables(spark, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        val ord = Tables(spark, dir, "orders")
          .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
          .select(col("o_orderkey"), col("o_custkey"))
        val li = Tables(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"),
            col("l_extendedprice"), col("l_discount"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nation),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(revenueCp.as("rev_cp"))
          .select(col("n_name"), asMoney(col("rev_cp")).as("revenue"))
          .orderBy(desc("revenue"), asc("n_name"))
      },
      Some("SELECT n_name, " +
        Cols.froundSql(s"CAST($revenueCpSql AS DOUBLE)/10000.0", 4) +
        " AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "AND c_nationkey = s_nationkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'ASIA' " +
        "AND o_orderdate >= TIMESTAMP '1996-01-01' " +
        "AND o_orderdate < TIMESTAMP '1997-01-01' " +
        "GROUP BY n_name ORDER BY revenue DESC, n_name")),

    "q_scd2_props" -> Q(
      (spark, dir) => {
        // SCD2 dimension build (change-data-capture): each user's props.k
        // attribute as validity intervals [valid_from, valid_to), one row
        // per change, open-ended current row. lag() finds the change
        // events, lead() over the SURVIVORS closes the intervals — two
        // window passes over the same (user_id, ts) exchange, no
        // self-join. The JSON attribute is pulled with a regexp (not a
        // JSON UDF) so the scan stays codegen'd.
        val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
        val ev = Tables(spark, dir, "events")
          .select(col("user_id"), col("event_id"),
            Cols.epochUs(col("ts")).as("tus"),
            regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
              .as("k"))
        val changes = ev
          .withColumn("prev_k", lag(col("k"), 1).over(w))
          .filter(col("prev_k").isNull || col("k") =!= col("prev_k"))
        changes
          .withColumn("valid_to", lead(col("tus"), 1).over(w))
          .select(col("user_id"), col("k"), col("tus").as("valid_from"),
            col("valid_to"), col("valid_to").isNull.as("is_current"))
          .orderBy("user_id", "valid_from", "k")
      },
      Some("WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS tus, " +
        // TRY_CAST(NULLIF(..., '')) mirrors Spark's cast-to-null on a
        // non-matching props row (regexp_extract returns '' there and a
        // plain DuckDB CAST('' AS BIGINT) errors out)
        "TRY_CAST(NULLIF(regexp_extract(props, '\"k\": (\\d+)', 1), '') " +
        "AS BIGINT) AS k " +
        "FROM events), " +
        "lagged AS (SELECT *, LAG(k) OVER " +
        "(PARTITION BY user_id ORDER BY tus, event_id) AS prev_k FROM ev), " +
        "changes AS (SELECT * FROM lagged " +
        "WHERE prev_k IS NULL OR k <> prev_k) " +
        "SELECT user_id, k, tus AS valid_from, " +
        "LEAD(tus) OVER w AS valid_to, " +
        "LEAD(tus) OVER w IS NULL AS is_current " +
        "FROM changes " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id) " +
        "ORDER BY user_id, valid_from, k"))
  )
}
