package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Window-function queries (SURVEY.md §2.B q_win_*). Every window here is
  * keyed (partitionBy) — global-order work goes through
  * [[GlobalOrder]] instead, so nothing funnels into one partition.
  */
object Windows {
  def queries: Map[String, Q] = Map(
    "q_win_rank" -> Q(
      (spark, dir) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        Tables(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            row_number().over(w).as("rn"))
          .orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, o_orderpriority, o_totalprice, " +
        "RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk, " +
        "ROW_NUMBER() OVER w AS rn FROM orders " +
        "WINDOW w AS (PARTITION BY o_orderpriority " +
        "ORDER BY o_totalprice DESC, o_orderkey) ORDER BY o_orderkey")),

    "q_win_running" -> Q(
      (spark, dir) => {
        val w = Window.partitionBy("o_orderstatus")
          .orderBy("o_orderdate", "o_orderkey")
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wMov = w.rowsBetween(-3, Window.currentRow)
        Tables(spark, dir, "orders")
          .withColumn("__tp_c", Cols.cents(col("o_totalprice")))
          .select(col("o_orderkey"), col("o_orderstatus"),
            (sum(col("__tp_c")).over(wRun).cast("double") / 100.0)
              .as("run_total"),
            (sum(col("__tp_c")).over(wMov).cast("double") / 100.0 /
              count(lit(1)).over(wMov)).as("mov_avg"))
          .orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, o_orderstatus, " +
        "CAST(CAST(SUM(tp_c) OVER wr AS BIGINT) AS DOUBLE)/100.0 AS run_total, " +
        "CAST(CAST(SUM(tp_c) OVER wm AS BIGINT) AS DOUBLE)/100.0/COUNT(*) OVER wm AS mov_avg " +
        "FROM (SELECT *, CAST(ROUND(o_totalprice*100,0) AS BIGINT) AS tp_c " +
        "FROM orders) " +
        "WINDOW wr AS (PARTITION BY o_orderstatus ORDER BY o_orderdate, " +
        "o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        "wm AS (PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) ORDER BY o_orderkey")),

    "q_win_range_frame" -> Q(
      (spark, dir) => {
        // trailing 7-day quantity per (flag, day): pre-aggregate to days,
        // then a range frame over the integer day — scalable and total-keyed
        val daily = Tables(spark, dir, "lineitem")
          .withColumn("ship_day",
            expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000"))
          .groupBy("l_returnflag", "ship_day")
          .agg(sum(col("l_quantity").cast("long")).as("qty_day"))
        val w = Window.partitionBy("l_returnflag").orderBy("ship_day")
          .rangeBetween(-7, 0)
        daily
          .select(col("l_returnflag"), col("ship_day"), col("qty_day"),
            sum(col("qty_day")).over(w).as("qty_7d"))
          .orderBy("l_returnflag", "ship_day")
      },
      Some("SELECT l_returnflag, ship_day, qty_day, " +
        "CAST(SUM(qty_day) OVER (PARTITION BY l_returnflag ORDER BY ship_day " +
        "RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS BIGINT) AS qty_7d " +
        "FROM (SELECT l_returnflag, epoch_us(l_shipdate)//86400000000 AS ship_day, " +
        "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_day " +
        "FROM lineitem GROUP BY 1, 2) " +
        "ORDER BY l_returnflag, ship_day")),

    "q_win_lead_lag" -> Q(
      (spark, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables(spark, dir, "events")
          .select(col("event_id"), col("user_id"),
            (Cols.epochUs(col("ts")) -
              Cols.epochUs(lag(col("ts"), 1).over(w))).as("gap_us"),
            (Cols.epochUs(lead(col("ts"), 1).over(w)) -
              Cols.epochUs(col("ts"))).as("next_gap_us"))
          .orderBy("event_id")
      },
      Some("SELECT event_id, user_id, " +
        "epoch_us(ts) - epoch_us(LAG(ts, 1) OVER w) AS gap_us, " +
        "epoch_us(LEAD(ts, 1) OVER w) - epoch_us(ts) AS next_gap_us " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) " +
        "ORDER BY event_id")),

    "q_win_ntile" -> Q(
      (spark, dir) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy("o_totalprice", "o_orderkey")
        Tables(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice"), ntile(10).over(w).as("decile"))
          .orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, o_orderpriority, o_totalprice, " +
        "NTILE(10) OVER (PARTITION BY o_orderpriority " +
        "ORDER BY o_totalprice, o_orderkey) AS decile " +
        "FROM orders ORDER BY o_orderkey")),

    "q_win_first_last" -> Q(
      (spark, dir) => {
        // first/last/nth over an explicit unbounded frame: cheapest and
        // runner-up order per priority, visible on every row. The frame
        // must be UNBOUNDED..UNBOUNDED — last_value under the default
        // frame (..CURRENT ROW) is the classic window footgun.
        val w = Window.partitionBy("o_orderpriority")
          .orderBy("o_totalprice", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            first(col("o_orderkey")).over(w).as("cheapest_key"),
            last(col("o_orderkey")).over(w).as("priciest_key"),
            nth_value(col("o_orderkey"), 2).over(w).as("runner_up_key"))
          .orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, o_orderpriority, " +
        "FIRST_VALUE(o_orderkey) OVER w AS cheapest_key, " +
        "LAST_VALUE(o_orderkey) OVER w AS priciest_key, " +
        "NTH_VALUE(o_orderkey, 2) OVER w AS runner_up_key " +
        "FROM orders WINDOW w AS (PARTITION BY o_orderpriority " +
        "ORDER BY o_totalprice, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "ORDER BY o_orderkey")),

    "q_win_ema" -> Q(
      (spark, dir) => {
        // custom declarative window function (graft.functions.EmaCents):
        // per-user integer-cents EMA s' = ⌊(x+s)/2⌋ over the event
        // stream — the per-entity smoothing a feature pipeline computes
        // at ingest. Runs inside the standard running-frame window exec
        // (one shuffle on user_id, no UDAF, one long of state); the
        // floor-integer recurrence is exact, so DuckDB replays it as a
        // recursive CTE and the oracle hash-matches.
        // frame pinned to ROWS unbounded→current: AggregateWindowFunction
        // fixes that frame and the spec must agree
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(spark, dir, "events")
          .withColumn("v_c", Cols.cents(col("value")))
          .select(col("event_id"), col("user_id"),
            graft.functions.EmaWindow.emaCents(spark, col("v_c")).over(w)
              .as("ema_c"))
          .orderBy("event_id")
      },
      Some("WITH RECURSIVE e AS (SELECT event_id, user_id, " +
        "CAST(ROUND(value*100,0) AS BIGINT) AS v_c, " +
        "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) " +
        "AS rn FROM events), " +
        "r AS (SELECT event_id, user_id, rn, v_c AS ema_c FROM e " +
        "WHERE rn = 1 UNION ALL " +
        "SELECT e.event_id, e.user_id, e.rn, (e.v_c + r.ema_c) // 2 " +
        "AS ema_c FROM e JOIN r ON e.user_id = r.user_id " +
        "AND e.rn = r.rn + 1) " +
        "SELECT event_id, user_id, ema_c FROM r ORDER BY event_id")),

    "q_win_pctrank" -> Q(
      (spark, dir) => {
        // relative-rank family: percent_rank = (rank−1)/(n−1) and
        // cume_dist = |rows ≤ x|/n — identical closed forms in both
        // engines on a unique ordering, so the doubles are bit-equal
        // (rounded anyway for the shared fround discipline).
        val w = Window.partitionBy("o_orderpriority")
          .orderBy("o_totalprice", "o_orderkey")
        Tables(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            Cols.fround(percent_rank().over(w), 6).as("pct_rank"),
            Cols.fround(cume_dist().over(w), 6).as("cume"))
          .orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, o_orderpriority, " +
        Cols.froundSql("PERCENT_RANK() OVER w", 6) + " AS pct_rank, " +
        Cols.froundSql("CUME_DIST() OVER w", 6) + " AS cume " +
        "FROM orders WINDOW w AS (PARTITION BY o_orderpriority " +
        "ORDER BY o_totalprice, o_orderkey) ORDER BY o_orderkey")))
}
