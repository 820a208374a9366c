package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Product-analytics queries over the `events` stream table: ordered
  * funnel progression and cohort retention — the batch analyses every
  * event pipeline runs next to the sessionization in
  * [[graft.stream.StreamQueries]].
  *
  * Scale notes (100 TB bar): every stage below keys on `user_id` (or a
  * coarse date), so each query is a small fixed number of hash
  * aggregations/joins on the SAME key — Spark reuses the exchange across
  * stages instead of re-shuffling, and no window spans more than one
  * user's events.
  */
object EventAnalytics {
  def queries: Map[String, Q] = Map(
    "q_events_funnel" -> Q(
      (spark, dir) => {
        // strictly-ordered funnel view → click → purchase: stage k counts
        // a user only if stage k's earliest qualifying event happens
        // AFTER stage k−1's. Three per-user min-aggregations joined on
        // user_id (one exchange reused), then a 3-row summary. Event
        // times are compared as epoch-µs longs on both sides (the
        // fixture's parquet is ns-precision, which Spark truncates to µs
        // — same convention as q_stream_session).
        val ev = Tables(spark, dir, "events")
          .select(col("user_id"), col("event_type"),
            Cols.epochUs(col("ts")).as("tus"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("tus")).as("t_view"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("tus") > col("t_view"))
          .groupBy("user_id").agg(min(col("tus")).as("t_click"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("tus") > col("t_click"))
          .groupBy("user_id").agg(min(col("tus")).as("t_purchase"))
        val stages = v.select(col("user_id"), lit(1).as("stage"),
            lit("view").as("stage_name"))
          .unionByName(c.select(col("user_id"), lit(2).as("stage"),
            lit("click").as("stage_name")))
          .unionByName(p.select(col("user_id"), lit(3).as("stage"),
            lit("purchase").as("stage_name")))
        stages.groupBy("stage", "stage_name")
          .agg(count(lit(1)).as("n_users"))
          .orderBy("stage")
      },
      Some("WITH v AS (SELECT user_id, MIN(epoch_us(ts)) AS t_view " +
        "FROM events WHERE event_type = 'view' GROUP BY user_id), " +
        "c AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click " +
        "FROM events e " +
        "JOIN v ON e.user_id = v.user_id WHERE e.event_type = 'click' " +
        "AND epoch_us(e.ts) > v.t_view GROUP BY e.user_id), " +
        "p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase " +
        "FROM events e " +
        "JOIN c ON e.user_id = c.user_id WHERE e.event_type = 'purchase' " +
        "AND epoch_us(e.ts) > c.t_click GROUP BY e.user_id), " +
        "s AS (SELECT user_id, 1 AS stage, 'view' AS stage_name FROM v " +
        "UNION ALL SELECT user_id, 2, 'click' FROM c " +
        "UNION ALL SELECT user_id, 3, 'purchase' FROM p) " +
        "SELECT stage, stage_name, COUNT(*) AS n_users FROM s " +
        "GROUP BY stage, stage_name ORDER BY stage")),

    "q_events_retention" -> Q(
      (spark, dir) => {
        // cohort retention: cohort = a user's first active day; one row
        // per (cohort_day, day_offset) with the distinct users still
        // active offset days later. distinct-(user, day) first so the
        // count-distinct aggregates a pre-shrunk input.
        val ev = Tables(spark, dir, "events")
        val active = ev.select(col("user_id"),
          to_date(col("ts")).as("day")).distinct()
        val cohort = active.groupBy("user_id")
          .agg(min(col("day")).as("cohort_day"))
        active.join(cohort, "user_id")
          .select(col("cohort_day"),
            datediff(col("day"), col("cohort_day")).cast("long")
              .as("day_offset"),
            col("user_id"))
          .groupBy("cohort_day", "day_offset")
          .agg(countDistinct(col("user_id")).as("n_users"))
          .orderBy("cohort_day", "day_offset")
      },
      Some("WITH active AS (SELECT DISTINCT user_id, CAST(ts AS DATE) " +
        "AS day FROM events), " +
        "cohort AS (SELECT user_id, MIN(day) AS cohort_day FROM active " +
        "GROUP BY user_id) " +
        "SELECT c.cohort_day, a.day - c.cohort_day AS day_offset, " +
        "COUNT(DISTINCT a.user_id) AS n_users " +
        "FROM active a JOIN cohort c ON a.user_id = c.user_id " +
        "GROUP BY c.cohort_day, day_offset " +
        "ORDER BY cohort_day, day_offset")),

    "q_events_sessionize" -> Q(
      (spark, dir) => {
        // batch sessionization (gaps-and-islands): a new session starts
        // when a user's inter-event gap exceeds 30 min. lag + running
        // sum of session starts, both over the SAME (user_id, ts) window
        // — one exchange, per-user state only (no window ever spans two
        // users, so partitions stay bounded at any corpus size). The
        // batch twin of the streaming session_window query.
        val gapUs = 30L * 60 * 1000000
        val ev = Tables(spark, dir, "events")
          .select(col("user_id"), col("event_id"), col("value"),
            Cols.epochUs(col("ts")).as("tus"))
        val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
        ev.withColumn("prev", lag(col("tus"), 1).over(w))
          .withColumn("new_sess",
            when(col("prev").isNull ||
              col("tus") - col("prev") > gapUs, 1L).otherwise(0L))
          .withColumn("sess_no", sum(col("new_sess")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "sess_no")
          .agg(min(col("tus")).as("sess_start"),
            max(col("tus")).as("sess_end"),
            count(lit(1)).as("n_events"),
            sum(Cols.cents(col("value"))).as("sum_value_c"))
          .withColumn("duration_us", col("sess_end") - col("sess_start"))
          .select(col("user_id"), col("sess_no"), col("sess_start"),
            col("duration_us"), col("n_events"), col("sum_value_c"))
          .orderBy("user_id", "sess_no")
      },
      Some("WITH ev AS (SELECT user_id, event_id, value, " +
        "epoch_us(ts) AS tus FROM events), " +
        "lagged AS (SELECT *, LAG(tus) OVER " +
        "(PARTITION BY user_id ORDER BY tus, event_id) AS prev FROM ev), " +
        "marked AS (SELECT *, CASE WHEN prev IS NULL OR " +
        "tus - prev > 1800000000 THEN 1 ELSE 0 END AS new_sess " +
        "FROM lagged), " +
        "numbered AS (SELECT *, SUM(new_sess) OVER " +
        "(PARTITION BY user_id ORDER BY tus, event_id " +
        "ROWS UNBOUNDED PRECEDING) AS sess_no FROM marked) " +
        // DuckDB's SUM returns HUGEINT, which the driver's compare path
        // surfaces as float64 — cast both summed columns back to BIGINT
        // to match Spark (same convention as q_ts_gapfill below).
        "SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no, " +
        "MIN(tus) AS sess_start, " +
        "MAX(tus) - MIN(tus) AS duration_us, COUNT(*) AS n_events, " +
        "CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) " +
        "AS sum_value_c " +
        "FROM numbered GROUP BY user_id, sess_no " +
        "ORDER BY user_id, sess_no")),

    "q_events_anomaly" -> Q(
      (spark, dir) => {
        // per-user daily-volume anomaly: flag (user, day) counts more
        // than 2 population-σ above that user's own daily mean. Variance
        // from exact integer Σcnt/Σcnt² (both < 2^53, so the double
        // arithmetic is bit-identical on any engine and any partitioning
        // — Spark's streaming stddev_pop would not be), users need ≥ 3
        // active days. Two hash aggregations, the second keyed on the
        // first's key prefix.
        val ev = Tables(spark, dir, "events")
        val daily = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"))
        val stats = daily.groupBy("user_id")
          .agg(count(lit(1)).as("n_days"), sum(col("cnt")).as("s1"),
            sum(col("cnt") * col("cnt")).as("s2"))
          .filter(col("n_days") >= 3)
        val mean = col("s1").cast("double") / col("n_days")
        val variance = col("s2").cast("double") / col("n_days") -
          mean * mean
        daily.join(stats, "user_id")
          // zero-variance guard: a user with identical daily counts has
          // variance 0 → z = 0/0 = NaN, and NaN > 2.0 is TRUE under
          // Spark/DuckDB NaN-greatest ordering — drop those rows before
          // the z filter. Compared in DOUBLE via the same expression the
          // sqrt consumes (identical arithmetic on both sides): the
          // earlier integer form s2·n_days > s1² could overflow BIGINT
          // on the Spark side at extreme per-day counts while DuckDB
          // widens to HUGEINT — a cross-engine divergence this form
          // cannot have.
          .filter(variance > 0.0)
          .withColumn("z", (col("cnt").cast("double") - mean) /
            sqrt(variance))
          .filter(col("z") > 2.0)
          .select(col("user_id"), col("day"), col("cnt"),
            Cols.fround(col("z"), 6).as("z"))
          .orderBy("user_id", "day")
      },
      Some("WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, " +
        "COUNT(*) AS cnt FROM events GROUP BY user_id, day), " +
        "stats AS (SELECT user_id, COUNT(*) AS n_days, " +
        "SUM(cnt) AS s1, SUM(cnt*cnt) AS s2 FROM daily " +
        "GROUP BY user_id HAVING COUNT(*) >= 3 " +
        "AND CAST(SUM(cnt*cnt) AS DOUBLE)/COUNT(*) - " +
        "(CAST(SUM(cnt) AS DOUBLE)/COUNT(*))*" +
        "(CAST(SUM(cnt) AS DOUBLE)/COUNT(*)) > 0.0), " +
        "z AS (SELECT d.user_id, d.day, d.cnt, " +
        "(CAST(d.cnt AS DOUBLE) - CAST(s.s1 AS DOUBLE)/s.n_days) / " +
        "SQRT(CAST(s.s2 AS DOUBLE)/s.n_days - " +
        "(CAST(s.s1 AS DOUBLE)/s.n_days)*(CAST(s.s1 AS DOUBLE)/s.n_days)) " +
        "AS z FROM daily d JOIN stats s ON d.user_id = s.user_id) " +
        "SELECT user_id, day, cnt, " + Cols.froundSql("z", 6) +
        " AS z FROM z WHERE z > 2.0 ORDER BY user_id, day")),

    "q_ts_gapfill" -> Q(
      (spark, dir) => {
        // time-series regularization: densify each user's daily activity
        // onto a complete calendar grid over [first day, last day], with
        // cnt = 0 on missing days and the value sum forward-filled from
        // the last active day. Grid generation is a bounded narrow
        // explode of the per-user span (never a calendar × users cross
        // join); the fill is one per-user window. Everything keys on
        // user_id, so the daily agg, span agg, grid join, and fill window
        // reuse one exchange and no window spans two users.
        val daily = Tables(spark, dir, "events")
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"),
            sum(Cols.cents(col("value"))).as("val_c"))
        val grid = daily.groupBy("user_id")
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
          .select(col("user_id"), explode(sequence(col("d0"), col("d1"),
            expr("interval 1 day"))).as("day"))
        val w = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(daily, Seq("user_id", "day"), "left")
          .select(col("user_id"), col("day"),
            coalesce(col("cnt"), lit(0L)).as("cnt"),
            last(col("val_c"), ignoreNulls = true).over(w).as("fill_c"))
          .orderBy("user_id", "day")
      },
      Some("WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day, " +
        "COUNT(*) AS cnt, " +
        "CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) " +
        "AS val_c FROM events GROUP BY user_id, day), " +
        "span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 " +
        "FROM daily GROUP BY user_id), " +
        "grid AS (SELECT user_id, CAST(unnest(generate_series(" +
        "CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), " +
        "INTERVAL 1 DAY)) AS DATE) AS day FROM span) " +
        "SELECT g.user_id, g.day, COALESCE(d.cnt, 0) AS cnt, " +
        "LAST_VALUE(d.val_c IGNORE NULLS) OVER (PARTITION BY g.user_id " +
        "ORDER BY g.day ROWS UNBOUNDED PRECEDING) AS fill_c " +
        "FROM grid g LEFT JOIN daily d " +
        "ON g.user_id = d.user_id AND g.day = d.day " +
        "ORDER BY g.user_id, g.day")),

    "q_events_attribution" -> Q(
      (spark, dir) => {
        // last-touch attribution: each purchase is credited to the most
        // recent PRIOR click/view by the same user within a 7-day
        // lookback, else 'none'. One per-user window pass (last-non-null
        // carry over a [start, prev] frame) — the classic as-of join
        // expressed without any join at all, so the plan is a single
        // exchange on user_id at any event volume. Ties broken by
        // event_id; touch_* columns are null on exactly the same rows,
        // so the three carries pick the same touch row.
        val sevenDaysUs = 7L * 24 * 3600 * 1000000
        val ev = Tables(spark, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            Cols.epochUs(col("ts")).as("tus"))
        val isTouch = col("event_type").isin("click", "view")
        val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        ev
          // one select → ONE Window node for all three carries (chained
          // withColumns leave three same-spec Window passes in the plan)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("tus"),
            last(when(isTouch, col("tus")), ignoreNulls = true).over(w)
              .as("t_tus"),
            last(when(isTouch, col("event_type")), ignoreNulls = true)
              .over(w).as("t_type"),
            last(when(isTouch, col("event_id")), ignoreNulls = true)
              .over(w).as("t_id"))
          .filter(col("event_type") === "purchase")
          .withColumn("in_window",
            col("t_tus").isNotNull &&
              col("tus") - col("t_tus") <= sevenDaysUs)
          .select(col("user_id"), col("event_id"), col("tus"),
            when(col("in_window"), col("t_type")).otherwise(lit("none"))
              .as("channel"),
            when(col("in_window"), col("t_id")).as("touch_event_id"),
            when(col("in_window"), col("tus") - col("t_tus")).as("gap_us"))
          .orderBy("user_id", "event_id")
      },
      Some("WITH ev AS (SELECT user_id, event_id, event_type, " +
        "epoch_us(ts) AS tus FROM events), " +
        "carried AS (SELECT *, " +
        "LAST_VALUE(CASE WHEN event_type IN ('click', 'view') THEN tus " +
        "END IGNORE NULLS) OVER prior AS t_tus, " +
        "LAST_VALUE(CASE WHEN event_type IN ('click', 'view') THEN " +
        "event_type END IGNORE NULLS) OVER prior AS t_type, " +
        "LAST_VALUE(CASE WHEN event_type IN ('click', 'view') THEN " +
        "event_id END IGNORE NULLS) OVER prior AS t_id " +
        "FROM ev WINDOW prior AS (PARTITION BY user_id " +
        "ORDER BY tus, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) " +
        "SELECT user_id, event_id, tus, " +
        "CASE WHEN t_tus IS NOT NULL AND tus - t_tus <= 604800000000 " +
        "THEN t_type ELSE 'none' END AS channel, " +
        "CASE WHEN t_tus IS NOT NULL AND tus - t_tus <= 604800000000 " +
        "THEN t_id END AS touch_event_id, " +
        "CASE WHEN t_tus IS NOT NULL AND tus - t_tus <= 604800000000 " +
        "THEN tus - t_tus END AS gap_us " +
        "FROM carried WHERE event_type = 'purchase' " +
        "ORDER BY user_id, event_id"))
  )
}
