package graft.ops

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
        "ORDER BY cohort_day, day_offset"))
  )
}
