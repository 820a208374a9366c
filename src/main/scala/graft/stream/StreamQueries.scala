package graft.stream

import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.ops.Cols

/** Batch-equivalent forms of the streaming queries (SURVEY.md §2.10).
  * Same windowing semantics as the Structured Streaming jobs in [[Events]]
  * (tumbling/sliding/session/dedup over the events schema), but the
  * declared queries lift `value` sums to exact micro-units (×1e6 integers)
  * for oracle hash-stability, while Events keeps plain double sums for the
  * live streaming path. Events' own batch/stream parity is asserted in
  * StreamingSpec with MemoryStream.
  */
object StreamQueries {
  private def valUnits = round(col("value") * 1000000, 0).cast("long")
  private val valUnitsSql = "CAST(ROUND(value*1000000,0) AS BIGINT)"

  def queries: Map[String, Q] = Map(
    "q_stream_ema" -> Q(
      (spark, dir) => {
        // batch twin of the transformWithState job (TwsEma): each user's
        // FINAL floor-integer EMA state after the whole stream — the
        // value the per-user ValueState converges to. Same recurrence as
        // q_win_ema; TwsSpec pins the streaming processor (RocksDB
        // store, multi-batch) to exactly this output.
        import org.apache.spark.sql.expressions.Window
        val wRun = Window.partitionBy("user_id")
          .orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wLast = Window.partitionBy("user_id")
          .orderBy(desc("ts"), desc("event_id"))
        Tables(spark, dir, "events")
          .withColumn("v_c", Cols.cents(col("value")))
          .select(col("user_id"),
            graft.functions.EmaWindow.emaCents(spark, col("v_c"))
              .over(wRun).as("ema_c"),
            row_number().over(wLast).as("__rn"))
          .filter(col("__rn") === 1)
          .select("user_id", "ema_c")
          .orderBy("user_id")
      },
      Some("WITH RECURSIVE e AS (SELECT event_id, user_id, " +
        "CAST(ROUND(value*100,0) AS BIGINT) AS v_c, " +
        "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) " +
        "AS rn FROM events), " +
        "r AS (SELECT event_id, user_id, rn, v_c AS ema_c FROM e " +
        "WHERE rn = 1 UNION ALL " +
        "SELECT e.event_id, e.user_id, e.rn, (e.v_c + r.ema_c) // 2 " +
        "AS ema_c FROM e JOIN r ON e.user_id = r.user_id " +
        "AND e.rn = r.rn + 1), " +
        "mx AS (SELECT user_id, MAX(rn) AS rn FROM e GROUP BY user_id) " +
        "SELECT r.user_id, r.ema_c FROM r JOIN mx " +
        "ON r.user_id = mx.user_id AND r.rn = mx.rn ORDER BY r.user_id")),

    "q_stream_tumbling" -> Q(
      (spark, dir) =>
        Tables(spark, dir, "events")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(valUnits).as("__v"))
          .select(Cols.epochUs(col("w.start")).as("win_start_us"),
            col("event_type"), col("n"),
            (col("__v").cast("double") / 1000000.0).as("sum_value"))
          .orderBy("win_start_us", "event_type"),
      Some("SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us, " +
        "event_type, COUNT(*) AS n, " +
        s"CAST(CAST(SUM($valUnitsSql) AS BIGINT) AS DOUBLE)/1000000.0 " +
        "AS sum_value FROM events GROUP BY 1, 2 " +
        "ORDER BY win_start_us, event_type")),

    "q_stream_sliding" -> Q(
      (spark, dir) =>
        Tables(spark, dir, "events")
          .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(Cols.epochUs(col("w.start")).as("win_start_us"),
            col("event_type"), col("n"))
          .orderBy("win_start_us", "event_type"),
      // a 1h/15min sliding window always covers each row exactly 4 times:
      // starts floor15(ts) − k·15min, k = 0..3
      Some("SELECT (epoch_us(ts)//900000000)*900000000 - k*900000000 " +
        "AS win_start_us, event_type, COUNT(*) AS n " +
        "FROM events CROSS JOIN (VALUES (0::BIGINT),(1),(2),(3)) AS t(k) " +
        "GROUP BY 1, 2 ORDER BY win_start_us, event_type")),

    "q_stream_session" -> Q(
      (spark, dir) =>
        Tables(spark, dir, "events")
          .groupBy(session_window(col("ts"), "30 minutes").as("w"),
            col("user_id"))
          .agg(count(lit(1)).as("n"), sum(valUnits).as("__v"))
          .select(col("user_id"),
            Cols.epochUs(col("w.start")).as("sess_start_us"),
            col("n"),
            (col("__v").cast("double") / 1000000.0).as("sum_value"))
          .orderBy("user_id", "sess_start_us"),
      // gaps-and-islands oracle: a session breaks when the gap > 30 min
      Some("WITH g AS (SELECT user_id, ts, value, CASE WHEN " +
        "epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id " +
        "ORDER BY ts, event_id)) > 1800000000 OR LAG(ts) OVER (PARTITION " +
        "BY user_id ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END AS brk " +
        "FROM events), s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id " +
        "ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS sid FROM g) " +
        "SELECT user_id, epoch_us(MIN(ts)) AS sess_start_us, COUNT(*) AS n, " +
        s"CAST(CAST(SUM($valUnitsSql) AS BIGINT) AS DOUBLE)/1000000.0 " +
        "AS sum_value FROM s GROUP BY user_id, sid " +
        "ORDER BY user_id, sess_start_us")),

    "q_stream_dedup" -> Q(
      (spark, dir) => {
        // duplicate every event (simulating at-least-once delivery), then
        // dedup on event_id — rows in a dup pair are identical, so
        // dropDuplicates is deterministic here
        val e = Tables(spark, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            Cols.epochUs(col("ts")).as("ts_us"))
        e.unionByName(e)
          .dropDuplicates("event_id")
          .orderBy("event_id")
      },
      Some("SELECT DISTINCT event_id, user_id, event_type, " +
        "epoch_us(ts) AS ts_us FROM " +
        "(SELECT * FROM events UNION ALL SELECT * FROM events) " +
        "ORDER BY event_id")),

    "q_stream_enrich" -> Q(
      (spark, dir) => {
        // batch-equivalent of Events.enrich (stream-static dimension
        // join): hourly event counts per customer market segment. Same
        // join + window logic as the streaming job; MemoryStream parity
        // in StreamingSpec.
        val e = Tables(spark, dir, "events")
        val c = Tables(spark, dir, "customer")
        Events.enrich(e, c)
          .select(Cols.epochUs(col("win_start")).as("win_start_us"),
            col("c_mktsegment"), col("n"))
          .orderBy("win_start_us", "c_mktsegment")
      },
      Some("SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us, " +
        "c_mktsegment, COUNT(*) AS n " +
        "FROM events JOIN customer ON user_id = c_custkey " +
        "GROUP BY 1, 2 ORDER BY win_start_us, c_mktsegment")),

    "q_stream_hic_marginals" -> Q(
      (spark, dir) => {
        // batch-equivalent of the §2.10 incremental Hi-C job: the SAME
        // locusUpdates column logic HicStream.incrementalMarginals feeds
        // into flatMapGroupsWithState, aggregated to the per-chromosome
        // summary the streaming state converges to (StreamingSpec pins
        // the stream side against batch q_hic_marginals per locus; this
        // declared query oracle-pins the shared transform per chr).
        val c = graft.hic.ContactsView(spark, dir)
          .select(col("chr").as("chr1"), col("mid1"),
            col("chr").as("chr2"), col("mid2"), col("contactCount"))
        HicStream.locusUpdates(c)
          .groupBy("chr", "mid")
          .agg(sum(col("contactCount")).as("hitCount"),
            count(lit(1)).as("n_pairs"))
          .groupBy("chr")
          .agg(count(lit(1)).as("n_loci"),
            sum(col("hitCount")).as("sum_hits"),
            max(col("hitCount")).as("max_hits"),
            sum(col("n_pairs")).as("n_pair_ends"))
          .orderBy("chr")
      },
      Some(graft.hic.ContactsView.cte + ", m AS (SELECT chr, mid, " +
        "CAST(SUM(contactCount) AS BIGINT) AS hitCount, " +
        "COUNT(*) AS n_pairs FROM " +
        "(SELECT chr, mid1 AS mid, contactCount FROM c " +
        "UNION ALL SELECT chr, mid2 AS mid, contactCount FROM c) " +
        "GROUP BY chr, mid) " +
        "SELECT chr, COUNT(*) AS n_loci, " +
        "CAST(SUM(hitCount) AS BIGINT) AS sum_hits, " +
        "CAST(MAX(hitCount) AS BIGINT) AS max_hits, " +
        "CAST(SUM(n_pairs) AS BIGINT) AS n_pair_ends " +
        "FROM m GROUP BY chr ORDER BY chr")),

    "q_stream_interval_join" -> Q(
      (spark, dir) => {
        // batch frame of Events.intervalJoin (stream-stream purchase ⋈
        // prior-views-within-30min); StreamingSpec asserts MemoryStream
        // parity of the same transform. Timestamps leave as epoch-µs.
        val ev = Tables(spark, dir, "events")
        val joined = Events.intervalJoin(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "view"))
        joined.select(col("p_id"), col("user_id"),
            Cols.epochUs(col("p_ts")).as("p_tus"), col("v_id"),
            Cols.epochUs(col("v_ts")).as("v_tus"))
          .orderBy("p_id", "v_id")
      },
      Some("SELECT p.event_id AS p_id, p.user_id, " +
        "epoch_us(p.ts) AS p_tus, v.event_id AS v_id, " +
        "epoch_us(v.ts) AS v_tus " +
        "FROM events p JOIN events v ON p.user_id = v.user_id " +
        "AND p.event_type = 'purchase' AND v.event_type = 'view' " +
        "AND epoch_us(v.ts) >= epoch_us(p.ts) - 1800000000 " +
        "AND epoch_us(v.ts) < epoch_us(p.ts) " +
        "ORDER BY p_id, v_id")),

    "q_stream_interval_join_outer" -> Q(
      (spark, dir) => {
        // batch frame of Events.intervalJoinOuter: a purchase with no
        // prior view still emits — the watermark-driven null-emission
        // semantics StreamingSpec pins on the streaming leg. Null view
        // columns leave as a -1 sentinel so the hash compare is
        // null-ordering- and dtype-stable.
        val ev = Tables(spark, dir, "events")
        Events.intervalJoinOuter(
            ev.filter(col("event_type") === "purchase"),
            ev.filter(col("event_type") === "view"))
          .select(col("p_id"), col("user_id"),
            Cols.epochUs(col("p_ts")).as("p_tus"),
            coalesce(col("v_id"), lit(-1L)).as("v_id"),
            coalesce(Cols.epochUs(col("v_ts")), lit(-1L)).as("v_tus"))
          .orderBy("p_id", "v_id")
      },
      Some("SELECT p.event_id AS p_id, p.user_id, " +
        "epoch_us(p.ts) AS p_tus, " +
        "COALESCE(v.event_id, -1) AS v_id, " +
        "COALESCE(epoch_us(v.ts), -1) AS v_tus " +
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v " +
        "ON p.user_id = v.user_id " +
        "AND epoch_us(v.ts) >= epoch_us(p.ts) - 1800000000 " +
        "AND epoch_us(v.ts) < epoch_us(p.ts) " +
        "ORDER BY p_id, v_id")),

    "q_stream_interval_join_full" -> Q(
      (spark, dir) => {
        // batch frame of Events.intervalJoinFull: BOTH sides' unmatched
        // rows emit — no-view purchases AND no-follow-up views (the
        // abandoned-browse signal) — with null columns as -1 sentinels
        // on whichever side is absent. StreamingSpec pins the streaming
        // leg's two-sided null emission against this same transform;
        // (p_id, v_id) is a total order (unmatched views carry p_id=-1
        // and distinct v_ids).
        val ev = Tables(spark, dir, "events")
        Events.intervalJoinFull(
            ev.filter(col("event_type") === "purchase"),
            ev.filter(col("event_type") === "view"))
          .select(coalesce(col("p_id"), lit(-1L)).as("p_id"),
            col("user_id"),
            coalesce(Cols.epochUs(col("p_ts")), lit(-1L)).as("p_tus"),
            coalesce(col("v_id"), lit(-1L)).as("v_id"),
            coalesce(Cols.epochUs(col("v_ts")), lit(-1L)).as("v_tus"))
          .orderBy("p_id", "v_id")
      },
      Some("SELECT COALESCE(p.event_id, -1) AS p_id, " +
        "COALESCE(p.user_id, v.user_id) AS user_id, " +
        "COALESCE(epoch_us(p.ts), -1) AS p_tus, " +
        "COALESCE(v.event_id, -1) AS v_id, " +
        "COALESCE(epoch_us(v.ts), -1) AS v_tus " +
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "FULL JOIN (SELECT * FROM events WHERE event_type = 'view') v " +
        "ON p.user_id = v.user_id " +
        "AND epoch_us(v.ts) >= epoch_us(p.ts) - 1800000000 " +
        "AND epoch_us(v.ts) < epoch_us(p.ts) " +
        "ORDER BY p_id, v_id")),

    "q_stream_interval_join_right" -> Q(
      (spark, dir) => {
        // batch frame of Events.intervalJoinRight — the view-side
        // projection: every view emits (purchase columns -1 when
        // nothing followed), unmatched purchases drop. Completes the
        // interval family inner/left/full/right on the shared impl.
        val ev = Tables(spark, dir, "events")
        Events.intervalJoinRight(
            ev.filter(col("event_type") === "purchase"),
            ev.filter(col("event_type") === "view"))
          .select(coalesce(col("p_id"), lit(-1L)).as("p_id"),
            col("user_id"),
            coalesce(Cols.epochUs(col("p_ts")), lit(-1L)).as("p_tus"),
            col("v_id"), Cols.epochUs(col("v_ts")).as("v_tus"))
          .orderBy("p_id", "v_id")
      },
      Some("SELECT COALESCE(p.event_id, -1) AS p_id, " +
        "COALESCE(p.user_id, v.user_id) AS user_id, " +
        "COALESCE(epoch_us(p.ts), -1) AS p_tus, " +
        "v.event_id AS v_id, epoch_us(v.ts) AS v_tus " +
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p " +
        "RIGHT JOIN (SELECT * FROM events WHERE event_type = 'view') v " +
        "ON p.user_id = v.user_id " +
        "AND epoch_us(v.ts) >= epoch_us(p.ts) - 1800000000 " +
        "AND epoch_us(v.ts) < epoch_us(p.ts) " +
        "ORDER BY p_id, v_id")))
}
