package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming jobs over the events schema (SURVEY.md §2.10).
  *
  * Each transform is a pure DataFrame → DataFrame usable on BOTH a batch
  * frame and a `readStream` source — the batch-equivalent declared queries
  * (StreamQueries) and the streaming tests (StreamingSpec, MemoryStream)
  * share this exact logic. Watermarks bound state: rows later than the
  * watermark are dropped from window aggregates;
  * dropDuplicatesWithinWatermark bounds the dedup key set.
  */
object Events {
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  val defaultWatermark = "2 hours"

  /** 1-hour tumbling counts + value sums per event type. */
  def tumbling(events: DataFrame, watermark: String = defaultWatermark)
      : DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"),
        col("sum_value"))

  /** 1-hour windows sliding every 15 minutes. */
  def sliding(events: DataFrame, watermark: String = defaultWatermark)
      : DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"))

  /** Per-user session windows with a 30-minute inactivity gap. */
  def sessions(events: DataFrame, watermark: String = defaultWatermark)
      : DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("w.start").as("sess_start"), col("n"),
        col("sum_value"))

  /** Stateful exactly-once projection of at-least-once input. */
  def dedup(events: DataFrame, watermark: String = defaultWatermark)
      : DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: events joined to a STATIC dimension (the
    * reference-data pattern — Spark re-broadcasts the dim per micro-batch,
    * no join state, no watermark needed for the join leg), then windowed
    * per dimension attribute. At 100 TB of stream the dim stays a
    * broadcast; a dim too big to broadcast becomes the stream-stream
    * shape ([[intervalJoin]]) instead.
    */
  def enrich(events: DataFrame, dim: DataFrame,
      watermark: String = defaultWatermark): DataFrame =
    events.withWatermark("ts", watermark)
      .join(broadcast(dim.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("c_mktsegment"),
        col("n"))

  /** Stream-stream interval join: each purchase paired with every view by
    * the same user in the preceding 30 minutes. The canonical Structured
    * Streaming two-stream join — watermarks on BOTH sides plus an
    * event-time range predicate are exactly what lets Spark expire join
    * state (a view older than watermark + 30 min can never match again).
    * Pure DataFrame → DataFrame: the batch-equivalent declared query
    * (q_stream_interval_join) and the MemoryStream parity test share it.
    */
  def intervalJoin(purchases: DataFrame, views: DataFrame,
      watermark: String = defaultWatermark): DataFrame =
    intervalJoinImpl(purchases, views, watermark, "inner")

  /** LEFT OUTER variant of [[intervalJoin]]: a purchase with NO prior
    * view in its 30-minute window still emits, null view columns. In
    * streaming the null row appears only once BOTH sides' watermarks
    * pass the window end (the state store can then prove no match will
    * arrive and evicts the left row); in batch the identical plan is a
    * plain left join. The event-time band in the join condition is
    * what makes the outer join watermark-bounded — Spark rejects a
    * stream-stream outer join without one.
    */
  def intervalJoinOuter(purchases: DataFrame, views: DataFrame,
      watermark: String = defaultWatermark): DataFrame =
    intervalJoinImpl(purchases, views, watermark, "left_outer")

  /** FULL OUTER variant: unmatched rows on BOTH sides emit — a
    * purchase with no prior view (null view columns) AND a view no
    * purchase followed within 30 minutes (null purchase columns, the
    * abandoned-browse signal). Each side's null rows appear only once
    * the OTHER side's watermark proves no partner can still arrive, so
    * state stays bounded exactly as in the one-sided outer;
    * `user_id` coalesces across the two sides so every output row
    * carries its user.
    */
  def intervalJoinFull(purchases: DataFrame, views: DataFrame,
      watermark: String = defaultWatermark): DataFrame =
    intervalJoinImpl(purchases, views, watermark, "full_outer")

  /** RIGHT OUTER variant — the view-side projection of
    * [[intervalJoinFull]]: every view emits (null purchase columns when
    * nothing followed within 30 minutes — the abandoned-browse rows),
    * matched purchases ride along, unmatched purchases are dropped.
    * Completes the interval-join family (inner/left/full/right) on the
    * one shared impl.
    */
  def intervalJoinRight(purchases: DataFrame, views: DataFrame,
      watermark: String = defaultWatermark): DataFrame =
    intervalJoinImpl(purchases, views, watermark, "right_outer")

  private def intervalJoinImpl(purchases: DataFrame, views: DataFrame,
      watermark: String, joinType: String): DataFrame = {
    val p = purchases
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val v = views
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", watermark)
    val user =
      if (joinType == "full_outer" || joinType == "right_outer")
        coalesce(col("user_id"), col("v_user"))
      else col("user_id")
    p.join(v,
        col("user_id") === col("v_user") &&
          col("v_ts") >= col("p_ts") - expr("interval 30 minutes") &&
          col("v_ts") < col("p_ts"),
        joinType)
      .select(col("p_id"), user.as("user_id"), col("p_ts"), col("v_id"),
        col("v_ts"))
  }

  // The incremental Hi-C analog (SURVEY §2.10: flatMapGroupsWithState
  // marginals + foreachBatch spline refit) lives in [[HicStream]].
}
