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
}
