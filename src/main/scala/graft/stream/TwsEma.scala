package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.ops.Cols

/** The arbitrary-state operator on Spark 4's NEW streaming state API —
  * `transformWithState` with a `StatefulProcessor` — next to the classic
  * `flatMapGroupsWithState` job in [[HicStream]]: typed named state
  * (`ValueState`), per-key batch processing, RocksDB-backed store.
  *
  * Semantics: the SAME floor-integer EMA as the batch window function
  * (graft.functions.EmaCents, `s' = ⌊(x+s)/2⌋`) — one long of state per
  * user, updated in (ts, event_id) order within each micro-batch, the
  * post-batch state emitted in Update mode. Because the recurrence is
  * exact integers, stream-vs-batch parity is EXACT equality, pinned in
  * TwsSpec against the declared batch twin q_stream_ema.
  *
  * Order contract: within a micro-batch rows are sorted by
  * (ts_us, event_id) before folding (shuffle order is arbitrary);
  * ACROSS batches the caller must feed time-ordered batches — the same
  * contract every event-time stateful recurrence carries (a watermark
  * cannot re-order already-committed state).
  */
object TwsEma {
  case class Obs(user_id: Long, ts_us: Long, event_id: Long, v_c: Long)
  case class EmaOut(user_id: Long, ema_c: Long)

  class Processor extends StatefulProcessor[Long, Obs, EmaOut] {
    @transient private var state: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Long]("ema", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Obs],
        timerValues: TimerValues): Iterator[EmaOut] = {
      val sorted = rows.toArray.sortBy(r => (r.ts_us, r.event_id))
      var s = if (state.exists()) Option(state.get()) else None
      sorted.foreach { r =>
        s = Some(s.fold(r.v_c)(p => (r.v_c + p) >> 1))
      }
      s.foreach(state.update)
      s.map(v => EmaOut(key, v)).iterator
    }
  }

  /** events(ts, user_id, event_id, value) → per-user running EMA state,
    * one row per (user, micro-batch) in Update mode.
    */
  def emaStream(events: DataFrame): Dataset[EmaOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), Cols.epochUs(col("ts")).as("ts_us"),
        col("event_id"), Cols.cents(col("value")).as("v_c"))
      .as[Obs]
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(),
        OutputMode.Update())
  }
}
