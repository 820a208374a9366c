package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Event-time TIMERS on the transformWithState API — the second half of
  * the arbitrary-state surface next to [[TwsEma]]'s per-batch state
  * updates: a session-close notifier. Each user's open session lives in
  * one ValueState (start, last, count); every batch extends or rolls it
  * (gaps closing WITHIN a batch emit immediately; the split uses the
  * SAME half-open boundary as the timer — a gap of exactly `gapMs`
  * closes on both paths, so output cannot depend on batch boundaries), deletes the stale
  * timer and arms a fresh one at `last + gap`; when the WATERMARK passes
  * that instant, `handleExpiredTimer` emits the closed session and
  * clears the state — the pattern session_window cannot express (it
  * emits aggregates, not close events, and only on the next input for
  * the key; the timer fires from watermark progress alone).
  *
  * Emission order within a batch is keyed-shuffle order, so consumers
  * treat the output as a SET (TwsSpec compares sets); times are epoch
  * millis (the timer clock's unit).
  */
object TwsSessions {
  case class Ev(user_id: Long, ts: Timestamp)
  case class Sess(user_id: Long, start_ms: Long, end_ms: Long, n: Long)

  class Processor(gapMs: Long)
      extends StatefulProcessor[Long, Ev, Sess] {
    @transient private var st: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState("sess",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Sess] = {
      val times = rows.map(_.ts.getTime).toArray.sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[Sess]
      var cur = if (st.exists()) Option(st.get()) else None
      times.foreach { t =>
        cur match {
          case Some((s, last, n)) if t - last >= gapMs =>
            out += Sess(key, s, last, n) // gap closed inside the batch
            cur = Some((t, t, 1L))
          case Some((s, last, n)) =>
            // min on the start too: a within-watermark late event from
            // an EARLIER batch can precede the stored session start —
            // keeping s unchanged made the emitted start depend on
            // which batch boundary split the input
            cur = Some((math.min(s, t), math.max(last, t), n + 1))
          case None =>
            cur = Some((t, t, 1L))
        }
      }
      cur.foreach { case st3 @ (_, last, _) =>
        st.update(st3)
        // one live timer per key: drop the stale one, arm at last + gap
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
        getHandle.registerTimer(last + gapMs)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Sess] =
      if (st.exists()) {
        val (s, last, n) = st.get()
        st.clear()
        Iterator.single(Sess(key, s, last, n))
      } else Iterator.empty
  }

  /** events(ts, user_id, …) → closed sessions, emitted when the
    * watermark passes `last event + gap`.
    */
  def sessionStream(events: DataFrame, gapMs: Long,
      watermark: String = "0 seconds"): Dataset[Sess] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", watermark)
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new Processor(gapMs), TimeMode.EventTime(),
        OutputMode.Append())
  }
}
