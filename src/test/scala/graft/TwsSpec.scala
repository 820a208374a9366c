package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.stream.Events.Event
import graft.stream.TwsEma

/** transformWithState (Spark 4 arbitrary-state API, RocksDB store):
  * multi-batch stream-vs-batch EXACT parity of the per-user EMA state
  * with the declared batch twin q_stream_ema, plus the within-batch
  * reorder contract (rows folded in (ts, event_id) order regardless of
  * arrival order inside a batch).
  */
class TwsSpec extends AnyFunSuite with Matchers with SparkTest {
  private def ts(m: Long): Timestamp =
    new Timestamp(1704067200000L + m * 60000L)

  private def ev(id: Long, m: Long, user: Long, v: Double): Event =
    Event(id, ts(m), user, "click", v, "{}")

  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def runTws(batches: Seq[Seq[Event]]): Map[Long, Long] = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = sp.conf.getOption(key)
    sp.conf.set(key, rocksdb)
    try {
      val mem = MemoryStream[Event]
      val name = s"tws_${System.nanoTime()}"
      val q = TwsEma.emaStream(mem.toDF()).writeStream.format("memory")
        .queryName(name).outputMode("update").start()
      try {
        batches.foreach { b => mem.addData(b); q.processAllAvailable() }
        // update mode appends one state row per (user, batch); the LAST
        // row per user is the final state
        sp.table(name).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      } finally q.stop()
    } finally {
      prev.fold(sp.conf.unset(key))(sp.conf.set(key, _))
    }
  }

  test("multi-batch TWS state equals the batch q_stream_ema twin") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(11)
    val all = (0 until 120).map { i =>
      ev(i.toLong, i.toLong, i % 7L, rnd.nextInt(50000) / 100.0)
    }
    // time-ordered batches (the cross-batch order contract)
    val batches = all.grouped(40).toSeq
    val streamed = runTws(batches)

    val dir = graft.io.Scratch.sub("tws_batch")
    all.toDF().write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = Registry.all("q_stream_ema").fn(sp, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    streamed shouldBe batch
    streamed.keySet should have size 7
  }

  test("event-time timers close sessions as the watermark passes") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = sp.conf.getOption(key)
    sp.conf.set(key, rocksdb)
    try {
      val mem = MemoryStream[Event]
      val name = s"twstimer_${System.nanoTime()}"
      val gapMs = 5 * 60000L
      val q = graft.stream.TwsSessions
        .sessionStream(mem.toDF(), gapMs).writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        // batch 1: u1 spans minutes 0-4 (one session), u2 a singleton
        mem.addData(Seq(ev(1, 0, 1, 1.0), ev(2, 2, 1, 1.0), ev(3, 4, 1, 1.0),
          ev(4, 1, 2, 1.0)))
        q.processAllAvailable()
        // batch 2: u1 reappears past the gap → batch-internal close of
        // the first session; watermark jumps to minute 20 → u2's timer
        // (armed at minute 6) fires in the no-data batch
        mem.addData(Seq(ev(5, 20, 1, 1.0)))
        q.processAllAvailable()
        // batch 3: an unrelated user pushes the watermark to minute 60
        // → u1's second session (timer at minute 25) closes via timer
        mem.addData(Seq(ev(6, 60, 3, 1.0)))
        q.processAllAvailable()
        val got = sp.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSet
        def ms(m: Long): Long = ts(m).getTime
        got shouldBe Set(
          (1L, ms(0), ms(4), 3L), // closed by the in-batch gap
          (2L, ms(1), ms(1), 1L), // closed by its expired timer
          (1L, ms(20), ms(20), 1L)) // closed once the watermark passed
      } finally q.stop()
    } finally prev.fold(sp.conf.unset(key))(sp.conf.set(key, _))
  }

  test("a within-watermark LATE event extends the session start " +
      "backwards — output does not depend on the batch boundary") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = sp.conf.getOption(key)
    sp.conf.set(key, rocksdb)
    try {
      val mem = MemoryStream[Event]
      val name = s"twslate_${System.nanoTime()}"
      val gapMs = 30 * 60000L
      val q = graft.stream.TwsSessions
        .sessionStream(mem.toDF(), gapMs, watermark = "10 minutes")
        .writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        // batch 1: u1 at minute 10 (state start=10)
        mem.addData(Seq(ev(1, 10, 1, 1.0)))
        q.processAllAvailable()
        // batch 2: a LATE u1 event at minute 5 (inside the watermark:
        // the watermark is still behind minute 5) — must pull the
        // session start BACK to minute 5, exactly as a single-batch
        // sorted fold would have. Then an unrelated user far in the
        // future closes u1's session via its timer.
        mem.addData(Seq(ev(2, 5, 1, 1.0)))
        q.processAllAvailable()
        mem.addData(Seq(ev(3, 600, 9, 1.0)))
        q.processAllAvailable()
        def ms(m: Long): Long = ts(m).getTime
        val u1 = sp.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).filter(_._1 == 1L).toSet
        u1 shouldBe Set((1L, ms(5), ms(10), 2L))
      } finally q.stop()
    } finally prev.fold(sp.conf.unset(key))(sp.conf.set(key, _))
  }

  test("a gap of exactly gapMs closes on BOTH paths (batch ≡ timer)") {
    // two events exactly gap apart in ONE batch must split, because the
    // timer armed at last+gap would split them across batches — output
    // must not depend on batch boundaries
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = sp.conf.getOption(key)
    sp.conf.set(key, rocksdb)
    try {
      val mem = MemoryStream[Event]
      val name = s"twsgap_${System.nanoTime()}"
      val q = graft.stream.TwsSessions
        .sessionStream(mem.toDF(), 5 * 60000L).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      try {
        mem.addData(Seq(ev(1, 0, 9, 1.0), ev(2, 5, 9, 1.0)))
        q.processAllAvailable()
        mem.addData(Seq(ev(3, 60, 3, 1.0))) // watermark push
        q.processAllAvailable()
        val sessions = sp.table(name).collect()
          .filter(_.getLong(0) == 9L).map(r => (r.getLong(1), r.getLong(3)))
        sessions.toSet shouldBe Set((ts(0).getTime, 1L),
          (ts(5).getTime, 1L)) // two singleton sessions, not one pair
      } finally q.stop()
    } finally prev.fold(sp.conf.unset(key))(sp.conf.set(key, _))
  }

  test("bulk seeded differential: TWS closed sessions ≡ JVM gap fold") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = sp.conf.getOption(key)
    sp.conf.set(key, rocksdb)
    val gapMs = 7 * 60000L
    val rnd = new scala.util.Random(23)
    // 9 users, increasing times with random 1–15 min inter-event gaps
    var m = 0L
    val evs = (0 until 200).map { i =>
      m += 1 + rnd.nextInt(15)
      ev(i.toLong, m, i % 9L, 1.0)
    }
    val sentinel = ev(999, m + 10000, 99L, 1.0) // watermark push
    try {
      val mem = MemoryStream[Event]
      val name = s"twsbulk_${System.nanoTime()}"
      val q = graft.stream.TwsSessions
        .sessionStream(mem.toDF(), gapMs).writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      try {
        (evs.grouped(50).toSeq :+ Seq(sentinel)).foreach { b =>
          mem.addData(b); q.processAllAvailable()
        }
        val got = sp.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSet
        // JVM reference: per-user fold with the same half-open gap;
        // every non-sentinel session closes (sentinel is 10000 min out)
        val expected = evs.groupBy(_.user_id).flatMap { case (u, es) =>
          val ts = es.map(_.ts.getTime).sorted
          val sessions =
            scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          var start = ts.head; var last = ts.head; var n = 1L
          ts.tail.foreach { t =>
            if (t - last >= gapMs) {
              sessions += ((start, last, n)); start = t; last = t; n = 1
            } else { last = t; n += 1 }
          }
          sessions += ((start, last, n))
          sessions.map { case (s, l, k) => (u, s, l, k) }
        }.toSet
        got shouldBe expected
      } finally q.stop()
    } finally prev.fold(sp.conf.unset(key))(sp.conf.set(key, _))
  }

  test("within-batch arrival order does not matter (sorted fold)") {
    val ordered = Seq(ev(1, 0, 5, 100.0), ev(2, 1, 5, 300.0),
      ev(3, 2, 5, 500.0))
    val shuffled = Seq(ordered(2), ordered(0), ordered(1))
    runTws(Seq(shuffled)) shouldBe runTws(Seq(ordered))
    // and the value is the exact recurrence: (((100)+300)/2+500)/2 cents
    runTws(Seq(ordered))(5L) shouldBe
      java.lang.Math.floorDiv(java.lang.Math.floorDiv(
        10000L + 30000L, 2) + 50000L, 2)
  }
}
