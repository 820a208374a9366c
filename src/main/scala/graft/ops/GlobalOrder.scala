package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Scalable global-order primitives: total-order rank and running sum
  * without ever collapsing to a single partition (SURVEY.md §7.3 #3).
  *
  * Pattern: range-repartition + sort on the order key and CACHE that
  * layout — the physical partition order then IS the global order, so
  * every per-partition quantity (row offsets, running-sum offsets) comes
  * from one tiny mapPartitions summary collected to the driver
  * (O(numPartitions) rows), and rank/cumsum are assigned in a second
  * *narrow* pass over the same cache. No `Window.partitionBy` anywhere:
  * a window keyed on the partition id would hash-exchange the full table
  * a second time for data that is already laid out correctly, and a
  * naive `Window.orderBy` with no partitionBy would funnel everything
  * through one task. At cluster scale the one range exchange is the only
  * full shuffle.
  */
object GlobalOrder {
  /** Partition-id column appended when `keepPid = true`, for callers that
    * continue partition-local work aligned with the global order.
    */
  val PID = "__go_pid"

  private val CUMV = "__go_cumv"

  /** Per-partition layout stats of the ranged cache: `offsets(pid)` =
    * (rows before pid, cum-sum before pid); `rows`/`total` are the grand
    * count and cum-column sum — callers that need them must NOT run their
    * own aggregation job.
    */
  final case class RangeStats(offsets: Map[Int, (Long, Long)], rows: Long,
      total: Long)

  /** Adds `rankCol` — the 1-based global row number by `orderCols`
    * (LongType) — and, if `cum` is given, a column holding the inclusive
    * global running sum of `cum._1` (cast to long) named `cum._2`.
    * `orderCols` must define a total order (include a unique tiebreak).
    * Null cum values contribute 0 and the output is non-nullable — this
    * DIVERGES from SQL's `SUM(...) OVER` (null until the first non-null):
    * callers mirroring a SQL-window oracle must pre-coalesce nulls.
    */
  def rankAndCumsum(df: DataFrame, orderCols: Seq[Column], rankCol: String,
      cum: Option[(Column, String)] = None,
      keepPid: Boolean = false): DataFrame =
    rankAndCumsumCleanable(df, orderCols, rankCol, cum, keepPid)._1

  /** As [[rankAndCumsum]], plus a cleanup thunk that unpersists the
    * internal range-partitioned cache. Call it once a DOWNSTREAM cache
    * over the result has been materialized (recompute stays correct —
    * everything is deterministic — it just re-reads the source), so
    * long pipelines don't stack persisted copies (a real concern at
    * cluster scale, not at test SF).
    */
  def rankAndCumsumCleanable(df: DataFrame, orderCols: Seq[Column],
      rankCol: String, cum: Option[(Column, String)] = None,
      keepPid: Boolean = false): (DataFrame, () => Unit) = {
    val (out, _, cleanup) =
      rankAndCumsumWithStats(df, orderCols, rankCol, cum, keepPid)
    (out, cleanup)
  }

  /** As [[rankAndCumsumCleanable]], also returning the per-partition
    * [[RangeStats]] gathered by the offset job — the grand total comes
    * for free here, so consumers like equal-occupancy binning never run
    * a separate full-table aggregate.
    */
  /** `assumeRanged = true` promises that `df` is ALREADY range-partitioned
    * and sorted on `orderCols` (e.g. a narrow, layout-preserving filter —
    * a broadcast join — over a previously ranged cache): the exchange, its
    * sampling pass, and the internal persist are all skipped, and the two
    * narrow passes run directly over the caller's layout. Handing over a
    * frame whose layout does NOT match the promise silently corrupts the
    * global order — callers must guarantee it structurally (explicit
    * broadcast hints, never AQE luck).
    */
  def rankAndCumsumWithStats(df: DataFrame, orderCols: Seq[Column],
      rankCol: String, cum: Option[(Column, String)] = None,
      keepPid: Boolean = false, assumeRanged: Boolean = false)
      : (DataFrame, RangeStats, () => Unit) = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = spark.sessionState.conf.numShufflePartitions
    // the range exchange SAMPLES its child before shuffling — persist the
    // source so the upstream plan runs once, not twice; released as soon
    // as the ranged cache is materialized by the stats job below (callers
    // that already cached the input keep ownership of their cache)
    val preCached = assumeRanged ||
      df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val src = if (preCached) df else df.persist()
    val base =
      if (assumeRanged) src
      else src.repartitionByRange(n, orderCols: _*)
        .sortWithinPartitions(orderCols: _*)
    val withCum = cum match {
      case Some((c, _)) => base.withColumn(CUMV, c.cast("long"))
      case None => base
    }
    val ranged =
      if (assumeRanged) withCum // backed by the caller's cache
      else Caches.register(withCum.persist())
    val hasCum = cum.isDefined
    val cumIdx = ranged.schema.fields.length - 1 // CUMV is last when present
    // Partition indices MUST come from the RDD partition object
    // (mapPartitionsWithIndex), never TaskContext.getPartitionId(): the
    // narrow rank pass below executes fused inside the CONSUMER's stage,
    // and a consumer that renumbers partitions (a union's child offset, a
    // coalesce) would hand it shifted task ids — wrong offsets for every
    // partition (see Stats.bhQ for the live instance of this bug).
    val rangedRdd = ranged.rdd
    // job 1 (materializes the cache): tiny per-partition summaries — no
    // shuffle, no window
    val stats = rangedRdd.mapPartitionsWithIndex { (pid, it) =>
      var cnt = 0L
      var s = 0L
      it.foreach { r =>
        cnt += 1
        if (hasCum && !r.isNullAt(cumIdx)) s += r.getLong(cumIdx)
      }
      Iterator.single((pid, cnt, s))
    }.collect().sortBy(_._1)
    if (!preCached) src.unpersist()
    var accN = 0L
    var accS = 0L
    val offs: Map[Int, (Long, Long)] = stats.map { case (pid, cnt, s) =>
      val row = pid -> (accN, accS); accN += cnt; accS += s; row
    }.toMap
    // pass 2 (narrow, runs inside the consumer's job): local scan of the
    // sorted cache attaching rank = local index + row offset etc.
    var outSchema = df.schema.add(rankCol, LongType, nullable = false)
    for ((_, name) <- cum)
      outSchema = outSchema.add(name, LongType, nullable = false)
    if (keepPid) outSchema = outSchema.add(PID, IntegerType, nullable = false)
    // single-array row build: this narrow pass touches EVERY row of the
    // table inside the consumer's job, so the per-row cost matters — one
    // preallocated Array[Any] and one wrap, not toSeq + repeated :+
    // copies (up to 4 backing-array copies per row)
    val nBase = df.schema.fields.length
    val nOut = nBase + 1 + (if (cum.isDefined) 1 else 0) +
      (if (keepPid) 1 else 0)
    val outRdd = rangedRdd.mapPartitionsWithIndex { (pid, it) =>
      val (roff, soff) = offs.getOrElse(pid, (0L, 0L))
      var i = 0L
      var s = 0L
      it.map { r =>
        i += 1
        val arr = new Array[Any](nOut)
        var c = 0
        while (c < nBase) { arr(c) = r.get(c); c += 1 }
        arr(nBase) = roff + i
        if (hasCum) {
          if (!r.isNullAt(cumIdx)) s += r.getLong(cumIdx)
          arr(nBase + 1) = soff + s
        }
        if (keepPid) arr(nOut - 1) = pid
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
      }
    }
    val out = spark.createDataFrame(outRdd, outSchema)
    val cleanup: () => Unit =
      if (assumeRanged) () => () else () => { ranged.unpersist(); () }
    (out, RangeStats(offs, accN, accS), cleanup)
  }
}
