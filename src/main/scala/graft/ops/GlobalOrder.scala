package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global-order primitives: total-order rank and running sum
  * without ever collapsing to a single partition (SURVEY.md §7.3 #3).
  *
  * Pattern: range-repartition on the order key, attach the physical
  * partition id, compute per-partition row/sum offsets with one tiny
  * aggregate collect (O(numPartitions) rows to the driver), broadcast the
  * offsets back, and finish with *partition-local* windows. At cluster
  * scale the range exchange is the only full shuffle; a naive
  * `Window.orderBy(...)` with no partitionBy would funnel all data through
  * one task.
  */
object GlobalOrder {
  /** Internal partition-id column; retained when `keepPid = true` so
    * callers (e.g. the BH suffix scan in [[graft.hic.Stats]]) can continue
    * partition-local work aligned with the global order.
    */
  val PID = "__go_pid"

  /** Adds `rankCol` — the 1-based global row number by `orderCols`
    * (LongType) — and, if `cum` is given, a column holding the inclusive
    * global running sum of `cum._1` (cast to long) named `cum._2`.
    * `orderCols` must define a total order (include a unique tiebreak).
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
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, orderCols: _*)
      .withColumn(PID, spark_partition_id())
      .persist()
    val statAggs = (count(lit(1)).as("__n") +:
      cum.toSeq.map { case (c, _) => sum(c.cast("long")).as("__s") })
    val stats = ranged.groupBy(PID).agg(statAggs.head, statAggs.tail: _*)
      .collect()
      .map(r => (r.getAs[Int](PID), r.getAs[Long]("__n"),
        if (cum.isDefined) r.getAs[Long]("__s") else 0L))
      .sortBy(_._1)
    var accN = 0L
    var accS = 0L
    val offs = stats.map { case (pid, cnt, s) =>
      val row = (pid, accN, accS); accN += cnt; accS += s; row
    }.toSeq
    import spark.implicits._
    val offDf = offs.toDF(PID, "__roff", "__soff")
    val w = Window.partitionBy(PID).orderBy(orderCols: _*)
    var out = ranged.join(broadcast(offDf), PID)
      .withColumn(rankCol, row_number().over(w).cast("long") + col("__roff"))
    for ((c, name) <- cum)
      out = out.withColumn(name,
        sum(c.cast("long")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) +
          col("__soff"))
    out = out.drop("__roff", "__soff")
    (if (keepPid) out else out.drop(PID), () => { ranged.unpersist(); () })
  }
}
