package graft.hic

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.GlobalOrder

/** Equal-occupancy binning (SURVEY.md A13–A14): order contacts by genomic
  * distance, split into `nBins` bins of ≈ equal total contact mass, compute
  * per-bin summary stats. The global sort+cumsum never collapses to one
  * partition ([[GlobalOrder]]); bin assignment is pure integer arithmetic
  * (`(cum−1)·nBins div total`), so it is reproducible bit-for-bit in any
  * engine.
  */
object Binning {
  /** Input must have columns dist (long), contactCount (long) plus
    * `tieCols` completing a total order. Output: one row per binIdx with
    * pairCount, sumCount, minDist, maxDist, sumDist.
    */
  def equalOccupancy(contacts: DataFrame, nBins: Int,
      tieCols: Seq[String]): DataFrame =
    equalOccupancyCleanable(contacts, nBins, tieCols)._1

  /** As [[equalOccupancy]] plus the cleanup thunk for the internal
    * range-partitioned cache (call after materializing the bins).
    */
  def equalOccupancyCleanable(contacts: DataFrame, nBins: Int,
      tieCols: Seq[String], assumeRanged: Boolean = false)
      : (DataFrame, () => Unit) = {
    // the grand total comes from GlobalOrder's per-partition offset stats
    // — no separate full-table aggregate job
    val (ranked, stats, cleanup) = GlobalOrder.rankAndCumsumWithStats(
      contacts, col("dist") +: tieCols.map(col), "__rank",
      cum = Some((col("contactCount"), "__cum")),
      assumeRanged = assumeRanged)
    require(stats.rows > 0,
      "equalOccupancy: empty contact set (no rows to bin)")
    val total = stats.total
    val bins = ranked
      .withColumn("binIdx",
        expr(s"((__cum - 1) * $nBins) div ${total}L").cast("int"))
      .groupBy("binIdx")
      .agg(count(lit(1)).as("pairCount"),
        sum(col("contactCount")).as("sumCount"),
        sum(col("dist")).as("sumDist"),
        min(col("dist")).as("minDist"),
        max(col("dist")).as("maxDist"))
    (bins, cleanup)
  }

  /** Materialize the bins (binIdx-ordered) and release the internal cache
    * — the form every statistical consumer (Pipeline, spline queries)
    * wants.
    */
  def collectBins(contacts: DataFrame, nBins: Int, tieCols: Seq[String],
      assumeRanged: Boolean = false): Array[org.apache.spark.sql.Row] = {
    val (bins, cleanup) =
      equalOccupancyCleanable(contacts, nBins, tieCols, assumeRanged)
    try bins.orderBy("binIdx").collect()
    finally cleanup()
  }
}
