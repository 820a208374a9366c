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
    *
    * Unlike [[equalOccupancy]] (whose DataFrame shape the oracle-checked
    * bin queries need), this skips the groupBy exchange entirely: the
    * ranked pass already runs partition-local over the ranged cache, so
    * each task folds its rows into ≤ nBins partial summaries
    * (bins are contiguous in the global order — a partition overlaps
    * ~nBins/P + 1 of them) and the driver merges O(P + nBins) partials
    * with exact integer arithmetic. One narrow job instead of a
    * shuffle + collect, bit-identical output at any partitioning.
    */
  def collectBins(contacts: DataFrame, nBins: Int, tieCols: Seq[String],
      assumeRanged: Boolean = false): Array[org.apache.spark.sql.Row] = {
    val (ranked, stats, cleanup) = GlobalOrder.rankAndCumsumWithStats(
      contacts, col("dist") +: tieCols.map(col), "__rank",
      cum = Some((col("contactCount"), "__cum")),
      assumeRanged = assumeRanged)
    require(stats.rows > 0,
      "equalOccupancy: empty contact set (no rows to bin)")
    val total = stats.total
    try {
      val spark = contacts.sparkSession
      import spark.implicits._
      val partials = ranked
        .select(expr(s"cast(((__cum - 1) * $nBins) div ${total}L as int)")
            .as("binIdx"),
          col("contactCount"), col("dist"))
        .as[(Int, Long, Long)]
        .mapPartitions { it =>
          // binIdx is non-decreasing within a partition (the layout is
          // cum-ordered), so an open accumulator per current bin suffices
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Int, Long, Long, Long, Long, Long)]
          var bin = -1
          var cnt = 0L; var sumC = 0L; var sumD = 0L
          var minD = Long.MaxValue; var maxD = Long.MinValue
          def flush(): Unit = if (bin >= 0)
            out += ((bin, cnt, sumC, sumD, minD, maxD))
          it.foreach { case (b, c, d) =>
            if (b != bin) {
              flush(); bin = b
              cnt = 0L; sumC = 0L; sumD = 0L
              minD = Long.MaxValue; maxD = Long.MinValue
            }
            cnt += 1; sumC += c; sumD += d
            if (d < minD) minD = d
            if (d > maxD) maxD = d
          }
          flush()
          out.iterator
        }
        .collect()
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("binIdx",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("pairCount",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("sumCount",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("sumDist",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("minDist",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("maxDist",
          org.apache.spark.sql.types.LongType, nullable = false)))
      partials.groupBy(_._1).toArray.sortBy(_._1).map { case (bin, ps) =>
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          Array[Any](bin,
            ps.map(_._2).sum, ps.map(_._3).sum, ps.map(_._4).sum,
            ps.map(_._5).min, ps.map(_._6).max),
          schema): org.apache.spark.sql.Row
      }
    } finally cleanup()
  }
}
