package graft.hic

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-processing merge of adjacent significant bin pairs into peak runs
  * (SURVEY.md A25, the FitHiC2 merge-filter utility): classic
  * gaps-and-islands with lag + cumulative-flag windows, keyed by
  * (chr1, mid1, chr2) so it partitions cleanly.
  */
object MergeFilter {
  /** `sig`: significant pairs with chr1, mid1, chr2, mid2, contactCount.
    * Two pairs merge when they share (chr1, mid1, chr2) and their mid2 are
    * exactly `resolution` apart. Output: one row per merged run.
    */
  def mergeAdjacent(sig: DataFrame, resolution: Long): DataFrame = {
    val w = Window.partitionBy("chr1", "mid1", "chr2").orderBy("mid2")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sig
      .withColumn("brk",
        when(col("mid2") - lag(col("mid2"), 1).over(w) === resolution, 0)
          .otherwise(1))
      .withColumn("island", sum(col("brk")).over(wRun))
      .groupBy("chr1", "mid1", "chr2", "island")
      .agg(min(col("mid2")).as("mid2_start"),
        max(col("mid2")).as("mid2_end"),
        count(lit(1)).as("n_bins"),
        sum(col("contactCount")).as("sumCount"))
      .drop("island")
  }
}
