package graft.hic

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.GlobalOrder

/** Statistical kernels of the significance pipeline (SURVEY.md A18–A19). */
object Stats {
  /** Benjamini–Hochberg q-values (SURVEY A19), scalable.
    *
    * q_i = min(1, min_{j ≥ i}(p_j · M / j)) with i the ascending p-rank and
    * M the number of tests (FitHiC uses *possible* pair count, not observed
    * rows — pass it via `mOpt`; defaults to `df.count()`).
    *
    * No single-partition window: global rank via [[GlobalOrder]], then the
    * suffix-min is computed per range-partition plus a broadcast of the
    * O(numPartitions) per-partition minima (SURVEY §7.3 #3).
    */
  def bhQ(df: DataFrame, pCol: String, tieCols: Seq[String], qCol: String,
      mOpt: Option[Long] = None): DataFrame = {
    val spark = df.sparkSession
    val m = mOpt.getOrElse(df.count())
    val (rankedRaw, cleanupRanged) = GlobalOrder.rankAndCumsumCleanable(df,
      col(pCol) +: tieCols.map(col), "__rank", keepPid = true)
    val ranked = rankedRaw
      .withColumn("__v", col(pCol) * m / col("__rank"))
      .persist()
    val pidMins = ranked.groupBy(GlobalOrder.PID).agg(min("__v").as("__mn"))
      .collect()
      .map(r => (r.getAs[Int](0), r.getAs[Double](1)))
      .sortBy(-_._1)
    // `ranked` is fully cached by the collect above → the internal range
    // cache can go (deterministic recompute if evicted)
    cleanupRanged()
    // tail(pid) = min of __v over all strictly-later partitions
    var run = Double.MaxValue
    val tails = pidMins.map { case (pid, mn) =>
      val t = (pid, run); run = math.min(run, mn); t
    }.toSeq
    import spark.implicits._
    val tailDf = tails.toDF(GlobalOrder.PID, "__tail")
    val wDesc = Window.partitionBy(GlobalOrder.PID)
      .orderBy(col("__rank").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.join(broadcast(tailDf), GlobalOrder.PID)
      .withColumn(qCol,
        least(lit(1.0), least(min(col("__v")).over(wDesc), col("__tail"))))
      .drop("__v", "__rank", "__tail", GlobalOrder.PID)
  }
}
