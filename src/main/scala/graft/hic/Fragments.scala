package graft.hic

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fragment-side operators (SURVEY.md A1, A12, A23). */
object Fragments {
  /** A1: mappability filter — fragments with hitCount ≥ threshold. */
  def mappable(frags: DataFrame, thr: Long): DataFrame =
    frags.filter(col("hitCount") >= thr)

  /** A12: number of *possible* intra-chromosomal pairs with distance in
    * [low, up] — the BH denominator (possible, not observed).
    *
    * Distributed closed form: per chromosome, for each locus count the
    * loci at (mid + low .. mid + up] going forward via a range-frame
    * window — O(n log n), no pair materialization (SURVEY §7.3 #6). Each
    * unordered pair is counted exactly once (at its left end).
    */
  def possibleIntraInRange(frags: DataFrame, low: Long, up: Long): Long = {
    import org.apache.spark.sql.expressions.Window
    val lo = math.max(low, 1L) // a pair needs two distinct loci
    val w = Window.partitionBy("chr").orderBy("mid")
      .rangeBetween(lo, math.min(up, Long.MaxValue / 2))
    frags.select(col("chr"), col("mid"))
      .distinct()
      .withColumn("fwd", count(lit(1)).over(w))
      .agg(sum(col("fwd"))).first() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
  }

  /** A12 inter: Σ_{c1<c2} n_c1·n_c2 = (T² − Σ n_c²) / 2 from per-chr locus
    * counts — O(#chromosomes) on the driver.
    */
  def possibleInterAll(frags: DataFrame): Long = {
    val counts = frags.select("chr", "mid").distinct()
      .groupBy("chr").count().collect().map(_.getLong(1))
    val t = counts.sum
    (t * t - counts.map(c => c * c).sum) / 2
  }

  /** A23: fixed-size binning of chromosome sizes → fragment skeleton
    * (chr, extraField=0, mid, hitCount=0, mappable=1).
    */
  def fixedSizeFragments(spark: SparkSession, chromSizes: Seq[(String, Long)],
      resolution: Long): DataFrame = {
    import spark.implicits._
    chromSizes.toDF("chr", "size")
      // sequence(start, stop, step>0) THROWS on start > stop, so a
      // chromosome shorter than resolution/2 + 1 (chrM at 16.5 kb under
      // a 50 kb grid) would crash the whole job; it gets ZERO bins —
      // the DuckDB twin's generate_series(start > stop) = empty
      // behavior, and explode drops the empty array
      .select(col("chr"),
        explode(when(col("size") - 1 >= lit(resolution / 2),
          sequence(lit(resolution / 2), col("size") - 1,
            lit(resolution)))
          .otherwise(array().cast("array<bigint>"))).as("mid"))
      .select(col("chr"), lit(0L).as("extraField"), col("mid"),
        lit(0L).as("hitCount"), lit(1).as("mappable"))
  }

  /** A24: aggregate raw read pairs (already bin-assigned mids) to contact
    * counts, canonicalizing end order (chr1,mid1) ≤ (chr2,mid2).
    */
  def aggregateContacts(readPairs: DataFrame): DataFrame = {
    val canon = readPairs.select(
      when(col("chr1") < col("chr2") ||
        (col("chr1") === col("chr2") && col("mid1") <= col("mid2")),
        struct(col("chr1"), col("mid1"), col("chr2"), col("mid2")))
        .otherwise(struct(col("chr2").as("chr1"), col("mid2").as("mid1"),
          col("chr1").as("chr2"), col("mid1").as("mid2"))).as("k"))
      .select("k.chr1", "k.mid1", "k.chr2", "k.mid2")
    canon.groupBy("chr1", "mid1", "chr2", "mid2")
      .agg(count(lit(1)).as("contactCount"))
  }
}
