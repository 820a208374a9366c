package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Differentials for the injected band-join bin rewrite
  * (graft.plans.RangeJoinBinRule): the rewritten join must be
  * row-identical to the plain band join on every edge the binning can
  * mishandle — negative points (arithmetic-shift floor), bin-boundary
  * points, multi-bin spans, degenerate lo=hi, inverted intervals, and
  * nulls on either side — and the marker must degrade to literal true
  * wherever nothing consumes it.
  */
class RangeJoinSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private def points: DataFrame = Seq(
    (1L, Some(-17L)), (2L, Some(-8L)), (3L, Some(-1L)), (4L, Some(0L)),
    (5L, Some(3L)), (6L, Some(7L)), (7L, Some(8L)), (8L, Some(15L)),
    (9L, Some(16L)), (10L, Some(40L)), (11L, None: Option[Long])
  ).toDF("pid", "pt")

  private def intervals: DataFrame = Seq(
    (100L, Some(-10L), Some(5L)), // negative, crosses the bin-0 boundary
    (101L, Some(0L), Some(0L)), // degenerate single point
    (102L, Some(3L), Some(30L)), // span of 4 bins at w=8
    (103L, Some(10L), Some(2L)), // inverted: matches nothing, no throw
    (104L, None: Option[Long], Some(9L)), // null lo
    (105L, Some(1L), None: Option[Long]), // null hi
    (106L, Some(14L), Some(17L)) // narrow span straddling a boundary
  ).toDF("wid", "lo", "hi")

  private def pairs(df: DataFrame): Seq[(Long, Long)] =
    df.select("pid", "wid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("bin rewrite is row-identical to the plain band join on edges") {
    graft.plans.RangeJoin.install(spark)
    val cond = col("pt") >= col("lo") && col("pt") <= col("hi")
    val plain = points.join(intervals, cond)
    val binned = points.join(intervals, cond &&
      graft.plans.RangeJoin.marker(8L, col("pt"), col("lo"), col("hi")))
    val expected = pairs(plain)
    expected should not be empty // fixture sanity
    pairs(binned) shouldBe expected
  }

  test("rewritten join is equi-keyed: merge/hash join even sans broadcast") {
    graft.plans.RangeJoin.install(spark)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val cond = col("pt") >= col("lo") && col("pt") <= col("hi")
      val binned = points.join(intervals, cond &&
        graft.plans.RangeJoin.marker(8L, col("pt"), col("lo"), col("hi")))
      val p = binned.queryExecution.executedPlan.toString
      // no keys → this shape would be BNLJ/cartesian; the bin key makes
      // it a partitioned join
      p should not include "BroadcastNestedLoopJoin"
      p should not include "CartesianProduct"
      (p.contains("SortMergeJoin") ||
        p.contains("ShuffledHashJoin")) shouldBe true
      pairs(binned) shouldBe pairs(points.join(intervals, cond))
    } finally spark.conf.set(key, prev)
  }

  test("marker degrades to literal true where nothing consumes it") {
    // Filter path (rule only rewrites join conditions): every row kept,
    // through both interpreted and codegen evaluation
    val kept = points.filter(graft.plans.RangeJoin.marker(8L,
      col("pt"), col("pt"), col("pt"))).count()
    kept shouldBe points.count()
  }

  test("non-power-of-two bin size declines the rewrite but stays correct") {
    graft.plans.RangeJoin.install(spark)
    val cond = col("pt") >= col("lo") && col("pt") <= col("hi")
    val marked = points.join(intervals, cond &&
      graft.plans.RangeJoin.marker(12L, col("pt"), col("lo"), col("hi")))
    // rule declines (12 not a power of two) → marker left in place,
    // evaluating true: same rows as the plain join
    pairs(marked) shouldBe pairs(points.join(intervals, cond))
    marked.queryExecution.optimizedPlan.toString should
      include("graft_range_bin")
  }
}
