package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-9 additions: contact-matrix analytics (hic.Matrix) and event
  * funnel/retention (ops.EventAnalytics). Matrix queries are checked
  * differentially against an in-memory brute force over the same sf0.001
  * contacts view; the analytics queries against hand-derivable invariants.
  */
class AnalyticsSpec extends AnyFunSuite with Matchers with SparkTest {
  private val dir = "/root/testdata/sf0.001"

  // (chr, lo, hi, count) of the canonicalized contacts view
  private lazy val pairs: Seq[(String, Long, Long, Long)] =
    hic.ContactsView(spark, dir)
      .select(col("chr"), least(col("mid1"), col("mid2")).as("lo"),
        greatest(col("mid1"), col("mid2")).as("hi"), col("contactCount"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("insulation equals brute-force boundary walk") {
    val W = hic.Matrix.W
    val B = hic.Matrix.Bin
    val brute = pairs
      .filter { case (_, lo, hi, _) => hi - lo >= 2 * B && hi - lo < 2 * W }
      .flatMap { case (chr, lo, hi, n) =>
        (math.max(lo + B, hi - W) to math.min(hi - B, lo + W) by B)
          .map(b => ((chr, b), (n, 1L)))
      }
      .groupBy(_._1)
      .view.mapValues(vs =>
        (vs.map(_._2._1).sum, vs.map(_._2._2).sum)).toMap
    val got = Registry.all("q_hic_insulation").fn(spark, dir).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    got shouldBe brute
  }

  test("directionality equals brute-force two-leg sums; di in [-1, 1]") {
    val W = hic.Matrix.W
    val inWin = pairs.filter { case (_, lo, hi, _) =>
      lo < hi && hi - lo <= W }
    val a = inWin.groupBy { case (chr, _, hi, _) => (chr, hi) }
      .view.mapValues(_.map(_._4).sum).toMap // upstream legs
    val b = inWin.groupBy { case (chr, lo, _, _) => (chr, lo) }
      .view.mapValues(_.map(_._4).sum).toMap // downstream legs
    val bins = (a.keySet ++ b.keySet)
    val rows = Registry.all("q_hic_directionality").fn(spark, dir).collect()
    rows.map(r => (r.getString(0), r.getLong(1))).toSet shouldBe bins
    rows.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      r.getLong(2) shouldBe a.getOrElse(key, 0L)
      r.getLong(3) shouldBe b.getOrElse(key, 0L)
      r.getDouble(4) should (be >= -1.0 and be <= 1.0)
    }
  }

  test("obs/exp averages to 1 within every (chr, dist) stratum") {
    val oe = Registry.all("q_hic_obs_exp").fn(spark, dir)
    val strata = oe.groupBy("chr", "dist")
      .agg(avg(col("oe")).as("mean_oe"), count(lit(1)).as("n"),
        first(col("npairs")).as("npairs"))
      .collect()
    strata.length should be > 0
    strata.foreach { r =>
      r.getDouble(2) shouldBe 1.0 +- 1e-6
      r.getLong(3) shouldBe r.getLong(4) // every pair of the stratum kept
    }
  }

  test("funnel stages are monotone and stage 1 equals distinct viewers") {
    val rows = Registry.all("q_events_funnel").fn(spark, dir).collect()
    rows.map(_.getInt(0)).toSeq shouldBe Seq(1, 2, 3)
    val n = rows.map(_.getLong(2))
    n(0) should be >= n(1)
    n(1) should be >= n(2)
    val viewers = Tables(spark, dir, "events")
      .filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    n(0) shouldBe viewers
  }

  test("retention: offset-0 cell equals cohort size; offsets non-negative") {
    val ret = Registry.all("q_events_retention").fn(spark, dir)
    val rows = ret.collect()
    rows.foreach(_.getLong(1) should be >= 0L)
    val day0 = rows.filter(_.getLong(1) == 0L)
      .map(r => (r.getDate(0), r.getLong(2))).toMap
    val cohorts = Tables(spark, dir, "events")
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("cohort_day"))
      .groupBy("cohort_day").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getDate(0), r.getLong(1))).toMap
    day0 shouldBe cohorts
  }

  test("zipf: ranks dense, counts non-increasing, cum_share to ≤ 1") {
    val rows = Registry.all("q_text_zipf").fn(spark, dir).collect()
    rows.map(_.getInt(0)).toSeq shouldBe (1 to rows.length)
    rows.map(_.getLong(2)).toSeq.sliding(2).foreach {
      case Seq(x, y) => x should be >= y
      case _ => ()
    }
    rows.map(_.getDouble(3)).toSeq.sliding(2).foreach {
      case Seq(x, y) => x should be <= y
      case _ => ()
    }
    rows.last.getDouble(3) should be <= 1.0
  }

  test("histogram: buckets bound their min/max and counts total out") {
    val rows = Registry.all("q_agg_histogram").fn(spark, dir).collect()
    val total = Tables(spark, dir, "lineitem").count()
    rows.map(_.getLong(1)).sum shouldBe total
    rows.foreach { r =>
      val (bucket, min, max) = (r.getLong(0), r.getLong(2), r.getLong(3))
      min should be >= bucket * 100000
      max should be < (bucket + 1) * 100000
      min should be <= max
    }
  }
}
