package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.hic.{FitHiCConfig, Pipeline}

/** Differential test of the WHOLE intra pipeline against an independent
  * naive reimplementation (SURVEY.md §5.2 #3): separate code for binning
  * arithmetic, isotonic regression, interpolation, binomial tail, and BH —
  * deliberately NOT reusing graft.hic.Spline / Stats / functions.Binom.
  */
class NaivePipelineSpec extends AnyFunSuite with Matchers with SparkTest {

  // ---- independent reference implementations -------------------------

  /** O(n²) pool-adjacent-violators, antitonic, repeated-scan variant. */
  private def naivePava(ys: Array[Double], ws: Array[Double])
      : Array[Double] = {
    case class Block(var sum: Double, var w: Double, var size: Int) {
      def mean: Double = sum / w
    }
    val blocks = scala.collection.mutable.ArrayBuffer(
      ys.indices.map(i => Block(ys(i) * ws(i), ws(i), 1)): _*)
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (i < blocks.length - 1) {
        if (blocks(i).mean < blocks(i + 1).mean) { // violates non-increasing
          blocks(i).sum += blocks(i + 1).sum
          blocks(i).w += blocks(i + 1).w
          blocks(i).size += blocks(i + 1).size
          blocks.remove(i + 1)
          changed = true
        } else i += 1
      }
    }
    blocks.flatMap(b => Array.fill(b.size)(b.mean)).toArray
  }

  private def naiveInterp(xs: Array[Double], ys: Array[Double],
      x: Double): Double = {
    if (x <= xs.head) return ys.head
    if (x >= xs.last) return ys.last
    var i = 0
    while (xs(i + 1) < x) i += 1
    if (xs(i + 1) == x) ys(i + 1)
    else ys(i) + (x - xs(i)) / (xs(i + 1) - xs(i)) * (ys(i + 1) - ys(i))
  }

  /** Exact binomial tail by pmf summation in log space. */
  private def naiveBinomSf(k: Long, n: Long, p: Double): Double = {
    if (k <= 0) return 1.0
    if (k > n) return 0.0
    if (p <= 0) return 0.0
    if (p >= 1) return 1.0
    var acc = 0.0
    var i = k
    while (i <= n) {
      var logPmf = i * math.log(p) + (n - i) * math.log1p(-p)
      var j = 0L
      while (j < i) { // log C(n, i) accumulated incrementally
        logPmf += math.log((n - j).toDouble) - math.log((i - j).toDouble)
        j += 1
      }
      acc += math.exp(logPmf)
      i += 1
    }
    math.min(acc, 1.0)
  }

  private def naiveBh(ps: Array[Double], m: Long): Array[Double] = {
    val idx = ps.indices.sortBy(i => ps(i))
    val q = new Array[Double](ps.length)
    var run = Double.MaxValue
    for ((orig, rank0) <- idx.zipWithIndex.reverse) {
      run = math.min(run, ps(orig) * m / (rank0 + 1))
      q(orig) = math.min(1.0, run)
    }
    q
  }

  // ---- the differential ---------------------------------------------

  test("Spark pipeline ≡ naive end-to-end reimplementation") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val nLoci = 12
    val mids = (0 until nLoci).map(i => 2500L + 5000L * i)
    val contactList = for {
      i <- 0 until nLoci; j <- i + 1 until nLoci
      if rnd.nextDouble() < 0.8
    } yield ("chr1", mids(i), "chr1", mids(j),
      math.max(1L, (30.0 / (j - i) + rnd.nextInt(4)).toLong))
    val frags = mids.map(m => ("chr1", 0L, m, 10L, 1))
      .toDF("chr", "extraField", "mid", "hitCount", "mappable")
    val contacts = contactList
      .toDF("chr1", "mid1", "chr2", "mid2", "contactCount")
    val nBins = 5
    val cfg = FitHiCConfig(nBins = nBins, passes = 1, distLow = 0,
      distUp = 10000000L)

    val got = Pipeline.intraSignificances(frags, contacts, None, cfg)
      .collect()
      .map(r => (r.getAs[Long]("mid1"), r.getAs[Long]("mid2")) ->
        (r.getAs[Double]("p_value"), r.getAs[Double]("q_value"))).toMap

    // naive: sort by (dist, keys), integer equal-occupancy bins
    val rows = contactList.map { case (_, m1, _, m2, c) =>
      (m1, m2, c, math.abs(m2 - m1))
    }.sortBy { case (m1, m2, _, d) => (d, m1, m2) }
    val total = rows.map(_._3).sum
    var cum = 0L
    val binned = rows.map { case (m1, m2, c, d) =>
      cum += c
      val bin = ((cum - 1) * nBins / total).toInt
      (bin, m1, m2, c, d)
    }
    val binStats = binned.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (bin, rs) =>
        val pc = rs.length
        val avgD = rs.map(_._5).sum.toDouble / pc
        val rawP = rs.map(_._4).sum.toDouble / pc / total
        (bin, avgD, rawP, pc.toDouble)
    }
    val fitted = naivePava(binStats.map(_._3).toArray,
      binStats.map(_._4).toArray)
    val xs = binStats.map(_._2).toArray
    // possible pairs = all grid pairs within range (full grid here)
    val possible = (for {
      i <- 0 until nLoci; j <- i + 1 until nLoci
      d = (mids(j) - mids(i))
      if d >= 0 && d <= 10000000L
    } yield 1).size.toLong
    val ps = rows.map { case (_, _, c, d) =>
      naiveBinomSf(c, total, naiveInterp(xs, fitted, d.toDouble))
    }.toArray
    val qs = naiveBh(ps, possible)

    rows.zipWithIndex.foreach { case ((m1, m2, _, _), i) =>
      val (gp, gq) = got((m1, m2))
      gp shouldBe (ps(i) +- 1e-8)
      gq shouldBe (qs(i) +- 1e-8)
    }
    got.size shouldBe rows.size
  }
}
