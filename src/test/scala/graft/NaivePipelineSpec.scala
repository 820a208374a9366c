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

    // ---- two-pass refinement variant: drop q < 0.05 outliers, re-fit the
    // null on the remainder, re-score ALL pairs (same N), BH again. This
    // exercises the union of pass outputs — the configuration where a
    // task-id-based partition lookup in the BH/rank narrow passes once
    // silently restarted pass-2 ranks per partition (union renumbers
    // child partitions), so it pins exact pass-2 values.
    val got2 = Pipeline.intraSignificances(frags, contacts, None,
        cfg.copy(passes = 2))
      .filter(col("pass") === 2)
      .collect()
      .map(r => (r.getAs[Long]("mid1"), r.getAs[Long]("mid2")) ->
        (r.getAs[Double]("p_value"), r.getAs[Double]("q_value"))).toMap
    val keep2 = rows.zipWithIndex.collect {
      case ((m1, m2, c, d), i) if qs(i) >= 0.05 => (m1, m2, c, d)
    }
    val total2 = keep2.map(_._3).sum // null-source mass of pass 2
    var cum2 = 0L
    val binned2 = keep2.map { case (m1, m2, c, d) =>
      cum2 += c
      (((cum2 - 1) * nBins / total2).toInt, m1, m2, c, d)
    }
    val binStats2 = binned2.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (bin, rs) =>
        (bin, rs.map(_._5).sum.toDouble / rs.length,
          rs.map(_._4).sum.toDouble / rs.length / total, rs.length.toDouble)
    }
    val fitted2 = naivePava(binStats2.map(_._3).toArray,
      binStats2.map(_._4).toArray)
    val xs2 = binStats2.map(_._2).toArray
    val ps2 = rows.map { case (_, _, c, d) =>
      naiveBinomSf(c, total, naiveInterp(xs2, fitted2, d.toDouble))
    }.toArray
    val qs2 = naiveBh(ps2, possible)
    rows.zipWithIndex.foreach { case ((m1, m2, _, _), i) =>
      val (gp, gq) = got2((m1, m2))
      gp shouldBe (ps2(i) +- 1e-8)
      gq shouldBe (qs2(i) +- 1e-8)
    }

    // ---- biased variant: same data, a bias vector exercising every
    // clamp-or-ignore branch (-1 sentinel, out-of-range, missing locus)
    val biasOf: Map[Long, Double] = mids.zipWithIndex.map { case (m, i) =>
      m -> (0.6 + 0.1 * (i % 8))
    }.toMap + (mids(2) -> -1.0) + (mids(5) -> 3.0) - mids(7)
    val biasDf = biasOf.toSeq.map { case (m, b) => ("chr1", m, b) }
      .toDF("chr", "mid", "bias")
    def cb(m: Long): Double = biasOf.get(m) match {
      case Some(b) if b != -1.0 && b >= 0.5 && b <= 2.0 => b
      case _ => 1.0 // sentinel, out-of-range, or missing → factor 1
    }
    val gotB = Pipeline.intraSignificances(frags, contacts, Some(biasDf),
        cfg)
      .collect()
      .map(r => (r.getAs[Long]("mid1"), r.getAs[Long]("mid2")) ->
        (r.getAs[Double]("p_value"), r.getAs[Double]("q_value"))).toMap
    // the null fit ignores biases (bins on dist/count only) — only the
    // per-pair prior is scaled by both end factors
    val psB = rows.map { case (m1, m2, c, d) =>
      naiveBinomSf(c, total,
        naiveInterp(xs, fitted, d.toDouble) * cb(m1) * cb(m2))
    }.toArray
    val qsB = naiveBh(psB, possible)
    rows.zipWithIndex.foreach { case ((m1, m2, _, _), i) =>
      val (gp, gq) = gotB((m1, m2))
      gp shouldBe (psB(i) +- 1e-8)
      gq shouldBe (qsB(i) +- 1e-8)
    }
  }

  test("Spark inter model ≡ naive uniform-prior reimplementation") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val aMids = (0 until 6).map(i => 2500L + 5000L * i)
    val bMids = (0 until 5).map(i => 2500L + 5000L * i)
    val contactList = for {
      ma <- aMids; mb <- bMids
      if rnd.nextDouble() < 0.7
    } yield ("cA", ma, "cB", mb, rnd.nextInt(20).toLong + 1L)
    val contacts = contactList
      .toDF("chr1", "mid1", "chr2", "mid2", "contactCount")
    val frags = (aMids.map(("cA", 0L, _, 10L, 1)) ++
      bMids.map(("cB", 0L, _, 10L, 1)))
      .toDF("chr", "extraField", "mid", "hitCount", "mappable")

    val got = Pipeline.interSignificances(frags, contacts, None,
        FitHiCConfig())
      .collect()
      .map(r => (r.getAs[Long]("mid1"), r.getAs[Long]("mid2")) ->
        (r.getAs[Double]("p_value"), r.getAs[Double]("q_value"))).toMap

    // naive: M = |A|·|B| possible cross pairs, uniform prior 1/M,
    // N = observed inter sum, BH over M
    val m = (aMids.size * bMids.size).toLong
    val n = contactList.map(_._5).sum
    val rows = contactList.map { case (_, m1, _, m2, c) => (m1, m2, c) }
      .sortBy { case (m1, m2, _) => (m1, m2) }
    val ps = rows.map { case (_, _, c) => naiveBinomSf(c, n, 1.0 / m) }
      .toArray
    val qs = naiveBh(ps, m)
    rows.zipWithIndex.foreach { case ((m1, m2, _), i) =>
      val (gp, gq) = got((m1, m2))
      gp shouldBe (ps(i) +- 1e-8)
      gq shouldBe (qs(i) +- 1e-8)
    }
    got.size shouldBe rows.size
  }
}
