package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.Binom
import graft.hic.Spline

/** ScalaCheck properties for the pure numeric kernels (SURVEY.md §5.2 #4).
  * Spark-free on purpose: thousands of cases per property.
  */
object KernelProps extends Properties("kernels") {
  private val probs = Gen.choose(1e-12, 1.0)
  private val smallN = Gen.choose(1L, 1000000L)

  property("binom_sf in [0,1]") = forAll(Gen.choose(0L, 1000L), smallN,
    probs) { (k, n, p) =>
    val v = Binom.sf(k, n, p)
    v >= 0.0 && v <= 1.0
  }

  property("binom_sf(0)=1 and monotone non-increasing in k") =
    forAll(smallN, probs) { (n, p) =>
      val ks = Seq(0L, 1L, 2L, 5L, n / 2, n, n + 1).distinct.sorted
      val vs = ks.map(Binom.sf(_, n, p))
      vs.head == 1.0 && vs.sliding(2).forall {
        case Seq(a, b) => a >= b + (-1e-12)
        case _ => true
      }
    }

  property("binom_sf monotone non-decreasing in p") =
    forAll(Gen.choose(1L, 50L), Gen.choose(50L, 5000L), probs, probs) {
      (k, n, p1, p2) =>
        val (lo, hi) = if (p1 < p2) (p1, p2) else (p2, p1)
        Binom.sf(k, n, lo) <= Binom.sf(k, n, hi) + 1e-12
    }

  private val weightedSeq = for {
    n <- Gen.choose(1, 60)
    ys <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
    ws <- Gen.listOfN(n, Gen.choose(0.1, 10.0))
  } yield (ys.toArray, ws.toArray)

  property("PAVA output non-increasing") = forAll(weightedSeq) {
    case (ys, ws) =>
      val f = Spline.pavaNonIncreasing(ys, ws)
      f.sliding(2).forall { case Array(a, b) => a >= b - 1e-9; case _ => true }
  }

  property("PAVA preserves weighted mass") = forAll(weightedSeq) {
    case (ys, ws) =>
      val f = Spline.pavaNonIncreasing(ys, ws)
      val m0 = ys.zip(ws).map { case (a, b) => a * b }.sum
      val m1 = f.zip(ws).map { case (a, b) => a * b }.sum
      math.abs(m0 - m1) <= 1e-6 * (1 + math.abs(m0))
  }

  property("PAVA idempotent") = forAll(weightedSeq) { case (ys, ws) =>
    val f = Spline.pavaNonIncreasing(ys, ws)
    val g = Spline.pavaNonIncreasing(f, ws)
    f.zip(g).forall { case (a, b) => math.abs(a - b) <= 1e-9 }
  }

  private val curve = for {
    n <- Gen.choose(2, 20)
    xsRaw <- Gen.listOfN(n, Gen.choose(0.0, 1e6))
    ys <- Gen.listOfN(n, Gen.choose(0.0, 1.0))
  } yield (xsRaw.distinct.sorted.toArray, ys.toArray)

  property("interp stays within knot value envelope") = forAll(curve,
    Gen.choose(-1e5, 1.1e6)) { case ((xs, ys0), x) =>
    Prop.iff[(Array[Double], Array[Double])]((xs, ys0), {
      case _ if xs.length >= 2 =>
        val ys = ys0.take(xs.length)
        val v = Spline.eval(xs, ys, x)
        val (lo, hi) = (ys.min, ys.max)
        Prop(v >= lo - 1e-12 && v <= hi + 1e-12)
      case _ => Prop.passed
    })
  }

  property("BH on sorted p (driver reference): q monotone, ≤1, ≥p/M·rank") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0.0, 1.0))) { ps0 =>
      val ps = ps0.sorted.toArray
      val m = ps.length
      // reference BH: suffix-min of p_i·M/i clamped at 1
      val q = new Array[Double](m)
      var run = Double.MaxValue
      for (i <- m - 1 to 0 by -1) {
        run = math.min(run, ps(i) * m / (i + 1))
        q(i) = math.min(1.0, run)
      }
      q.sliding(2).forall { case Array(a, b) => a <= b + 1e-12; case _ => true } &&
        q.forall(v => v <= 1.0 + 1e-12)
    }

  private val graphEdges: Gen[List[(Long, Long)]] =
    Gen.listOf(for {
      a <- Gen.choose(0L, 24L)
      b <- Gen.choose(0L, 24L) if a != b
    } yield (a, b))

  property("union-find labels = brute-force component minima") =
    forAll(graphEdges) { edges0 =>
      val edges = edges0.toArray
      // brute-force closure: repeatedly propagate the min label over
      // undirected edges until fixpoint
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val label = scala.collection.mutable.Map(verts.map(v => v -> v): _*)
      var changed = true
      while (changed) {
        changed = false
        edges.foreach { case (a, b) =>
          val m = math.min(label(a), label(b))
          if (label(a) != m) { label(a) = m; changed = true }
          if (label(b) != m) { label(b) = m; changed = true }
        }
      }
      llm.Dedup.unionFindLabels(edges).toMap == label.toMap
    }

  property("union-find is edge-order invariant") =
    forAll(graphEdges, Gen.long) { (edges0, seed) =>
      val edges = edges0.toArray
      val shuffled = new scala.util.Random(seed).shuffle(edges0).toArray
      llm.Dedup.unionFindLabels(edges).toMap ==
        llm.Dedup.unionFindLabels(shuffled).toMap
    }

  // k-means centroid re-quantization: integer meanQ must equal the
  // BigDecimal HALF_UP (round half away from zero) of sum/n across the
  // full magnitude range the ×1e7 quantized sums can reach
  property("kmeans meanQ = BigDecimal HALF_UP of sum/n") =
    forAll(Gen.choose(-(1L << 40), 1L << 40), Gen.choose(1L, 1L << 20)) {
      (s, n) =>
        val want = BigDecimal(s)./(BigDecimal(n))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
        llm.Kmeans.meanQ(s, n) == want
    }

  // PCA element quantization: must match the oracle's DuckDB
  // ROUND(v*1000,0) = half away from zero, including floats landing
  // exactly on the .5 boundary (e.g. -0.0625f*1000 = -62.5 → -63,
  // where Java half-up would give -62)
  property("pca quant = BigDecimal HALF_UP of v*1000") =
    forAll(Gen.oneOf(
      Gen.choose(-3.0f, 3.0f),
      Gen.choose(-3000, 3000).map(_ / 1000.0f),
      Gen.choose(-48, 48).map(i => i / 16.0f) // exact .5-boundary floats
    )) { v =>
      val want = BigDecimal(v.toDouble) * BigDecimal(1000)
      llm.Pca.quant(v) ==
        want.setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    }
}
