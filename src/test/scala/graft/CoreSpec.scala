package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.Binom
import graft.hic.{Binning, Fragments, Spline, Stats}
import graft.ops.GlobalOrder

class BinomSpec extends AnyFunSuite with Matchers {
  test("sf edge cases") {
    Binom.sf(0, 10, 0.5) shouldBe 1.0
    Binom.sf(-1, 10, 0.5) shouldBe 1.0
    Binom.sf(11, 10, 0.5) shouldBe 0.0
    Binom.sf(5, 10, 0.0) shouldBe 0.0
    Binom.sf(5, 10, 1.0) shouldBe 1.0
  }
  test("sf golden value: P[X>=2], X~Binom(10, 0.1)") {
    // 1 - 0.9^10 - 10*0.1*0.9^9 (hand-computed)
    Binom.sf(2, 10, 0.1) shouldBe (0.2639010709 +- 1e-9)
  }
  test("sf matches direct pmf summation for small n") {
    def pmfSum(k: Int, n: Int, p: Double): Double =
      (k to n).map { i =>
        val c = (1 to i).foldLeft(1.0)((a, j) => a * (n - j + 1.0) / j)
        c * math.pow(p, i.toDouble) * math.pow(1 - p, (n - i).toDouble)
      }.sum
    for (k <- 1 to 19; p <- Seq(0.01, 0.3, 0.7))
      Binom.sf(k.toLong, 20, p) shouldBe (pmfSum(k, 20, p) +- 1e-9)
  }
  test("sf monotone non-increasing in k, bounded in [0,1]") {
    val vals = (0 to 50).map(k => Binom.sf(k.toLong, 50, 0.2))
    vals.foreach { v => v should be >= 0.0; v should be <= 1.0 }
    vals.sliding(2).foreach { case Seq(a, b) => a should be >= b }
  }
  test("sf stable for tiny p, huge n") {
    val v = Binom.sf(5, 2000000000L, 1e-12)
    v should be >= 0.0
    v should be <= 1.0
    // mean ~2e-3 → P[X>=5] tiny but positive
    v should be > 0.0
    v should be < 1e-10
  }
}

class SplineSpec extends AnyFunSuite with Matchers {
  test("PAVA output is non-increasing and preserves weighted mean") {
    val y = Array(5.0, 6.0, 4.0, 4.5, 3.0, 3.5, 1.0)
    val w = Array(1.0, 2.0, 1.0, 1.0, 3.0, 1.0, 1.0)
    val f = Spline.pavaNonIncreasing(y, w)
    f.sliding(2).foreach { case Array(a, b) => a should be >= b }
    val m0 = y.zip(w).map { case (a, b) => a * b }.sum
    val m1 = f.zip(w).map { case (a, b) => a * b }.sum
    m1 shouldBe (m0 +- 1e-9)
  }
  test("PAVA is identity on already non-increasing input") {
    val y = Array(9.0, 7.0, 7.0, 2.0)
    Spline.pavaNonIncreasing(y, Array.fill(4)(1.0)) shouldBe y
  }
  test("piecewise-linear eval: knots, interior, extrapolation") {
    val xs = Array(0.0, 10.0, 20.0)
    val ys = Array(4.0, 2.0, 1.0)
    Spline.eval(xs, ys, 0.0) shouldBe 4.0
    Spline.eval(xs, ys, 10.0) shouldBe 2.0
    Spline.eval(xs, ys, 5.0) shouldBe 3.0
    Spline.eval(xs, ys, 15.0) shouldBe 1.5
    Spline.eval(xs, ys, -5.0) shouldBe 4.0 // constant extrapolation
    Spline.eval(xs, ys, 99.0) shouldBe 1.0
  }
}

class GlobalOrderSpec extends AnyFunSuite with Matchers with SparkTest {
  test("rank and cumsum match single-partition window reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 500).map(i => (i.toLong, rnd.nextInt(50).toLong,
      rnd.nextInt(10).toLong)).toDF("id", "v", "w")
    val got = GlobalOrder.rankAndCumsum(df, Seq(col("v"), col("id")), "rk",
        cum = Some((col("w"), "cum")))
      .select("id", "rk", "cum")
    val wRef = Window.orderBy("v", "id")
    val ref = df.select(col("id"),
      row_number().over(wRef).cast("long").as("rk"),
      sum("w").over(wRef.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)).as("cum"))
    got.except(ref).count() shouldBe 0
    ref.except(got).count() shouldBe 0
  }
}

class BhSpec extends AnyFunSuite with Matchers with SparkTest {
  test("scalable BH equals naive single-window BH (differential check)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1 to 400).map(i =>
      (i.toLong, math.rint(rnd.nextDouble() * 20) / 20)).toDF("id", "p")
    val got = Stats.bhQ(df, "p", Seq("id"), "q").select("id", "q")
    val w = Window.orderBy("p", "id")
    val wDesc = Window.orderBy(col("rk").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = df.count()
    val ref = df.withColumn("rk", row_number().over(w))
      .withColumn("q", least(lit(1.0),
        min(col("p") * m / col("rk")).over(wDesc)))
      .select("id", "q")
    got.except(ref).count() shouldBe 0
    ref.except(got).count() shouldBe 0
  }
  test("chunked backward walk (chunkRows ≪ partition) is bit-identical") {
    // the final pass buffers one CHUNK, not one partition — force many
    // chunks per partition and require exact equality with the default
    // (single-chunk-per-partition at this size) configuration
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val df = (1 to 1000).map(i => (i.toLong, rnd.nextDouble()))
      .toDF("id", "p")
    val tiny = Stats.bhQ(df, "p", Seq("id"), "q", chunkRows = 7)
      .select("id", "q")
    val dflt = Stats.bhQ(df, "p", Seq("id"), "q").select("id", "q")
    tiny.except(dflt).count() shouldBe 0
    dflt.except(tiny).count() shouldBe 0
  }
  test("BH with M=1 gives q = min(1, p)") {
    import spark.implicits._
    val df = Seq((1L, 0.4)).toDF("id", "p")
    val q = Stats.bhQ(df, "p", Seq("id"), "q", Some(1L))
      .select("q").first().getDouble(0)
    q shouldBe 0.4
  }
  test("assumeRanged over a filtered pass-1 frame ≡ the exchanged path " +
      "(the refine_pass2 shape)") {
    // pass 2 of the BH refinement filters pass 1's OUTPUT (a narrow op
    // over the ranged layout) and re-ranks with assumeRanged = true —
    // must be row-identical to handing the filtered frame back through
    // the full repartitionByRange path
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val df = (1 to 800).map(i => (i.toLong, rnd.nextDouble()))
      .toDF("id", "p")
    val bh1 = Stats.bhQ(df, "p", Seq("id"), "q1")
    val kept = bh1.filter(col("q1") >= 0.3).drop("q1")
    val fast = Stats.bhQ(kept, "p", Seq("id"), "q", assumeRanged = true)
      .select("id", "q")
    val slow = Stats.bhQ(kept, "p", Seq("id"), "q").select("id", "q")
    fast.except(slow).count() shouldBe 0
    slow.except(fast).count() shouldBe 0
  }
  test("BH q-values survive partition-renumbering consumers (union)") {
    // regression: the final narrow pass once read the STAGE task id for
    // its per-partition offset lookup; a union consumer offsets the
    // second child's task ids by the first child's partition count, which
    // restarted ranks per partition. The per-RDD partition index is
    // immune.
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val df = (1 to 900).map(i => (i.toLong, rnd.nextDouble()))
      .toDF("id", "p")
    val bh = Stats.bhQ(df, "p", Seq("id"), "q")
    val direct = bh.select("id", "q").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val other = (1 to 500).map(i => (-i.toLong, 0.5)).toDF("id", "p")
      .withColumn("q", lit(2.0))
    val viaUnion = other.unionByName(bh.select("id", "p", "q"))
      .filter(col("id") > 0)
      .select("id", "q").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    viaUnion shouldBe direct
  }
}

class BinningSpec extends AnyFunSuite with Matchers with SparkTest {
  test("equal-occupancy bins partition rows and conserve mass") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val contacts = (1 to 1000).map { i =>
      ("chrT", i.toLong, i.toLong + 1, rnd.nextInt(50).toLong + 1,
        rnd.nextInt(200000).toLong)
    }.toDF("chr", "mid1", "mid2", "contactCount", "dist")
    val bins = Binning.equalOccupancy(contacts, 10,
      Seq("chr", "mid1", "mid2")).collect()
    bins.map(_.getAs[Long]("pairCount")).sum shouldBe 1000L
    val total = contacts.agg(sum("contactCount")).first().getLong(0)
    bins.map(_.getAs[Long]("sumCount")).sum shouldBe total
    val target = total / 10.0
    // each bin holds the target mass ± the max single-pair count (50)
    bins.foreach { b =>
      b.getAs[Long]("sumCount").toDouble shouldBe (target +- (50 + target * 0.1))
    }
    // bins ordered by distance: maxDist non-decreasing with binIdx
    val sorted = bins.sortBy(_.getAs[Int]("binIdx"))
    sorted.sliding(2).foreach { case Array(a, b) =>
      a.getAs[Long]("maxDist") should be <= b.getAs[Long]("minDist")
    }
  }
}

class SkewSpec extends AnyFunSuite with Matchers with SparkTest {
  test("saltedJoin equals plain join and spreads the hot key") {
    import spark.implicits._
    // hot key: 90% of left rows share key 1
    val left = ((1 to 900).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, i.toLong)))
      .toDF("k", "payload")
    val right = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = left.join(right, "k")
    val salted = graft.ops.Skew.saltedJoin(left, right, "k", 8,
      Seq(col("payload")))
    salted.count() shouldBe plain.count()
    salted.select("k", "payload", "name")
      .except(plain.select("k", "payload", "name")).count() shouldBe 0
    plain.select("k", "payload", "name")
      .except(salted.select("k", "payload", "name")).count() shouldBe 0
    // the hot key's rows actually land in multiple salt buckets
    val buckets = left.withColumn("__salt",
        pmod(xxhash64(col("payload")), lit(8L)))
      .filter(col("k") === 1L).select("__salt").distinct().count()
    buckets should be > 1L
  }
}

class FragmentsSpec extends AnyFunSuite with Matchers with SparkTest {
  test("possibleIntraInRange matches brute force") {
    import spark.implicits._
    val frags = Seq(
      ("c1", 2500L), ("c1", 7500L), ("c1", 12500L), ("c1", 22500L),
      ("c2", 2500L), ("c2", 7500L), ("c2", 37500L))
      .toDF("chr", "mid").withColumn("hitCount", lit(5L))
    def brute(lo: Long, up: Long): Long = {
      val byChr = Seq(
        Seq(2500L, 7500L, 12500L, 22500L), Seq(2500L, 7500L, 37500L))
      byChr.map { mids =>
        mids.combinations(2).count { case Seq(a, b) =>
          val d = math.abs(b - a); d >= lo && d <= up
        }
      }.sum.toLong
    }
    for ((lo, up) <- Seq((0L, 100000L), (5000L, 10000L), (10000L, 20000L)))
      Fragments.possibleIntraInRange(frags, lo, up) shouldBe brute(lo, up)
  }
  test("possibleInterAll matches closed form") {
    import spark.implicits._
    val frags = Seq(("c1", 1L), ("c1", 2L), ("c2", 3L), ("c3", 4L),
      ("c3", 5L), ("c3", 6L)).toDF("chr", "mid")
    // 2*1 + 2*3 + 1*3 = 11
    Fragments.possibleInterAll(frags) shouldBe 11L
  }
  test("fixedSizeFragments lays a resolution grid") {
    val df = Fragments.fixedSizeFragments(spark,
      Seq(("c1", 20000L), ("c2", 7000L)), 5000L)
    import spark.implicits._
    df.select("chr", "mid").as[(String, Long)].collect().toSet shouldBe Set(
      ("c1", 2500L), ("c1", 7500L), ("c1", 12500L), ("c1", 17500L),
      ("c2", 2500L))
  }

  test("fixedSizeFragments: a chromosome shorter than resolution/2 " +
      "yields ZERO bins, not a sequence-boundary crash") {
    // chrM (16.5 kb) under a 50 kb grid is a routine real input:
    // sequence(25000, 16570, 50000) throws on start > stop, so the
    // guard must drop the chromosome instead of killing the job —
    // matching the DuckDB twin's empty generate_series
    val df = Fragments.fixedSizeFragments(spark,
      Seq(("chr1", 120000L), ("chrM", 16571L)), 50000L)
    import spark.implicits._
    df.select("chr", "mid").as[(String, Long)].collect().toSet shouldBe
      Set(("chr1", 25000L), ("chr1", 75000L))
  }
}

class TsvSpec extends AnyFunSuite with Matchers with SparkTest {
  test("gzip TSV write/read round-trip preserves fragments exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tsvspec").toString
    val frags = Seq(("chr1", 0L, 2500L, 15L, 1), ("chr2", 0L, 7500L, 3L, 0))
      .toDF("chr", "extraField", "mid", "hitCount", "mappable")
    graft.io.Tsv.write(frags, s"$dir/frags",
      graft.io.Tsv.fragmentSchema.fieldNames)
    // output is actually gzip-compressed
    val files = new java.io.File(s"$dir/frags").listFiles()
      .filter(_.getName.endsWith(".csv.gz"))
    files should not be empty
    val back = graft.io.Tsv.readFragments(spark, s"$dir/frags")
    back.as[(String, Long, Long, Long, Int)].collect().toSet shouldBe
      frags.as[(String, Long, Long, Long, Int)].collect().toSet
  }
}
