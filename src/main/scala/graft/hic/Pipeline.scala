package graft.hic

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Binom

/** The full Fit-Hi-C significance pipeline (SURVEY.md §3.1 Entry 1,
  * A13–A21), recomposed from the operator library as pure
  * DataFrame → DataFrame stages.
  *
  * Statistical contract (published algorithm, Ay/Bailey/Noble 2014;
  * Kaul/Bhattacharyya/Ay 2020):
  *  - null: equal-occupancy bins over intra-in-range contacts by distance;
  *    per-bin mean contact probability, isotonized non-increasing;
  *  - per-pair prior p = curve(dist) · bias1 · bias2;
  *  - p-value = P[X ≥ count], X ~ Binom(N = observedIntraInRangeSum, p);
  *  - BH q with M = possibleIntraInRangeCount (possible, NOT observed);
  *  - refinement pass k ≥ 2 re-estimates the null without the previous
  *    pass's q < threshold outliers, then re-scores ALL pairs;
  *  - inter model: uniform prior 1/possibleInterAllCount, bias-scaled,
  *    N = observedInterAllSum, own BH with M = possibleInterAllCount.
  */
final case class FitHiCConfig(
    nBins: Int = 100,
    passes: Int = 1,
    distLow: Long = 0L,
    distUp: Long = Long.MaxValue / 4,
    mappabilityThr: Long = 1L,
    biasLow: Double = 0.5,
    biasUp: Double = 2.0,
    qThreshold: Double = 0.05)

object Pipeline {
  private val keys = Seq("chr1", "mid1", "chr2", "mid2")

  /** Run `body`; if it throws while a concurrently-launched action is
    * still in flight, wait for that action to settle (success or failure)
    * before rethrowing — otherwise the detached job keeps running while
    * the caller's Caches.drain() unpersists its inputs, and its own
    * failure is silently dropped.
    */
  private def settleOnFailure[A](futs: scala.concurrent.Future[_]*)
      (body: => A): A =
    try body
    catch {
      case t: Throwable =>
        futs.foreach(fut => scala.util.Try(scala.concurrent.Await.ready(fut,
          scala.concurrent.duration.Duration.Inf)))
        throw t
    }

  /** Per-pass null-model diagnostics (A26's data content, sans plot):
    * one row per equal-occupancy bin with its average distance, raw
    * contact probability, and the PAVA-fitted monotone prior.
    */
  final case class PassDiagnostics(pass: Int, binIdx: Int, pairCount: Long,
      sumCount: Long, avgDist: Double, rawProb: Double, splineProb: Double)

  /** Run the intra-chromosomal pipeline; returns one row per tested pair
    * and pass: chr1, mid1, chr2, mid2, contactCount, pass, p_value,
    * q_value. `diagSink`, when given, receives each pass's ≤ nBins
    * diagnostic rows (driver-side — the bins are already collected for
    * the spline fit, so this adds no Spark job).
    */
  def intraSignificances(frags: DataFrame, contacts: DataFrame,
      biases: Option[DataFrame], cfg: FitHiCConfig,
      diagSink: Option[Seq[PassDiagnostics] => Unit] = None,
      endsMappable: Boolean = false): DataFrame =
    intraSignificancesWith(frags, contacts, biases.map(b => () => b), cfg,
      diagSink, endsMappable)

  /** As [[intraSignificances]], taking the bias table as a THUNK: bias
    * construction that runs eager driver work (the KR solve's routing
    * count) executes on a background thread, overlapping the
    * mappable/marginals materialization and the possible-M window job
    * instead of serializing in front of the whole pipeline.
    */
  /** `endsMappable = true` asserts that every contact end appears in
    * `frags` with hitCount ≥ mappabilityThr — true by construction when
    * the caller derives `frags` as the SAME contact set's marginals and
    * thr ≤ 1 (every locus's hitCount is a sum of ≥ 1 contactCounts).
    * Under the assertion the two mappability semi probes are row-level
    * no-ops, so they are skipped outright (and the mappable set is no
    * longer multi-traversed, so it isn't persisted — the possible-M
    * window is its one consumer). A caller asserting this falsely gets
    * silently unfiltered contacts: assert structurally, never guess.
    */
  def intraSignificancesWith(frags: DataFrame, contacts: DataFrame,
      mkBiases: Option[() => DataFrame], cfg: FitHiCConfig,
      diagSink: Option[Seq[PassDiagnostics] => Unit] = None,
      endsMappable: Boolean = false): DataFrame = {
    require(cfg.passes >= 1, s"passes must be >= 1, got ${cfg.passes}")
    // the mappable locus set is traversed three times (two loci broadcast
    // builds + the possible-pair window) and the bias table twice (the
    // per-end broadcast joins) — persist both so an expensive upstream
    // (a marginals groupBy, a KR solve) can never run more than once
    val mapped =
      if (endsMappable) Fragments.mappable(frags, cfg.mappabilityThr)
      else graft.ops.Caches.register(
        Fragments.mappable(frags, cfg.mappabilityThr).persist())
    val filtered =
      if (endsMappable) contacts
      else Contacts.bothEndsMappable(contacts, mapped)
    val classified = Contacts.classify(filtered, cfg.distLow, cfg.distUp)
    val intra = classified.filter(col("cls") === "intraInRange")
    // Concurrent-lineage overlap (same session, per-block get-or-compute
    // makes shared caches safe): launch independent lineages as Futures
    // so their jobs run while pass-1 binning compiles and materializes.
    import scala.concurrent.ExecutionContext.Implicits.global
    // (1) the possible-pair count (BH's M) is an independent lineage —
    // launch it first and collect it after pass-1 binning, so its window
    // job runs CONCURRENTLY with the bias solve and the binning jobs
    // instead of serializing in front of them
    val mFut = scala.concurrent.Future(
      Fragments.possibleIntraInRange(mapped, cfg.distLow, cfg.distUp))
    // (2) bias CONSTRUCTION (a KR solve runs an eager routing job) on a
    // background thread, overlapping the marginals/possible-M job AND
    // the ranged-cache build below: the ranged cache is built BIAS-FREE
    // (equal-occupancy binning reads only dist/count/keys), so pass-1
    // binning materializes it while the per-chromosome solves run —
    // the solve is awaited only at pass-1 SCORING, whose per-end bias
    // lookup is a narrow broadcast overlay that preserves the ranged
    // layout. (r15: previously the bias join was materialized INTO the
    // cache, serializing solve → cache-build → binning.)
    val constructFut: scala.concurrent.Future[DataFrame] = mkBiases match {
      case Some(mk) => scala.concurrent.Future(mk())
      case None => scala.concurrent.Future.successful(null)
    }
    var biasMatFut: scala.concurrent.Future[Long] =
      scala.concurrent.Future.successful(0L)

    // ONE dist-ranged cache is the only materialization of the pair set:
    // every pass's equal-occupancy binning re-bins a FILTERED view of
    // this layout, and per-pass scoring reads the same cache through the
    // bias overlay (bhQ re-partitions on p_value regardless, so scoring
    // gains nothing from a second, unranged copy — which round 7 still
    // paid for)
    // the range exchange SAMPLES its child before shuffling — persist the
    // source so the filter/classify lineage runs once, not twice;
    // released as soon as pass 1 has materialized the ranged cache
    // (same pattern as GlobalOrder's src persist)
    // Caches-registered so drain() reclaims it if collectBins throws
    // before the eager pass-1 unpersist (double-unpersist is a no-op)
    val src = graft.ops.Caches.register(intra.persist())
    val spark = intra.sparkSession
    val distOrder = col("dist") +: keys.map(col)
    val rangedPairs = graft.ops.Caches.register(src
      .repartitionByRange(spark.sessionState.conf.numShufflePartitions,
        distOrder: _*)
      .sortWithinPartitions(distOrder: _*)
      .persist())
    // scoring-side view: per-end bias factors as a broadcast probe on
    // top of the cached ranged layout (bias table = O(loci), broadcast
    // class at any corpus scale); identity biases when no solver given
    var scoringView: DataFrame = null

    // N = observedIntraInRangeSum falls out of the pass-1 bin stats
    // (Σ sumCount over bins) — no separate full-table aggregate job
    var n = 0L
    var m = -1L
    var nullSource = rangedPairs // pass-k null = pairs minus outliers
    var layoutPreserved = true
    var result: DataFrame = null
    for (pass <- 1 to cfg.passes) {
      // pass-1 binning is the only action between the concurrent-lineage
      // launches and their Awaits: if it throws, settle all three
      // before unwinding
      val bins = settleOnFailure(mFut, constructFut, biasMatFut)(
        Binning.collectBins(nullSource, cfg.nBins, keys,
          assumeRanged = layoutPreserved))
      if (pass == 1) {
        n = bins.map(_.getAs[Long]("sumCount")).sum
        // bias solve ran concurrently with the binning jobs above — its
        // result is only needed now, for the scoring overlay
        scoringView = settleOnFailure(mFut)(scala.concurrent.Await.result(
            constructFut, scala.concurrent.duration.Duration.Inf)) match {
          case null => rangedPairs.withColumn("bias1", lit(1.0))
            .withColumn("bias2", lit(1.0))
          case b =>
            val bp = graft.ops.Caches.register(b.persist())
            biasMatFut = scala.concurrent.Future(bp.count())
            Contacts.withBiases(rangedPairs, bp, cfg.biasLow, cfg.biasUp)
        }
        // settle the just-launched bias materialization if THIS await
        // throws — the one await in the chain that previously unwound
        // with biasMatFut still in flight (drain would unpersist bp
        // under the detached count)
        m = settleOnFailure(biasMatFut)(scala.concurrent.Await.result(
          mFut, scala.concurrent.duration.Duration.Inf))
        // awaited so a failure on the eager-materialization thread can
        // never be silently dropped
        scala.concurrent.Await.result(biasMatFut,
          scala.concurrent.duration.Duration.Inf)
        src.unpersist() // pass-1 binning materialized the ranged cache
      }
      require(n > 0, "no intra-in-range contacts after filtering")
      diagSink.foreach { sink =>
        val (xs, raw, fitted) = Spline.fitFromBins(bins, n)
        sink(bins.indices.map(i => PassDiagnostics(pass,
          bins(i).getAs[Int]("binIdx"), bins(i).getAs[Long]("pairCount"),
          bins(i).getAs[Long]("sumCount"), xs(i), raw(i), fitted(i))))
      }
      val scored = scoreFromBins(scoringView, bins, n, m, cfg)
        .withColumn("pass", lit(pass))
      result = if (result == null) scored else result.unionByName(scored)
      if (pass < cfg.passes) {
        val outliers = scored.filter(col("q_value") < cfg.qThreshold)
          .select(keys.map(col): _*)
        // a refinement outlier set is normally a tiny fraction of the
        // pairs: broadcast the anti-join so the dist-ranged layout
        // survives (a narrow probe) and the next pass skips the exchange.
        // The count is a narrow scan of the (cached) BH output; above the
        // cap (1M keys ≈ tens of MB — well inside driver/executor
        // broadcast budgets), fall back to the scale-safe shuffle
        // anti-join + re-range.
        if (outliers.count() <= 1000000L) {
          nullSource = rangedPairs.join(broadcast(outliers), keys,
            "left_anti")
          layoutPreserved = true
        } else {
          nullSource = rangedPairs.join(outliers, keys, "left_anti")
          layoutPreserved = false
        }
      }
    }
    result
  }

  /** Score every row of `pairs` against the null fitted from `bins`
    * (equal-occupancy rows of the CURRENT pass's null source; `n` is the
    * pass-1 observed sum — the binomial N is fixed across passes).
    */
  private def scoreFromBins(pairs: DataFrame,
      bins: Array[org.apache.spark.sql.Row], n: Long, m: Long,
      cfg: FitHiCConfig): DataFrame = {
    val (xs, _, fitted) = Spline.fitFromBins(bins, n)
    // codegen'd curve lookup (graft.functions.SplineInterp): the prior
    // interpolation + binom_sf stay in ONE whole-stage-codegen span —
    // no UDF dispatch in the corpus-sized scoring pass
    val curve = graft.functions.SplineInterp.curve(xs, fitted) _
    graft.functions.BinomSf.register(pairs.sparkSession)
    pairs
      .withColumn("prior",
        curve(col("dist").cast("double")) * col("bias1") * col("bias2"))
      .withColumn("p_value",
        expr(s"binom_sf(contactCount, ${n}L, prior)"))
      .transform(df => Stats.bhQ(df, "p_value",
        Seq("chr1", "mid1", "chr2", "mid2"), "q_value", Some(m)))
      .select((keys.map(col) :+ col("contactCount") :+ col("p_value") :+
        col("q_value")): _*)
  }

  /** Inter-chromosomal model (A21): uniform bias-scaled prior.
    * `endsMappable` as on [[intraSignificancesWith]].
    */
  def interSignificances(frags: DataFrame, contacts: DataFrame,
      biases: Option[DataFrame], cfg: FitHiCConfig,
      endsMappable: Boolean = false): DataFrame = {
    // traversed three times (two semi-join broadcast builds + the
    // possible-M closed form) — persist so an expensive upstream (a
    // marginals groupBy) runs once, same as the intra path
    val mapped =
      if (endsMappable) Fragments.mappable(frags, cfg.mappabilityThr)
      else graft.ops.Caches.register(
        Fragments.mappable(frags, cfg.mappabilityThr).persist())
    val filtered =
      if (endsMappable) contacts
      else Contacts.bothEndsMappable(contacts, mapped)
    val inter = Contacts.classify(filtered, cfg.distLow, cfg.distUp)
      .filter(col("cls") === "interAll")
    // cache: the classify + double bias-join plan is read twice (N
    // aggregate + scoring) — same pattern as the intra path's pairs cache
    val withBias = graft.ops.Caches.register((biases match {
      case Some(b) => Contacts.withBiases(inter, b, cfg.biasLow, cfg.biasUp)
      case None => inter.withColumn("bias1", lit(1.0))
        .withColumn("bias2", lit(1.0))
    }).persist())
    // N and M are independent lineages — overlap their jobs (same pattern
    // as the intra path's possible-pair future)
    import scala.concurrent.ExecutionContext.Implicits.global
    val mFut = scala.concurrent.Future(Fragments.possibleInterAll(mapped))
    val n = settleOnFailure(mFut)(
      withBias.agg(sum(col("contactCount"))).first() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      })
    val m = scala.concurrent.Await.result(mFut,
      scala.concurrent.duration.Duration.Inf)
    if (n == 0) return withBias.select((keys.map(col) :+
      col("contactCount") :+ lit(1.0).as("p_value") :+
      lit(1.0).as("q_value")): _*)
    graft.functions.BinomSf.register(withBias.sparkSession)
    withBias
      .withColumn("prior", lit(1.0) / m * col("bias1") * col("bias2"))
      .withColumn("p_value",
        expr(s"binom_sf(contactCount, ${n}L, prior)"))
      .transform(df => Stats.bhQ(df, "p_value",
        Seq("chr1", "mid1", "chr2", "mid2"), "q_value", Some(m)))
      .select((keys.map(col) :+ col("contactCount") :+ col("p_value") :+
        col("q_value")): _*)
  }
}
