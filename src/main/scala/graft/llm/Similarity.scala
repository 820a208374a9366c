package graft.llm

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (driver north star).
  *
  * Exact all-pairs cosine runs as a **block-pair join**: vec_ids are hashed
  * into B blocks, every unordered block pair (i ≤ j) becomes one group, and
  * each group computes its pairs with primitive-array integer dot products.
  * Nothing is ever collected to the driver and no executor materializes
  * more than two blocks (≈ 2·n/B vectors), so the kernel survives inputs
  * that are orders of magnitude past driver memory; B grows with n (see
  * [[numBlocks]]) to keep per-task memory flat. The O(n²) compare itself is
  * inherent to *exact* all-pairs — [[annTop3]] is the approximate scale
  * path when that budget is unacceptable.
  *
  * Brute-force exact cosine via Catalyst lambdas lives in [[LlmQueries]]
  * (q_sim_knn_label, oracle-checked).
  */
object Similarity {
  /** ×1e7 quantization of one float — must stay bit-identical to the SQL
    * `CAST(ROUND(CAST(x AS DOUBLE)*1e7, 0) AS BIGINT)` (DuckDB oracle).
    * Math.floor(v+0.5) == ROUND half-up for the positive-and-negative
    * magnitudes here (|x| ≤ 1, never exactly .5 after ×1e7 of a float).
    */
  @inline private def quant(x: Float): Long = {
    // round half away from zero — what both Spark's ROUND(x, 0) and
    // DuckDB's round produce at scale 0
    val v = x.toDouble * 1e7
    if (v >= 0) Math.floor(v + 0.5).toLong else Math.ceil(v - 0.5).toLong
  }

  /** Quantized vector: ×1e7 longs plus the precomputed squared norm.
    * (Not `private`: Catalyst's generated deserializer must reach the
    * accessors, and janino rejects Scala-private nested classes.)
    */
  case class QVec(id: Long, label: Int, q: Array[Long], n2: Long)

  private def quantVec(id: Long, label: Int, emb: Seq[Float]): QVec = {
    val q = new Array[Long](emb.length)
    var n2 = 0L
    var i = 0
    val it = emb.iterator
    while (it.hasNext) { q(i) = quant(it.next()); n2 += q(i) * q(i); i += 1 }
    QVec(id, label, q, n2)
  }

  /** Exact integer dot → one double division; identical math to the oracle. */
  @inline private def cosine(a: QVec, b: QVec): Double = {
    var dot = 0L
    var i = 0
    while (i < a.q.length) { dot += a.q(i) * b.q(i); i += 1 }
    dot.toDouble / math.sqrt(a.n2.toDouble * b.n2.toDouble)
  }

  /** Block count for the pair-block kernel: enough block pairs
    * (B(B+1)/2) to feed every core, and blocks capped at ≈8k vectors so a
    * group (two blocks) stays comfortably inside one task's memory as n
    * grows — B scales linearly with n, task memory stays flat.
    */
  private def numBlocks(n: Long, parallelism: Int): Int =
    math.max(math.ceil(math.sqrt(2.0 * parallelism)).toInt,
      math.ceil(n / 8192.0).toInt).max(2)

  /** Every unordered cosine pair, exactly once, computed group-local:
    * each vector is shuffled to its B block-pair groups, and `reduce`
    * turns one group's pair stream into the (bounded) rows that leave the
    * task — a top-k heap or a threshold filter — so the full pair set is
    * never materialized.
    */
  private def blockPairs(embeddings: DataFrame)(
      reduce: Iterator[(Long, Long, Double)] => Iterator[(Long, Long, Double)])
      : DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // ONE corpus scan: the cached quantized dataset feeds both the block
    // count and the kernel (counting the raw input plan separately would
    // re-execute an arbitrary upstream lineage twice). Zero-norm vectors
    // (all elements under the quantization threshold) are excluded: their
    // cosine is 0/0 = NaN, which the local top-k heap would evict as WORST
    // while the final desc sort ranks NaN as BEST — an undefined
    // similarity has no place in either ranking.
    val typed = quantized(embeddings).filter(_._4 > 0L)
    val b = numBlocks(typed.count(),
      spark.sparkContext.defaultParallelism)
    typed
      .map { case (id, label, q, n2) => QVec(id, label, q, n2) }
      .flatMap { v =>
        // floorMod: a JVM % on a negative id would route the vector to a
        // negative block key its partners never emit to — every pair
        // touching it would silently vanish
        val blk = math.floorMod(v.id, b.toLong).toInt
        (0 until b).iterator.map(o =>
          (math.min(blk, o), math.max(blk, o), v))
      }
      .groupByKey(t => (t._1, t._2))
      .flatMapGroups { (key: (Int, Int), it: Iterator[(Int, Int, QVec)]) =>
        val (i, j) = key
        val vs = it.map(_._3).toArray
        val stream =
          if (i == j) // intra-block: (a, b) with a.id < b.id, each once
            for {
              ai <- vs.indices.iterator
              bi <- (ai + 1 until vs.length).iterator
            } yield {
              val (a, c) = if (vs(ai).id < vs(bi).id) (vs(ai), vs(bi))
                else (vs(bi), vs(ai))
              (a.id, c.id, cosine(a, c))
            }
          else { // cross-block: every (left, right), oriented by id
            val left = vs.filter(v => math.floorMod(v.id, b.toLong) == i)
            val right = vs.filter(v => math.floorMod(v.id, b.toLong) == j)
            for {
              a <- left.iterator
              c <- right.iterator
            } yield if (a.id < c.id) (a.id, c.id, cosine(a, c))
              else (c.id, a.id, cosine(c, a))
          }
        reduce(stream)
      }
      .toDF("va", "vb", "cos")
  }

  /** Exact brute-force top-K cosine pairs, distributed: each block-pair
    * group keeps a bounded local top-K (only K rows per group leave the
    * task), then a global TakeOrdered merges.
    *
    * Ranking happens on the 6-dp-ROUNDED cosine (ties → (va, vb)): the
    * oracle's `ORDER BY cos` resolves to the rounded output alias, so the
    * kernel must select and order by the same rounded value or a boundary
    * pair within 1e-6 of rank K would diverge.
    */
  def cosineTopK(embeddings: DataFrame, k: Int): DataFrame = {
    val pairs = blockPairs(embeddings) { stream =>
      // heap max (= head) is the WORST kept pair under this ordering, so
      // once the heap is full the common case is one compare against the
      // head — not an O(log k) enqueue+dequeue plus tuple garbage for
      // every one of the O(n²/B²) pairs that don't make the cut
      val ord: Ordering[(Double, Long, Long)] =
        Ordering.by(t => (-t._1, t._2, t._3))
      val topk = scala.collection.mutable.PriorityQueue
        .empty[(Double, Long, Long)](ord)
      stream.foreach { case (va, vb, cos) =>
        val cosR = math.floor(cos * 1e6 + 0.5) / 1e6 // == Cols.fround 6
        if (topk.size < k) topk.enqueue((cosR, va, vb))
        else {
          val cand = (cosR, va, vb)
          if (ord.lt(cand, topk.head)) { topk.dequeue(); topk.enqueue(cand) }
        }
      }
      topk.iterator.map { case (cos, va, vb) => (va, vb, cos) }
    }
    pairs.orderBy(desc("cos"), asc("va"), asc("vb")).limit(k)
  }

  /** All pairs with cosine ≥ threshold — embedding-based near-duplicate
    * detection. Same block-pair kernel as [[cosineTopK]]; output size is
    * bounded by the threshold, not n².
    */
  def cosineAbove(embeddings: DataFrame, threshold: Double): DataFrame =
    blockPairs(embeddings)(_.filter(_._3 >= threshold))

  /** Deterministic IVF coarse quantizer (Lloyd k-means) over the ×1e7
    * quantized embeddings. Per-dimension cluster sums are EXACT integers
    * (quantized longs), so centroids are bit-reproducible regardless of
    * partitioning or shuffle arrival order — no float-sum order
    * sensitivity. Init = the vectors of the k smallest vec_ids.
    *
    * Scale shape: each iteration is one map over the (cached) corpus with
    * the k×dim centroid matrix broadcast, then a shuffle of only k×dim
    * partial-sum rows — the corpus never moves. Returns the k×dim
    * centroid matrix at quantized scale (row index = cluster id).
    */
  def ivfCentroids(embeddings: DataFrame, k: Int,
      iters: Int): Array[Array[Double]] =
    centroidsFromQuantized(quantized(embeddings), k, iters)

  /** Cached (vec_id, label, ×1e7-quantized vector, squared norm) corpus —
    * built once and shared by the k-means index build AND the search-time
    * assignment/re-rank, so the corpus is scanned and quantized a single
    * time and the re-rank never recomputes norms per candidate pair.
    */
  private def quantized(embeddings: DataFrame)
      : org.apache.spark.sql.Dataset[(Long, Int, Array[Long], Long)] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    graft.ops.Caches.register(embeddings
      .select(col("vec_id"), col("label"), col("embedding"))
      .as[(Long, Int, Seq[Float])]
      // quantVec is THE quantization discipline (oracle-parity-critical);
      // one implementation, every path
      .map { case (id, label, e) =>
        val v = quantVec(id, label, e)
        (v.id, v.label, v.q, v.n2)
      }
      .persist())
  }

  /** Lloyd over the quantized plane with DOUBLE-valued means — a
    * deliberately different numeric plane from [[Kmeans.lloyd]]'s
    * integer re-quantized means ([[Kmeans.meanQ]]): this path feeds
    * IVF bucketing, where float centroids are the standard shape and
    * only the PARTITION (not the centroid values) affects results,
    * while Kmeans' exact-integer trajectory is what makes its declared
    * queries oracle-hashable. The two are NOT interchangeable — a
    * numeric-headroom or tie-break change to one does not apply to the
    * other; both sites carry this note.
    */
  private def centroidsFromQuantized(
      typed: org.apache.spark.sql.Dataset[(Long, Int, Array[Long], Long)],
      k: Int, iters: Int): Array[Array[Double]] = {
    val spark = typed.sparkSession
    import spark.implicits._
    var cents: Array[Array[Double]] = typed.toDF("id", "label", "q", "n2")
      .orderBy("id")
      .limit(k).select("id", "q").as[(Long, Array[Long])].collect()
      .sortBy(_._1).map(_._2.map(_.toDouble))
    for (_ <- 1 to iters) {
      val bc = cents
      val sums = typed
        .map { case (_, _, q, _) => (nearestCluster(bc, q), q) }
        .toDF("c", "q")
        .select(col("c"), posexplode(col("q")).as(Seq("d", "v")))
        .groupBy("c", "d")
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      sums.foreach { r =>
        val c = r.getAs[Int]("c")
        next(c)(r.getAs[Int]("d")) =
          r.getAs[Long]("s").toDouble / r.getAs[Long]("n")
      } // clusters that lost every member keep their previous centroid
      cents = next
    }
    cents
  }

  /** Nearest centroid by squared euclidean distance (fixed dim order →
    * deterministic; ties break to the lower cluster id).
    */
  /** (Public: called from [[graft.functions.NearestCluster]]'s generated
    * Java in the corpus-sized assignment pass.)
    */
  def nearestCluster(cents: Array[Array[Double]],
      q: Array[Long]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var i = 0
      val ct = cents(c)
      while (i < q.length) {
        val df = q(i) - ct(i)
        d += df * df
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Quantized-integer cosine with precomputed squared norms — the
    * per-candidate re-rank kernel, public for
    * [[graft.functions.CosineQuant]]'s generated Java.
    */
  def cosKernel(a: Array[Long], b: Array[Long], na: Long,
      nb: Long): Double = {
    var dot = 0L
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); i += 1 }
    dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
  }

  /** The `m` nearest centroids, ascending by distance (ties → lower id). */
  private def nearestClusters(cents: Array[Array[Double]], q: Array[Long],
      m: Int): Array[Int] = {
    val ds = cents.indices.map { c =>
      var d = 0.0
      var i = 0
      val ct = cents(c)
      while (i < q.length) { val df = q(i) - ct(i); d += df * df; i += 1 }
      (d, c)
    }
    ds.sorted.take(m).map(_._2).toArray
  }

  /** IVF approximate top-3 neighbors for the first `nProbes` vec_ids: the
    * k-means index prunes the search to each probe's `probeClusters`
    * nearest cells, exact quantized-integer cosine re-ranks inside them.
    * Candidate volume ≈ nProbes · probeClusters · n/k — the corpus-side
    * scan is a broadcast hash join on cluster id, never all-pairs.
    */
  def annIvfTop3(embeddings: DataFrame, nProbes: Int, k: Int = 16,
      iters: Int = 5, probeClusters: Int = 3): DataFrame = {
    // ONE quantization pass: the cached quantized corpus backs the index
    // build, the cluster assignment, and the probe/re-rank below
    val typed = quantized(embeddings)
    val cents = centroidsFromQuantized(typed, k, iters)
    // codegen'd kernels (graft.functions.IvfExprs): the corpus-sized
    // assignment and the per-candidate cosine run on primitive arrays
    // inside whole-stage codegen; only the nProbes-row probe-cell
    // expansion stays a UDF
    val assignC = graft.functions.NearestCluster(cents) _
    val probeCellsU = udf((q: Seq[Long]) =>
      nearestClusters(cents, q.toArray, probeClusters))
    // zero-norm vectors have undefined cosine (0/0 = NaN) — excluded from
    // both legs, same contract as blockPairs
    val typedDf = typed.toDF("vec_id", "label", "q", "n2")
      .filter(col("n2") > 0)
    val assigned = typedDf
      .withColumn("c", assignC(col("q")))
      .select(col("vec_id").as("nb"), col("label").as("nb_label"),
        col("q"), col("n2"), col("c"))
    val probes = broadcast(typedDf.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe"), col("q").as("pq"),
        col("n2").as("pn2"))
      .withColumn("pc", explode(probeCellsU(col("pq")))))
    val w = Window.partitionBy("probe")
      .orderBy(desc("cos"), asc("nb"))
    probes.join(assigned,
        col("pc") === col("c") && col("probe") =!= col("nb"))
      .withColumn("cos", graft.functions.CosineQuant(
        col("pq"), col("q"), col("pn2"), col("n2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("probe"), col("rn"), col("nb"), col("nb_label"),
        graft.ops.Cols.fround(col("cos"), 6).as("cos"))
  }

  /** Recall@`topK` of the IVF search against the exact answer — the
    * metric an ANN deployment actually monitors. ONE index build and ONE
    * quantized corpus cache feed both legs: the approximate leg is the
    * [[annIvfTop3]] machinery verbatim (probe-cell pruning + re-rank);
    * the exact leg is a broadcast probes×corpus scan with the same
    * quantized-cosine kernel and tie-breaks, so recall measures ONLY the
    * cell-pruning loss — not quantization or tie-ordering differences.
    * Output: (probe, n_hit, recall), recall = |approx ∩ exact| / topK.
    *
    * Scale shape: the exact leg is nProbes·|corpus| broadcast-joined
    * rows — the eval set is bounded by construction (a recall AUDIT runs
    * on a probe sample, not the corpus), so the "brute force" side never
    * becomes a pair explosion.
    */
  def annIvfRecall(embeddings: DataFrame, nProbes: Int, k: Int = 16,
      iters: Int = 5, probeClusters: Int = 3, topK: Int = 3): DataFrame = {
    // the approximate leg (annIvfTop3) hard-caps at rank 3; a larger
    // topK would silently understate recall (approx can never
    // contribute more than 3 hits) — refuse instead of mis-measuring
    require(topK >= 1 && topK <= 3,
      s"annIvfRecall: topK must be in [1, 3] (the annIvfTop3 leg caps " +
        s"at rank 3); got $topK")
    val approx = annIvfTop3(embeddings, nProbes, k, iters, probeClusters)
      .filter(col("rn") <= topK)
      .select(col("probe"), col("nb"))
    // exact leg over the SAME cached quantized corpus (Caches get-or-
    // compute makes the second quantized() call hit the registered cache)
    val typedDf = quantized(embeddings).toDF("vec_id", "label", "q", "n2")
      .filter(col("n2") > 0)
    val probes = broadcast(typedDf.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe"), col("q").as("pq"),
        col("n2").as("pn2")))
    val w = Window.partitionBy("probe").orderBy(desc("cos"), asc("nb"))
    val exact = probes.join(typedDf, col("probe") =!= col("vec_id"))
      .withColumn("cos", graft.functions.CosineQuant(
        col("pq"), col("q"), col("pn2"), col("n2")))
      .select(col("probe"), col("vec_id").as("nb"), col("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("probe"), col("nb"))
    // full rename on the approx side: both legs share the cached corpus
    // lineage, so joining by name avoids ambiguous-attribute resolution
    val ap = approx.select(col("probe").as("aprobe"), col("nb").as("anb"))
    exact.join(ap, col("probe") === col("aprobe") &&
        col("nb") === col("anb"), "left")
      .groupBy("probe")
      .agg(count(col("anb")).as("n_hit"))
      .select(col("probe"), col("n_hit"),
        graft.ops.Cols.fround(
          col("n_hit").cast("double") / topK, 6).as("recall"))
      .orderBy("probe")
  }

  /** array<float> → ml dense Vector (needed by spark.ml LSH). */
  val toVec = udf((a: Seq[Float]) =>
    Vectors.dense(a.map(_.toDouble).toArray))

  /** Top-3 approximate neighbors for each of the first `nProbes` vec_ids:
    * LSH candidate pairs within `euclidThreshold`, re-ranked by exact
    * euclidean distance. Deterministic via fixed seed.
    *
    * `exhaustive = true` swaps ONLY the candidate generator — the
    * hash-bucket-collision join (the one non-SQL-expressible leg) becomes
    * a broadcast probes×corpus join whose candidate set is complete BY
    * CONSTRUCTION — while the distance function (the same
    * `sqrt(Vectors.sqdist)` the LSH join's distCol evaluates), threshold
    * filter, re-rank window, tie-breaks, and rounding stay the shared
    * code below. That makes the exhaustive result the provably exact
    * Euclidean top-3, so q_sim_ann_lsh_exactcheck can hash-check every
    * downstream leg against a DuckDB oracle; SimilaritySpec pins the
    * hash path's candidates against the exhaustive relation.
    */
  def annTop3(embeddings: DataFrame, nProbes: Int,
      euclidThreshold: Double = 1.5, seed: Long = 42L,
      exhaustive: Boolean = false): DataFrame = {
    val feat = embeddings
      .select(col("vec_id"), col("label"), toVec(col("embedding")).as("f"))
    val probes = feat.filter(col("vec_id") < nProbes)
    val cand =
      if (exhaustive) {
        // same keyDistance as BucketedRandomProjectionLSH.distCol
        val dist = udf(
          (a: org.apache.spark.ml.linalg.Vector,
              b: org.apache.spark.ml.linalg.Vector) =>
            math.sqrt(Vectors.sqdist(a, b)))
        broadcast(probes
            .select(col("vec_id").as("p_id"), col("f").as("p_f")))
          .join(feat, col("p_id") =!= col("vec_id"))
          .withColumn("euclid", dist(col("p_f"), col("f")))
          .filter(col("euclid") < euclidThreshold)
          .select(col("p_id").as("probe"), col("vec_id").as("nb"),
            col("label").as("nb_label"), col("euclid"))
      } else {
        val lsh = new BucketedRandomProjectionLSH()
          .setInputCol("f").setOutputCol("h")
          .setBucketLength(0.5).setNumHashTables(4).setSeed(seed)
        val model = lsh.fit(feat)
        model.approxSimilarityJoin(probes, feat, euclidThreshold,
            "euclid")
          .filter(col("datasetA.vec_id") =!= col("datasetB.vec_id"))
          .select(col("datasetA.vec_id").as("probe"),
            col("datasetB.vec_id").as("nb"),
            col("datasetB.label").as("nb_label"), col("euclid"))
      }
    val w = Window.partitionBy("probe").orderBy(asc("euclid"), asc("nb"))
    cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("probe"), col("rn"), col("nb"), col("nb_label"),
        graft.ops.Cols.fround(col("euclid"), 6).as("euclid"))
  }
}
