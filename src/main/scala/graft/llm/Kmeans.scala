package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over the embedding corpus — the
  * clustering step behind IVF coarse quantizers, SemDedup cluster
  * pools, and domain-balanced training mixtures.
  *
  * Everything runs on the ×1e7 integer plane (the [[Similarity]] /
  * [[LlmQueries]] quantization discipline):
  *  - distances are exact BIGINT Σ(q_i−c_i)² (max term 4e14·dim ≪ 2^63);
  *  - centroid updates sum exact BIGINTs per (cluster, dim) and
  *    RE-QUANTIZE the mean back to an integer (round half away from
  *    zero on the exact rational sum/count), so every iteration's
  *    centroids — and therefore the whole trajectory — are
  *    bit-identical under any partitioning or execution order;
  *  - init is the k lowest-vec_id vectors (deterministic, no RNG).
  *
  * 100 TB shape: centroids are k×dim longs (a few KB) riding each
  * round's task closure; assignment is a narrow map over the cached
  * quantized corpus; the update shuffles only k×dim×P partial-sum rows
  * (map-side combined) and collects k×dim rows to the driver — the
  * same shape `spark.ml`'s KMeans runs, minus its RNG and float drift.
  */
object Kmeans {
  /** (Not `private`: Catalyst's generated deserializer must reach the
    * accessors — see [[Similarity.QVec]].)
    */
  case class KVec(id: Long, q: Array[Long])

  /** ×1e7 half-away-from-zero quantization — bit-identical to the
    * oracle's `CAST(ROUND(CAST(x AS DOUBLE)*1e7, 0) AS BIGINT)`.
    */
  @inline private def quant(x: Float): Long = {
    val v = x.toDouble * 1e7
    if (v >= 0) Math.floor(v + 0.5).toLong else Math.ceil(v - 0.5).toLong
  }

  def quantized(embeddings: DataFrame): Dataset[KVec] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .map { case (id, emb) => KVec(id, emb.map(quant).toArray) }
  }

  /** Deterministic seed: the k lowest-vec_id vectors, cluster id =
    * rank in that order. (k vectors ≪ driver memory by contract.)
    */
  def initCentroids(qv: Dataset[KVec], k: Int): Array[Array[Long]] =
    qv.orderBy(asc("id")).limit(k).collect().map(_.q)

  /** Exact integer argmin: (nearest cluster, d²), ties to the lowest
    * cluster id (strict `<` scans in id order).
    */
  @inline private def nearest(q: Array[Long],
      centroids: Array[Array[Long]]): (Int, Long) = {
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      var d = 0L
      var i = 0
      while (i < ctr.length) {
        val t = q(i) - ctr(i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    (best, bestD)
  }

  /** Nearest centroid per vector. The centroid matrix rides the task
    * closure — k×dim longs.
    */
  def assign(qv: Dataset[KVec], centroids: Array[Array[Long]])
      : Dataset[(Long, Int, Long)] = {
    import qv.sparkSession.implicits._
    qv.map { v =>
      val (c, d) = nearest(v.q, centroids)
      (v.id, c, d)
    }
  }

  /** Exact-rational mean re-quantized to the integer plane: round half
    * away from zero of sum/n, computed in integer arithmetic.
    * Headroom contract: |q| ≤ 1e7 keeps the per-(cluster, dim) Long sum
    * exact to ~9·10^11 members per cluster and the 2·sum lift to half
    * that — the same documented range class as llm.Pca's Gram
    * accumulators; past it, lift the update aggregation to decimal.
    */
  @inline private[graft] def meanQ(sum: Long, n: Long): Long =
    if (sum >= 0) (2 * sum + n) / (2 * n) else -((2 * -sum + n) / (2 * n))

  /** One update round's distributed leg: per-(cluster, dim) exact BIGINT
    * partial sums + member counts of the quantized corpus assigned to the
    * given centroids — exactly the aggregation [[lloyd]] collects each
    * round (and the leg q_embed_kmeans_update hash-pins in DuckDB).
    */
  def updateSums(qv: Dataset[KVec],
      centroids: Array[Array[Long]]): DataFrame = {
    import qv.sparkSession.implicits._
    qv.map(v => (nearest(v.q, centroids)._1, v.q))
      .toDF("cluster", "q")
      .select(col("cluster"), posexplode(col("q")).as(Seq("dim", "qd")))
      .groupBy("cluster", "dim")
      .agg(sum(col("qd")).as("s"), count(lit(1)).as("n"))
  }

  /** `iters` Lloyd rounds. Returns the final centroids and the final
    * assignment (vec_id, cluster, d² to the final centroid).
    *
    * NOTE: `Similarity.centroidsFromQuantized` is the IVF twin on a
    * deliberately DIFFERENT numeric plane (double-valued means vs this
    * path's [[meanQ]] integer re-quantization) — see its scaladoc; a
    * trajectory-affecting change here must be weighed there too.
    */
  def lloyd(embeddings: DataFrame, k: Int, iters: Int)
      : (Array[Array[Long]], Dataset[(Long, Int, Long)]) =
    lloydQ(graft.ops.Caches.register(quantized(embeddings).persist()),
      k, iters)

  /** [[lloyd]] over an already-quantized (and ideally cached) corpus —
    * callers that hold a `quantized` cache (an index build's encode
    * pass) avoid a second quantization lineage and persist.
    *
    * The per-round update runs as ONE narrow mapPartitions collect of
    * per-partition (cluster → count, Σq per dim) accumulators — k×dim
    * longs per task, P×k rows to the driver — instead of the
    * assign+explode SQL aggregation ([[updateSums]], kept as the
    * declared update-leg kernel q_embed_kmeans_update pins): same
    * exact integer sums (Long addition is associative/commutative, so
    * the partial order is free), no per-round exchange, no per-round
    * adaptive re-planning — one job per round instead of an AQE
    * two-stage pipeline. KmeansSpec pins the trajectory unchanged.
    */
  def lloydQ(qv: Dataset[KVec], k: Int, iters: Int)
      : (Array[Array[Long]], Dataset[(Long, Int, Long)]) = {
    var centroids = initCentroids(qv, k)
    require(centroids.nonEmpty, "empty corpus")
    val dim = centroids(0).length
    var it = 0
    while (it < iters) {
      val cur = centroids
      val partials = qv.rdd.mapPartitions { rows =>
        val cnt = new Array[Long](k)
        val acc = Array.ofDim[Long](k, dim)
        rows.foreach { v =>
          val c = nearest(v.q, cur)._1
          cnt(c) += 1
          val a = acc(c)
          var i = 0
          while (i < dim) { a(i) += v.q(i); i += 1 }
        }
        (0 until k).iterator.filter(cnt(_) > 0)
          .map(c => (c, cnt(c), acc(c)))
      }.collect()
      // empty clusters keep their previous centroid (deterministic —
      // spark.ml would drop them)
      val next = centroids.map(_.clone())
      val totN = new Array[Long](k)
      val totS = Array.ofDim[Long](k, dim)
      partials.foreach { case (c, n, a) =>
        totN(c) += n
        var i = 0
        while (i < dim) { totS(c)(i) += a(i); i += 1 }
      }
      var c = 0
      while (c < k) {
        if (totN(c) > 0) {
          var i = 0
          while (i < dim) {
            next(c)(i) = meanQ(totS(c)(i), totN(c)); i += 1
          }
        }
        c += 1
      }
      centroids = next
      it += 1
    }
    (centroids, assign(qv, centroids))
  }
}
