package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Distributed PCA over an embedding column — the whitening /
  * dimensionality-reduction precursor to ANN indexing and embedding
  * audits.
  *
  * Shape (100 TB bar): ONE narrow pass. Each task folds its vectors into
  * a dim×dim upper-triangular integer Gram plus a length-dim integer sum
  * and a count (~35 KB at dim 64); the driver merges the O(P) summaries
  * with exact integer adds, forms the covariance, and eigendecomposes the
  * dim×dim matrix with breeze (ships with Spark). Corpus size only widens
  * the narrow pass — nothing row-shaped is ever shuffled or collected.
  *
  * Determinism: elements are ×1e3-quantized to longs BEFORE any
  * accumulation, so the Gram is exact and partition-order-free (per-term
  * products ≤ 1e6 keep a 64-dim Gram entry inside Long out to ~10^12
  * rows); the eigendecomposition then runs on bit-identical input under
  * any partitioning. The quantization defines the operator (a PCA of the
  * quantized corpus), and the spec's in-memory reference applies the
  * same quantization.
  */
object Pca {
  /** ×1e3 element quantization (coarser than the ×1e7 pair kernels: the
    * Gram squares it, and exactness at cluster row counts needs the
    * headroom).
    */
  val Quant = 1000.0

  /** ×Quant quantization, rounding half AWAY FROM ZERO — NOT
    * math.round's Java half-up: the q_embed_pca_gram_check oracle
    * quantizes with DuckDB `ROUND(v*1000, 0)` (away-from-zero at .5),
    * and a float like -0.0625f lands exactly on the .5 boundary, where
    * the two conventions diverge (-62 vs -63). Same sign-split device
    * as Kmeans.quant; pinned against BigDecimal HALF_UP in KernelProps.
    */
  @inline private[graft] def quant(x: Float): Long = {
    val v = x.toDouble * Quant
    if (v >= 0) math.floor(v + 0.5).toLong else math.ceil(v - 0.5).toLong
  }

  /** (row count, per-dim Σq, upper-triangular Σ q_i·q_j row-major). */
  final case class Summary(n: Long, sums: Array[Long], gram: Array[Long])

  /** The one corpus pass: per-partition integer summaries, driver merge. */
  def summarize(embeddings: DataFrame, dim: Int): Summary = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val tri = dim * (dim + 1) / 2
    val parts = embeddings.select(col("embedding"))
      .as[Array[Float]]
      .mapPartitions { it =>
        var n = 0L
        val sums = new Array[Long](dim)
        val gram = new Array[Long](tri)
        val q = new Array[Long](dim)
        it.foreach { v =>
          require(v != null && v.length == dim,
            s"pca: expected dim-$dim vector, got ${Option(v).map(_.length)}")
          var i = 0
          while (i < dim) {
            q(i) = quant(v(i))
            // exactness contract: the ~1e12-row headroom assumes
            // N·max(q)² < 2^63, i.e. |q| ≤ √(2^63/1e12) ≈ 3e3
            // (components ≤ 3.0 in original units). Out-of-range inputs
            // would silently overflow the Gram accumulators — fail loud.
            require(q(i) <= 3000L && q(i) >= -3000L,
              s"pca: |component| ${v(i)} exceeds 3.0 — the integer Gram " +
                "accumulator's 1e12-row exactness bound assumes " +
                "|q| <= 3000 (see Quant)")
            i += 1
          }
          n += 1
          var k = 0
          i = 0
          while (i < dim) {
            sums(i) += q(i)
            var j = i
            while (j < dim) { gram(k) += q(i) * q(j); j += 1; k += 1 }
            i += 1
          }
        }
        Iterator.single((n, sums, gram))
      }
      .collect()
    val sums = new Array[Long](dim)
    val gram = new Array[Long](tri)
    var n = 0L
    parts.foreach { case (pn, ps, pg) =>
      n += pn
      var i = 0
      while (i < dim) { sums(i) += ps(i); i += 1 }
      i = 0
      while (i < tri) { gram(i) += pg(i); i += 1 }
    }
    Summary(n, sums, gram)
  }

  /** Covariance eigen-spectrum from a summary: eigenvalues descending
    * (in original ×1 units — the 1/Quant² rescale is applied here).
    */
  def eigenvalues(s: Summary, dim: Int): Array[Double] = {
    require(s.n > 0, "pca: empty embedding corpus")
    val m = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
    val inv = 1.0 / (Quant * Quant)
    var k = 0
    for (i <- 0 until dim; j <- i until dim) {
      // Cov = E[xy] − E[x]E[y], every moment from exact integers
      val c = (s.gram(k).toDouble / s.n -
        s.sums(i).toDouble / s.n * (s.sums(j).toDouble / s.n)) * inv
      m(i, j) = c
      m(j, i) = c
      k += 1
    }
    breeze.linalg.eigSym(m).eigenvalues.toArray.sortBy(-_)
  }
}
