package graft.llm

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search over the embedding column (driver
  * north star). Brute-force exact cosine lives in [[LlmQueries]]
  * (q_sim_cosine_topk / q_sim_knn_label, oracle-checked); this module is
  * the scale path: seeded random-projection LSH buckets prune the pair
  * space, then candidates are exactly re-ranked. At 100 TB the bucket join
  * replaces the quadratic self-join.
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

  private case class QVec(id: Long, label: Int, q: Array[Long], n2: Long)

  private def quantize(rows: Array[(Long, Int, Seq[Float])]): Array[QVec] =
    rows.map { case (id, label, emb) =>
      val q = new Array[Long](emb.length)
      var n2 = 0L
      var i = 0
      while (i < q.length) {
        q(i) = quant(emb(i)); n2 += q(i) * q(i); i += 1
      }
      QVec(id, label, q, n2)
    }

  /** Exact brute-force top-K cosine pairs, engineered for scale: the
    * vector set is broadcast once (quantized longs), each partition streams
    * its rows against it with primitive-array dot products and keeps a
    * bounded local top-K — only K rows per partition reach the final
    * TakeOrdered merge. Identical math to the DuckDB oracle (integer dots,
    * one double division).
    *
    * Ranking happens on the 6-dp-ROUNDED cosine (ties → (va, vb)): the
    * oracle's `ORDER BY cos` resolves to the rounded output alias, so the
    * kernel must select and order by the same rounded value or a boundary
    * pair within 1e-6 of rank K would diverge.
    */
  def cosineTopK(embeddings: DataFrame, k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val typed = embeddings
      .select(col("vec_id"), col("label"), col("embedding"))
      .as[(Long, Int, Seq[Float])]
    val all = quantize(typed.collect())
    val bc = spark.sparkContext.broadcast(all)
    val pairs = typed.mapPartitions { it =>
      val vs = bc.value
      val topk = scala.collection.mutable.PriorityQueue
        .empty[(Double, Long, Long)](Ordering.by(t => (-t._1, t._2, t._3)))
      it.foreach { case (id, label, emb) =>
        val a = quantize(Array((id, label, emb)))(0)
        var j = 0
        while (j < vs.length) {
          val b = vs(j)
          if (b.id > a.id) {
            var dot = 0L
            var i = 0
            while (i < a.q.length) { dot += a.q(i) * b.q(i); i += 1 }
            val cos = dot.toDouble /
              math.sqrt(a.n2.toDouble * b.n2.toDouble)
            val cosR = math.floor(cos * 1e6 + 0.5) / 1e6 // == Cols.fround 6
            topk.enqueue((cosR, a.id, b.id))
            if (topk.size > k) topk.dequeue()
          }
          j += 1
        }
      }
      topk.iterator.map { case (cos, va, vb) => (va, vb, cos) }
    }.toDF("va", "vb", "cos")
    pairs.orderBy(desc("cos"), asc("va"), asc("vb")).limit(k)
  }

  /** All pairs with cosine ≥ threshold — embedding-based near-duplicate
    * detection. Same broadcast + primitive kernel as [[cosineTopK]];
    * output size is bounded by the threshold, not n².
    */
  def cosineAbove(embeddings: DataFrame, threshold: Double): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val typed = embeddings
      .select(col("vec_id"), col("label"), col("embedding"))
      .as[(Long, Int, Seq[Float])]
    val all = quantize(typed.collect())
    val bc = spark.sparkContext.broadcast(all)
    typed.mapPartitions { it =>
      val vs = bc.value
      it.flatMap { case (id, label, emb) =>
        val a = quantize(Array((id, label, emb)))(0)
        vs.iterator.filter(_.id > a.id).flatMap { b =>
          var dot = 0L
          var i = 0
          while (i < a.q.length) { dot += a.q(i) * b.q(i); i += 1 }
          val cos = dot.toDouble / math.sqrt(a.n2.toDouble * b.n2.toDouble)
          if (cos >= threshold) Some((a.id, b.id, cos)) else None
        }
      }
    }.toDF("va", "vb", "cos")
  }

  /** array<float> → ml dense Vector (needed by spark.ml LSH). */
  val toVec = udf((a: Seq[Float]) =>
    Vectors.dense(a.map(_.toDouble).toArray))

  /** Top-3 approximate neighbors for each of the first `nProbes` vec_ids:
    * LSH candidate pairs within `euclidThreshold`, re-ranked by exact
    * euclidean distance. Deterministic via fixed seed.
    */
  def annTop3(embeddings: DataFrame, nProbes: Int,
      euclidThreshold: Double = 1.5, seed: Long = 42L): DataFrame = {
    val feat = embeddings
      .select(col("vec_id"), col("label"), toVec(col("embedding")).as("f"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("f").setOutputCol("h")
      .setBucketLength(0.5).setNumHashTables(4).setSeed(seed)
    val model = lsh.fit(feat)
    val probes = feat.filter(col("vec_id") < nProbes)
    val cand = model.approxSimilarityJoin(probes, feat, euclidThreshold,
        "euclid")
      .filter(col("datasetA.vec_id") =!= col("datasetB.vec_id"))
      .select(col("datasetA.vec_id").as("probe"),
        col("datasetB.vec_id").as("nb"),
        col("datasetB.label").as("nb_label"), col("euclid"))
    val w = Window.partitionBy("probe").orderBy(asc("euclid"), asc("nb"))
    cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("probe"), col("rn"), col("nb"), col("nb_label"),
        graft.ops.Cols.fround(col("euclid"), 6).as("euclid"))
  }
}
