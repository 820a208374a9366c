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
