package graft.hic

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Matrix-balancing bias computation (SURVEY.md A22, the HiCKRy utility).
  *
  * Produces the per-locus bias vector b with (B W B) doubly stochastic —
  * the same fixed point Knight–Ruiz converges to — via symmetric
  * Sinkhorn-style iterations expressed as DataFrame joins/aggregations, so
  * it scales out with the edge list instead of materializing a matrix.
  * Iteration count is FIXED (not tolerance-raced) for deterministic output
  * (SURVEY §7.3 #5). Loci whose marginal coverage falls below
  * `trimPercentile` are dropped before solving and reported with bias −1,
  * mirroring the reference's percentile trim.
  */
object Kr {
  /** contacts: (chr1, mid1, chr2, mid2, contactCount); intra-chromosomal
    * edges only are used (per-chromosome balancing). Returns (chr, mid,
    * bias) for every locus appearing in the input, −1 for trimmed loci.
    */
  def biases(contacts: DataFrame, trimPercentile: Double = 0.05,
      iterations: Int = 20): DataFrame = {
    val intra = contacts.filter(col("chr1") === col("chr2"))
    // symmetric edge list: each undirected pair contributes both ways;
    // the diagonal once
    val edges = intra.select(col("chr1").as("chr"), col("mid1").as("i"),
        col("mid2").as("j"), col("contactCount").cast("double").as("w"))
      .unionByName(intra.filter(col("mid1") =!= col("mid2"))
        .select(col("chr1").as("chr"), col("mid2").as("i"),
          col("mid1").as("j"), col("contactCount").cast("double").as("w")))
      .persist()
    graft.ops.Caches.register(edges)

    val marg = edges.groupBy("chr", "i").agg(sum(col("w")).as("cov"))
    // per-chromosome trim threshold at the given percentile
    val thresholds = marg.groupBy("chr")
      .agg(expr(s"percentile(cov, $trimPercentile)").as("thr"))
    val kept = marg.join(broadcast(thresholds), "chr")
      .filter(col("cov") >= col("thr"))
      .select(col("chr"), col("i"))
    val trimmed = marg.join(broadcast(thresholds), "chr")
      .filter(col("cov") < col("thr"))
      .select(col("chr"), col("i").as("mid"), lit(-1.0).as("bias"))

    // pre-partition on the per-iteration join key: the cached layout then
    // satisfies the join's clustering, so each Sinkhorn iteration shuffles
    // only the O(#loci) bias vector — never the edge list again
    val keptEdges = edges
      .join(kept, Seq("chr", "i"), "left_semi")
      .join(kept.withColumnRenamed("i", "j"), Seq("chr", "j"), "left_semi")
      .repartition(col("chr"), col("j"))
      .sortWithinPartitions(col("chr"), col("j"))
      .persist()
    graft.ops.Caches.register(keptEdges)

    // a kept locus whose partners were ALL trimmed has no kept edges: it
    // can't be balanced — report it with bias 1 (not silently dropped),
    // and keep the hot iteration loop on pure inner joins
    val connected = graft.ops.Caches.register(
      keptEdges.select("chr", "i").distinct().persist())
    val loners = kept.join(connected, Seq("chr", "i"), "left_anti")
      .select(col("chr"), col("i").as("mid"), lit(1.0).as("bias"))

    // b ← b · sqrt(rowsum(BWB) / mean-rowsum), iterated a fixed number of
    // times; rowsum_i(BWB) = (1/b_i) Σ_j w_ij / b_j
    var bias = connected.withColumn("b", lit(1.0))
    for (iter <- 1 to iterations) {
      val rs = keptEdges
        .join(bias.select(col("chr"), col("i").as("j"),
          col("b").as("bj")), Seq("chr", "j"))
        .groupBy("chr", "i")
        .agg(sum(col("w") / col("bj")).as("s"))
      val joined = bias.join(rs, Seq("chr", "i"))
        .withColumn("rowsum", col("s") / col("b"))
      val means = joined.groupBy("chr")
        .agg((sum(col("rowsum")) / count(lit(1))).as("mean_rs"))
      bias = joined.join(broadcast(means), "chr")
        .select(col("chr"), col("i"),
          (col("b") * sqrt(col("rowsum") / col("mean_rs"))).as("b"))
      // cut the lineage every iteration: bias feeds the next round twice
      // (rowsum join + mean), so an un-checkpointed plan doubles per
      // iteration and recomputation explodes (measured 6× slower when
      // checkpointing every 3rd, ~2× when every 2nd)
      bias = bias.localCheckpoint(eager = true)
    }
    // fix the free scale: report biases with per-chromosome mean 1 (the
    // conventional normalization — downstream clamps to [0.5, 2])
    val scale = bias.groupBy("chr")
      .agg((sum(col("b")) / count(lit(1))).as("mean_b"))
    bias.join(broadcast(scale), "chr")
      .select(col("chr"), col("i").as("mid"),
        (col("b") / col("mean_b")).as("bias"))
      .unionByName(loners)
      .unionByName(trimmed)
  }
}
