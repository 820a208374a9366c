package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Partition-count independence gate: declared queries must produce
  * bit-identical output under different `spark.sql.shuffle.partitions` —
  * the round-7 refinement bug (stage task id keyed per-partition offsets)
  * was exactly a partition-count-dependent corruption, invisible at any
  * single setting. Representatives cover each machinery class: the
  * GlobalOrder rank/cumsum (shard, pack), the multi-pass BH pipeline
  * (significances), the salted two-phase window (stratified), and the
  * hybrid union-find labeling (dedup cluster). Full-surface sweeps
  * (7 vs 32 partitions, sf0.01, exact parquet diffs) were run in round 8
  * at 94 queries and again at 113 queries: zero diffs both times.
  */
class DeterminismSpec extends AnyFunSuite with Matchers with SparkTest {
  private val sf = "/root/testdata/sf0.001"
  private val reps = Seq("q_text_shard", "q_text_pack",
    "q_hic_significances", "q_sample_stratified", "q_dedup_cluster",
    // round-8 cont.: CC over the cosine graph (block-pair kernel feeding
    // the hybrid union-find) — cluster ids must not depend on which task
    // saw which edge first
    "q_dedup_semantic",
    // round 9: bounded sequence-explode machinery (insulation) and the
    // chained keyed aggregations of the funnel
    "q_hic_insulation", "q_events_funnel",
    // round 9 cont.: iterative broadcast rank loop (per-round fround must
    // absorb partial-agg order), calendar-grid explode + forward-fill
    // window, and the corpus-total crossJoin + broadcast count join
    "q_graph_pagerank", "q_ts_gapfill", "q_text_bigram_lm",
    // round 9 cont.: iterative argmax loop (BPE tie-breaks), SCD2 window
    // chain, stream-stream interval join, integer-plane quantization,
    // HLL sketch merge (order-independent by construction), and the
    // 4-broadcast-dim warehouse chain
    "q_text_bpe_learn", "q_scd2_props", "q_stream_interval_join",
    "q_embed_quantize", "q_agg_hll_sketch", "q_tpch_q5",
    "q_text_bpe_vocab")

  private def runAll(parts: Int): Map[String, Seq[String]] = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, parts.toString)
      reps.map { name =>
        val rows =
          try Registry.all(name).fn(spark, sf).collect()
          finally graft.ops.Caches.drain()
        name -> rows.map(_.toString).sorted.toSeq
      }.toMap
    } finally spark.conf.set(key, prev)
  }

  test("representative queries are bit-identical at 5 vs 32 shuffle partitions") {
    val at5 = runAll(5)
    val at32 = runAll(32)
    reps.foreach { name =>
      withClue(s"$name differs between partition counts: ") {
        at5(name).size shouldBe at32(name).size
        at5(name) shouldBe at32(name)
      }
    }
  }

  // AQE re-plans at runtime (coalesced shuffle partitions, demoted
  // joins, skew splits) — a second independent execution-shape axis the
  // partition-count sweep never varies. Round-11 machinery classes:
  // the fused repartition+window coverage pass, gaps-and-islands, the
  // 10-round integer k-means trajectory, the quantized-log perplexity,
  // the composed keep/drop decision, and the centroid outlier audit.
  private val aqeReps = Seq("q_dedup_span_coverage",
    "q_dedup_span_islands", "q_embed_kmeans", "q_text_perplexity",
    "q_pipeline_keep", "q_embed_outliers", "q_hic_significances",
    "q_dedup_cluster")

  test("representative queries are bit-identical with AQE on vs off") {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    def run(on: Boolean): Map[String, Seq[String]] =
      try {
        spark.conf.set(key, on.toString)
        aqeReps.map { name =>
          val rows =
            try Registry.all(name).fn(spark, sf).collect()
            finally graft.ops.Caches.drain()
          name -> rows.map(_.toString).sorted.toSeq
        }.toMap
      } finally spark.conf.set(key, prev)
    val on = run(true)
    val off = run(false)
    aqeReps.foreach { name =>
      withClue(s"$name differs between AQE on/off: ") {
        on(name) shouldBe off(name)
      }
    }
  }
}
