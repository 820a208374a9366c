package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning — the canonical tokenizer-training
  * step of an LLM data pipeline.
  *
  * Classic algorithm (Sennrich et al. 2016): represent every word as a
  * symbol sequence (chars + an end-of-word marker), then repeatedly (a)
  * count adjacent symbol pairs corpus-wide, (b) take the most frequent
  * pair, (c) fuse it everywhere. Learned merges, in order, ARE the
  * tokenizer.
  *
  * Scale shape (100 TB bar): the corpus is touched ONCE (the word-count
  * aggregation — trillions of tokens reduce to a vocabulary-bounded
  * table). Every merge round then runs on that bounded table: one
  * map-side-combined pair-count aggregation (output ≤ |pair vocab|),
  * one TakeOrdered(1) for the argmax, one narrow map to fuse. Driver
  * state is a single pair per round — the same bounded-collect
  * discipline as Kr's routing.
  *
  * Determinism: pair counts are exact integer sums (order-independent);
  * the argmax tie-breaks (count desc, left asc, right asc); the fuse is
  * a pure function — so the merge sequence is bit-identical under any
  * partitioning.
  */
object Bpe {
  val EndOfWord = "</w>"

  /** Greedy left-to-right single-pair fuse (one BPE round on one word). */
  def fuse(syms: Seq[String], l: String, r: String): Seq[String] = {
    val a = syms.toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < a.length) {
      if (i + 1 < a.length && a(i) == l && a(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += a(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn `nMerges` merges from a corpus of (text) rows. Returns
    * (rank, left, right, pair_count), rank 1-based in learn order; stops
    * early if no adjacent pair remains (fully fused corpus).
    */
  def learnMerges(docs: DataFrame, nMerges: Int): Seq[(Int, String,
      String, Long)] = {
    val (merges, words) = learn(docs, nMerges)
    words.unpersist()
    merges
  }

  /** [[learnMerges]] plus the final fused word table (count, symbols) —
    * i.e. the corpus ENCODED with the learned tokenizer, vocabulary-
    * bounded. The caller owns releasing the returned Dataset.
    */
  def learn(docs: DataFrame, nMerges: Int): (Seq[(Int, String, String,
      Long)], Dataset[(Long, Seq[String])]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE pass over the corpus: whitespace words → (count, char syms)
    var words: Dataset[(Long, Seq[String])] = graft.ops.Caches
      .register(docs
        .select(explode(split(col("text"), "\\s+")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .as[(String, Long)]
        .map { case (w, cnt) =>
          (cnt, (w.map(_.toString) :+ EndOfWord): Seq[String])
        }
        .persist())

    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var rank = 1
    var live = true
    while (rank <= nMerges && live) {
      val top = words
        .flatMap { case (cnt, syms) =>
          (0 until syms.length - 1).iterator
            .map(i => (syms(i), syms(i + 1), cnt))
        }
        .toDF("l", "r", "cnt")
        .groupBy("l", "r").agg(sum(col("cnt")).as("n"))
        .orderBy(desc("n"), asc("l"), asc("r"))
        .head(1)
      if (top.isEmpty) live = false
      else {
        val (l, r, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, n))
        val prev = words
        // localCheckpoint (eager), not persist: each round's table feeds
        // two consumers (next argmax + next fuse) AND the logical plan
        // must not grow by one map per round — 20 un-truncated rounds
        // overflow the stack just RENDERING the plan tree (same rationale
        // as Kr.solveDistributed's per-iteration checkpoint)
        words = prev.map { case (cnt, syms) => (cnt, fuse(syms, l, r)) }
          .localCheckpoint(eager = true)
        prev.unpersist()
        rank += 1
      }
    }
    (merges.toSeq, words)
  }
}
