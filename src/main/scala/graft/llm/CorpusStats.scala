package graft.llm

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Corpus-profiling queries a training-data pipeline runs before any
  * filtering decision: length distributions (what does a cutoff at X
  * characters actually drop, per language?) and n-gram frequency tables
  * (the raw material for stopword lists and contamination probes).
  * Both are single-shuffle aggregations whose reduced output is tiny at
  * any corpus size.
  */
object CorpusStats {
  def queries: Map[String, Q] = Map(
    "q_text_length_hist" -> Q(
      (spark, dir) =>
        // per-language document-length histogram, 50-char buckets:
        // one hash aggregation (map-side partials absorb any hot
        // language), output bounded by |langs|×|buckets|.
        Tables(spark, dir, "documents")
          .select(col("lang"), expr("n_chars div 50").as("bucket"),
            col("n_chars"))
          .groupBy("lang", "bucket")
          .agg(count(lit(1)).as("n_docs"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"),
            sum(col("n_chars")).as("sum_chars"))
          .orderBy("lang", "bucket"),
      Some("SELECT lang, n_chars//50 AS bucket, COUNT(*) AS n_docs, " +
        "MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars, " +
        "CAST(SUM(n_chars) AS BIGINT) AS sum_chars " +
        "FROM documents GROUP BY lang, bucket ORDER BY lang, bucket")),

    "q_text_bigrams" -> Q(
      (spark, dir) =>
        // corpus-wide top-40 bigram table: the adjacent-pair transform
        // is narrow (higher-order functions over the token array), the
        // only shuffle is the count aggregation, and the result leaves
        // the cluster as a 40-row TakeOrdered — no global sort.
        Tables(spark, dir, "documents")
          .withColumn("toks", split(col("text"), " "))
          .filter(size(col("toks")) >= 2)
          .select(explode(expr("transform(sequence(0, size(toks) - 2), " +
            "i -> concat_ws(' ', slice(toks, i + 1, 2)))")).as("bigram"))
          .groupBy("bigram").agg(count(lit(1)).as("cnt"))
          .orderBy(desc("cnt"), asc("bigram"))
          .limit(40),
      Some("SELECT bg AS bigram, COUNT(*) AS cnt FROM " +
        "(SELECT unnest(list_transform(generate_series(1, len(t) - 1), " +
        "i -> t[i] || ' ' || t[i+1])) AS bg " +
        "FROM (SELECT string_split(text, ' ') AS t FROM documents) " +
        "WHERE len(t) >= 2) " +
        "GROUP BY bg ORDER BY cnt DESC, bigram LIMIT 40")),

    "q_text_zipf" -> Q(
      (spark, dir) => {
        // Zipf profile of the corpus: rank vs frequency plus each token's
        // cumulative share of all token occurrences — the curve used to
        // pick stopword cutoffs and sanity-check scrapes. Top-100 leaves
        // the cluster via TakeOrdered; rank + running share are then
        // windows over those 100 rows only (bounded single partition by
        // construction, not a global sort).
        import org.apache.spark.sql.expressions.Window
        // counts feeds two lineages (corpus total + top-k): persist the
        // vocab-sized aggregate so the token explode runs once, not twice
        val counts = graft.ops.Caches.register(
          graft.Tables(spark, dir, "documents")
            .select(explode(split(col("text"), " ")).as("token"))
            .filter(col("token") =!= "")
            .groupBy("token").agg(count(lit(1)).as("cnt"))
            .persist())
        val total = counts.agg(sum(col("cnt")).as("total"))
        // unpartitioned window is safe HERE ONLY: it runs on the
        // .limit(100) result, so the single partition holds exactly 100
        // rows at any corpus size (the WindowExec warning is expected
        // and bounded; everything upstream is a hash aggregation)
        val w = Window.orderBy(desc("cnt"), asc("token"))
        counts.orderBy(desc("cnt"), asc("token")).limit(100)
          .crossJoin(broadcast(total))
          .withColumn("rank", row_number().over(w))
          .withColumn("cum_share",
            graft.ops.Cols.fround(
              sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding,
                Window.currentRow)).cast("double") /
                col("total").cast("double"),
              8))
          .select("rank", "token", "cnt", "cum_share")
          .orderBy("rank")
      },
      Some("WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok " +
        "FROM documents), " +
        "counts AS (SELECT tok AS token, COUNT(*) AS cnt FROM toks " +
        "WHERE tok <> '' GROUP BY tok), " +
        "tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM counts), " +
        "ranked AS (SELECT token, cnt, ROW_NUMBER() OVER " +
        "(ORDER BY cnt DESC, token) AS rank, " +
        "CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) " +
        "AS cum FROM counts) " +
        "SELECT rank, token, cnt, " +
        graft.ops.Cols.froundSql("cum / (SELECT total FROM tot)", 8) +
        " AS cum_share FROM ranked WHERE rank <= 100 ORDER BY rank")),

    "q_text_bigram_lm" -> Q(
      (spark, dir) => {
        // character-bigram LM commonness score — the integer-exact stand-in
        // for a perplexity filter: score(doc) = mean corpus frequency
        // (parts-per-million, integer floor division) of the doc's char
        // bigrams. Low scores mark out-of-distribution text. The bigram
        // expansion is a narrow higher-order-function transform (2× text
        // bytes, no shuffle); the corpus bigram table is bounded by
        // |charset|² → broadcast back; every arithmetic step is BIGINT
        // (ppm floor-div AFTER the exact sums), so the result is
        // order-independent and hash-exact. Overflows its BIGINT headroom
        // only past ~10^12 corpus chars per shard of the count table.
        val docs = Tables(spark, dir, "documents")
          .filter(length(col("text")) >= 2)
        // per-ROW bigram multiset (graft.functions.CharNgramMultiset,
        // codegen'd): the (doc, bigram) reduction happens inside the scan
        // stage, so the old explode → groupBy(doc_id, bg) hash aggregate
        // — a corpus-text-sized row stream and, at scale, its shuffle —
        // is gone entirely. Contents are exactly the old groupBy output
        // (exact integer counts); the oracle keeps the per-occurrence
        // formulation.
        val bgDoc = graft.ops.Caches.register(docs
          .select(col("doc_id"),
            explode(graft.functions.TextKernels.charNgrams(2)(col("text")))
              .as("e"))
          .select(col("doc_id"), col("e.gram").as("bg"),
            col("e.mult").as("mult"))
          .persist())
        val counts = bgDoc.groupBy("bg").agg(sum(col("mult")).as("cnt"))
        val total = counts.agg(sum(col("cnt")).as("t"))
        bgDoc.join(broadcast(counts), "bg")
          .groupBy("doc_id")
          .agg(sum(col("mult") * col("cnt")).as("sum_c"),
            sum(col("mult")).as("n_bg"))
          .crossJoin(broadcast(total))
          .select(col("doc_id"), col("n_bg"),
            expr("((sum_c * 1000000L) div t) div n_bg").as("ppm_score"))
          .orderBy("doc_id")
      },
      Some("WITH docs AS (SELECT doc_id, text FROM documents " +
        "WHERE length(text) >= 2), " +
        "ix AS (SELECT doc_id, text, " +
        "unnest(generate_series(1, length(text)-1)) AS i FROM docs), " +
        "bigrams AS (SELECT doc_id, substr(text, CAST(i AS INT), 2) " +
        "AS bg FROM ix), " +
        "counts AS (SELECT bg, COUNT(*) AS cnt FROM bigrams GROUP BY bg), " +
        "tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM counts), " +
        "agg AS (SELECT b.doc_id, CAST(SUM(c.cnt) AS BIGINT) AS sum_c, " +
        "COUNT(*) AS n_bg FROM bigrams b JOIN counts c ON b.bg = c.bg " +
        "GROUP BY b.doc_id) " +
        "SELECT doc_id, n_bg, " +
        "((sum_c * 1000000) // (SELECT t FROM tot)) // n_bg AS ppm_score " +
        "FROM agg ORDER BY doc_id")),

    "q_text_perplexity" -> Q(
      (spark, dir) => {
        // true bigram-LM perplexity per document (the filter signal a
        // quality pipeline thresholds): ppl = exp(−(1/N)·Σ ln p(bg)),
        // p(bg) from the corpus's own char-bigram MLE. The float-sum
        // hazard (Σ ln p is order-dependent in IEEE) is removed with
        // the quantized-log device q_hic_fisher_stat pinned: each
        // DISTINCT bigram's log-prob becomes the integer
        // ROUND(ln(cnt/total)·1e6) ONCE, per-doc sums are exact BIGINT
        // Σ mult·lp, and only the final exp/division is float — an
        // identical IEEE expression on both engines under fround 4.
        // PROBED LN-PARITY ASSUMPTION (same class as binom_tail_check's
        // documented boundary-flip risk): the device additionally
        // assumes Spark's java.lang.Math.log and DuckDB's LN agree to
        // the last ulp on every cnt/t this corpus produces — a 1-ulp
        // ln difference landing exactly on a ROUND(x*1e6) half-boundary
        // would flip one lp_q by 1 and break the hash. Probed at sf0.01
        // (round 12): across all 114 corpus bigrams the nearest
        // ln(cnt/t)*1e6 to a .5 boundary is 0.0057 absolute ≈ 6.1e6
        // ulps away, so last-ulp libm drift cannot flip a row here; a
        // future engine/libm bump that DID close that gap would show up
        // as a re-run of this probe, not a mystery hash diff.
        // Same two-shuffle shape as q_text_bigram_lm: the raw explode
        // is reduced to (doc, bigram, mult) first, the |charset|²
        // count table broadcasts back.
        val docs = Tables(spark, dir, "documents")
          .filter(length(col("text")) >= 2)
        // same per-row multiset kernel as q_text_bigram_lm: the
        // (doc, bigram) reduction is map-side-complete in the scan stage
        val bgDoc = graft.ops.Caches.register(docs
          .select(col("doc_id"),
            explode(graft.functions.TextKernels.charNgrams(2)(col("text")))
              .as("e"))
          .select(col("doc_id"), col("e.gram").as("bg"),
            col("e.mult").as("mult"))
          .persist())
        val counts = bgDoc.groupBy("bg").agg(sum(col("mult")).as("cnt"))
        val total = counts.agg(sum(col("cnt")).as("t"))
        val lp = counts.crossJoin(broadcast(total))
          .select(col("bg"),
            expr("CAST(ROUND(ln(CAST(cnt AS DOUBLE) / " +
              "CAST(t AS DOUBLE)) * 1000000, 0) AS BIGINT)").as("lp_q"))
        bgDoc.join(broadcast(lp), "bg")
          .groupBy("doc_id")
          .agg(sum(col("mult") * col("lp_q")).as("sum_lp_q"),
            sum(col("mult")).as("n_bg"))
          .select(col("doc_id"), col("n_bg"),
            (-col("sum_lp_q")).as("nll_q"),
            graft.ops.Cols.fround(
              exp(-col("sum_lp_q").cast("double") /
                (col("n_bg").cast("double") * lit(1e6))), 4).as("ppl"))
          .orderBy("doc_id")
      },
      Some("WITH docs AS (SELECT doc_id, text FROM documents " +
        "WHERE length(text) >= 2), " +
        "ix AS (SELECT doc_id, text, " +
        "unnest(generate_series(1, length(text)-1)) AS i FROM docs), " +
        "bd AS (SELECT doc_id, substr(text, CAST(i AS INT), 2) AS bg, " +
        "COUNT(*) AS mult FROM ix GROUP BY doc_id, bg), " +
        "counts AS (SELECT bg, CAST(SUM(mult) AS BIGINT) AS cnt " +
        "FROM bd GROUP BY bg), " +
        "tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM counts), " +
        "lp AS (SELECT bg, CAST(ROUND(LN(CAST(cnt AS DOUBLE) / " +
        "CAST((SELECT t FROM tot) AS DOUBLE)) * 1000000, 0) AS BIGINT) " +
        "AS lp_q FROM counts), " +
        "agg AS (SELECT b.doc_id, " +
        "CAST(SUM(b.mult * lp.lp_q) AS BIGINT) AS sum_lp_q, " +
        "CAST(SUM(b.mult) AS BIGINT) AS n_bg FROM bd b " +
        "JOIN lp USING (bg) GROUP BY b.doc_id) " +
        "SELECT doc_id, n_bg, -sum_lp_q AS nll_q, " +
        graft.ops.Cols.froundSql(
          "EXP(-CAST(sum_lp_q AS DOUBLE) / (CAST(n_bg AS DOUBLE) * 1e6))",
          4) + " AS ppl FROM agg ORDER BY doc_id")),

    "q_text_chunk" -> Q(
      (spark, dir) => {
        // pre-embedding document chunker: fixed 128-token windows at
        // stride 96 (32-token overlap) — the standard shape feeding an
        // embedding model. Pure narrow generate (bounded fan-out
        // ≈ n_toks/stride per doc, no shuffle until the output sort);
        // chunk content leaves as md5 (identical hex in Spark and
        // DuckDB) so the oracle compares content without shipping the
        // text itself through the hash compare.
        val W = 128
        val S = 96
        Tables(spark, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .select(col("doc_id"), col("toks"),
            explode(expr(s"sequence(0, greatest(size(toks)-1, 0), $S)"))
              .as("start"))
          .select(col("doc_id"),
            expr(s"start div $S").as("chunk_id"),
            least(lit(W), size(col("toks")) - col("start")).as("n_toks"),
            md5(array_join(expr(s"slice(toks, start+1, $W)"), " "))
              .as("chunk_md5"))
          .orderBy("doc_id", "chunk_id")
      },
      Some("WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks " +
        "FROM documents), " +
        "s AS (SELECT doc_id, toks, " +
        "unnest(generate_series(0, GREATEST(len(toks)-1, 0), 96)) " +
        "AS start FROM t) " +
        "SELECT doc_id, start//96 AS chunk_id, " +
        "LEAST(128, len(toks) - start) AS n_toks, " +
        "md5(array_to_string(toks[start+1:start+128], ' ')) AS chunk_md5 " +
        "FROM s ORDER BY doc_id, chunk_id")),

    "q_text_bpe_learn" -> Q(
      (spark, dir) => {
        // distributed BPE tokenizer training (see llm.Bpe): 20 merge
        // rounds over the vocabulary-bounded word table; the corpus is
        // scanned exactly once. Iterative corpus-wide argmax → not
        // SQL-expressible → rows-only; BpeSpec pins the full merge
        // sequence against an in-memory reference implementation.
        // cachedMerges: shares the (bit-deterministic) learn with
        // q_text_bpe_vocab within a session — whichever runs first pays.
        import spark.implicits._
        Bpe.cachedMerges(dir, 20)(Tables(spark, dir, "documents"))
          .toDF("rank", "left", "right", "pair_count")
          .orderBy("rank")
      },
      None),

    "q_text_bpe_first_merge" -> Q(
      (spark, dir) => {
        // oracle twin for the BPE learn loop's argmax leg: ONE round of
        // the SAME learnMerges path (word table → weighted adjacent-pair
        // counts → (n DESC, l, r) argmax) is plain SQL, so the leg the
        // full 20-round learn repeats gets a hash-checked oracle; the
        // sequential dependence between rounds stays pinned by BpeSpec's
        // full-sequence differential.
        import spark.implicits._
        Bpe.learnMerges(Tables(spark, dir, "documents"), nMerges = 1)
          .toDF("rank", "merge_l", "merge_r", "pair_count")
      },
      Some("WITH w AS (SELECT word, COUNT(*) AS cnt FROM (SELECT " +
        "unnest(string_split_regex(text, '\\s+')) AS word " +
        "FROM documents) WHERE word <> '' GROUP BY word), " +
        "p AS (SELECT substr(word, i, 1) AS merge_l, " +
        "CASE WHEN i = len(word) THEN '</w>' " +
        "ELSE substr(word, i + 1, 1) END AS merge_r, cnt " +
        "FROM w, unnest(generate_series(1, len(word))) AS t(i)) " +
        "SELECT CAST(1 AS INT) AS rank, merge_l, merge_r, " +
        "CAST(SUM(cnt) AS BIGINT) AS pair_count FROM p " +
        "GROUP BY merge_l, merge_r " +
        "ORDER BY pair_count DESC, merge_l, merge_r LIMIT 1")),

    "q_text_bpe_vocab" -> Q(
      (spark, dir) => {
        // the tokenizer APPLIED: take the 20 learned merges (memoized —
        // learning happens at most once per session, see Bpe.cachedMerges)
        // and encode the word table in ONE narrow map (Bpe.fuse folded
        // over the merge list), then read the token vocabulary off the
        // encoded table. Top-25 tokens by exact occurrence count,
        // tie-broken lexicographically. Rows-only; BpeSpec pins the
        // table against the reference encoder.
        import spark.implicits._
        val docs = Tables(spark, dir, "documents")
        val merges = Bpe.cachedMerges(dir, 20)(docs)
          .map { case (_, l, r, _) => (l, r) }
        val words = Bpe.applyMerges(Bpe.wordTable(docs), merges)
        words.flatMap { case (cnt, syms) => syms.iterator.map((_, cnt)) }
          .toDF("token", "cnt")
          .groupBy("token").agg(sum(col("cnt")).as("n_occ"))
          .orderBy(desc("n_occ"), asc("token")).limit(25)
          .select(col("token"), col("n_occ"),
            length(col("token")).as("n_chars"))
          .orderBy(desc("n_occ"), asc("token"))
      },
      None),

    "q_text_entropy" -> Q(
      (spark, dir) => {
        // per-document character Shannon entropy — the classic gibberish
        // / binary-junk detector a quality pipeline thresholds (CCNet,
        // RefinedWeb class): H(d) = −Σ_c (n_c/N)·ln(n_c/N) in nats.
        // Spark shape: the char explode reduces to (doc, ch, mult) in
        // ONE hash aggregation; each DISTINCT (doc, ch) gets its
        // quantized log-prob ROUND(ln(mult/N)·1e6) ONCE (the same
        // exact-integer device as q_text_perplexity — per-doc sums are
        // order-free BIGINT), and a single repartition on doc_id serves
        // both the N window and the final per-doc sum (the span-coverage
        // exchange-fusion discipline). Ln-parity boundary probe
        // (round-14, sf0.01): min distance of ln(mult/N)·1e6 to a .5
        // boundary across all 11 989 (doc, ch) rows is 3.3e-5 ≈ 1.7e4
        // ulps at the ~1e7 operand magnitude — a last-ulp (≤ 2 ulp)
        // libm divergence cannot flip a quantized row.
        // per-row char multiset (CharNgramMultiset n=1): the explode →
        // repartition → groupBy(doc_id, ch) reduction AND the
        // partition-window N are both computed in the scan stage — the
        // doc's total char count is char_length(text) (≡ Σ mult, every
        // position contributes one char), so the only exchange left in
        // the whole query is the final tiny per-doc groupBy.
        val chDoc = Tables(spark, dir, "documents")
          .filter(length(col("text")) >= 1)
          .select(col("doc_id"),
            length(col("text")).cast("long").as("n"),
            explode(graft.functions.TextKernels.charNgrams(1)(col("text")))
              .as("e"))
          .select(col("doc_id"), col("n"), col("e.mult").as("mult"))
        chDoc
          .select(col("doc_id"), col("n"),
            (col("mult") * expr("CAST(ROUND(ln(CAST(mult AS DOUBLE) / " +
              "CAST(n AS DOUBLE)) * 1000000, 0) AS BIGINT)")).as("t"))
          .groupBy("doc_id")
          .agg(max(col("n")).as("n_chars"), (-sum(col("t"))).as("ent_q"))
          .select(col("doc_id"), col("n_chars"), col("ent_q"),
            graft.ops.Cols.fround(col("ent_q").cast("double") /
              (col("n_chars").cast("double") * lit(1e6)), 6)
              .as("entropy"))
          .orderBy("doc_id")
      },
      Some("WITH ix AS (SELECT doc_id, text, " +
        "unnest(generate_series(1, length(text))) AS i FROM documents " +
        "WHERE length(text) >= 1), " +
        "cd AS (SELECT doc_id, substr(text, CAST(i AS INT), 1) AS ch, " +
        "COUNT(*) AS mult FROM ix GROUP BY doc_id, ch), " +
        "wn AS (SELECT doc_id, ch, mult, " +
        "CAST(SUM(mult) OVER (PARTITION BY doc_id) AS BIGINT) AS n " +
        "FROM cd), " +
        "agg AS (SELECT doc_id, MAX(n) AS n_chars, " +
        "-CAST(SUM(mult * CAST(ROUND(LN(CAST(mult AS DOUBLE) / " +
        "CAST(n AS DOUBLE)) * 1000000, 0) AS BIGINT)) AS BIGINT) " +
        "AS ent_q FROM wn GROUP BY doc_id) " +
        "SELECT doc_id, n_chars, ent_q, " +
        graft.ops.Cols.froundSql("CAST(ent_q AS DOUBLE) / " +
          "(CAST(n_chars AS DOUBLE) * 1e6)", 6) +
        " AS entropy FROM agg ORDER BY doc_id")))
}
