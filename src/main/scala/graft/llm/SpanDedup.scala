package graft.llm

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Exact duplicate-SPAN detection — the token-window analog of
  * suffix-array substring dedup (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better"): a span of W
  * consecutive tokens that occurs more than once in the corpus marks
  * boilerplate / templated / copied text that whole-document dedup
  * (exact or MinHash) cannot see, because the containing documents
  * differ elsewhere.
  *
  * Spark shape instead of a suffix array: every document emits its
  * n_toks−W+1 sliding windows as 16-byte md5 keys (a narrow
  * higher-order transform — the raw window text never shuffles), and
  * one hash aggregation over the window keys finds every span with
  * global multiplicity > 1. That is the same work a distributed
  * suffix-array construction would shuffle anyway, without the
  * sequential construction step; W is the minimum match length the
  * suffix array would be queried at.
  *
  * Two consumers of the same window table:
  *  - q_dedup_spans: the most-duplicated spans themselves (top-100 by
  *    multiplicity — TakeOrdered, so the driver result stays bounded
  *    even on a fixture where every window is duplicated);
  *  - q_dedup_span_coverage: the per-document filter signal — what
  *    fraction (ppm, integer-exact) of a doc's windows are duplicated
  *    anywhere in the corpus (including repeats within the SAME doc —
  *    self-repetition is boilerplate too).
  *
  * Both are pure integer/md5 arithmetic end to end → full DuckDB
  * oracles. 100 TB shape: the explode is ≈ n_tokens rows of fixed
  * 16-byte keys; both aggregations are map-side-combinable hash
  * aggregates; nothing driver-side except the bounded top-100.
  */
object SpanDedup {
  /** Window length in tokens — the minimum duplicated-span length the
    * detector reports. 8 on the ~54-token test docs corresponds to the
    * 50-token windows Lee et al. use on ~1k-token web documents.
    */
  private val W = 8

  // per-position window keys come from the fused byte-window kernel
  // (graft.functions.SpanWindowKeys, codegen'd): a W-token window joined
  // by single spaces IS the original byte window, so the md5 runs
  // straight off the text bytes — no per-window string build, no HOF
  // array churn, and the short-doc filter is implicit (empty array)

  /** Shared CTE: one md5 window key per (doc, 1-based start position).
    * DuckDB slices are inclusive-inclusive: toks[i : i+W−1] has W
    * elements.
    */
  private val winsSql =
    "w AS (SELECT doc_id, CAST(i AS BIGINT) AS st, " +
      s"md5(array_to_string(toks[i : i + ${W - 1}], ' ')) AS win_md5 " +
      "FROM (SELECT doc_id, string_split(text, ' ') AS toks " +
      s"FROM documents WHERE len(string_split(text, ' ')) >= $W), " +
      s"unnest(generate_series(1, len(toks) - ${W - 1})) AS s(i))"

  private def windows(spark: org.apache.spark.sql.SparkSession,
      dir: String) =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(graft.functions.TextKernels.spanWindowCol(W)(
          col("text"))).as(Seq("pos", "win_md5")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("st"),
        col("win_md5"))

  /** Factored so q_pipeline_keep can reference it without re-entering
    * the (def-built) queries map during its own construction.
    */
  private lazy val coverageQ: Q = Q(
    (spark, dir) => {
      // per-doc duplicated-window fraction. ONE corpus-sized shuffle:
      // repartition by win_md5 satisfies both the (doc, window)
      // multiplicity groupBy (clustering on a key subset) and the
      // window-function global count over win_md5 — without it Spark
      // plans two full exchanges back to back. Then one groupBy
      // doc_id over the doc-sized aggregate. All counts exact BIGINT;
      // the ratio is ppm floor division.
      import org.apache.spark.sql.expressions.Window
      val perDoc = windows(spark, dir)
        .repartition(col("win_md5"))
        .groupBy("doc_id", "win_md5").agg(count(lit(1)).as("mult"))
      val g = sum(col("mult")).over(Window.partitionBy("win_md5"))
      perDoc.withColumn("g", g)
        .groupBy("doc_id")
        .agg(sum(col("mult")).as("n_wins"),
          sum(when(col("g") > 1, col("mult")).otherwise(0L))
            .as("n_dup_wins"))
        .select(col("doc_id"), col("n_wins"), col("n_dup_wins"),
          expr("(n_dup_wins * 1000000L) div n_wins").as("dup_ppm"))
        .orderBy("doc_id")
    },
    Some("WITH " + winsSql + ", " +
      "pd AS (SELECT doc_id, win_md5, COUNT(*) AS mult FROM w " +
      "GROUP BY doc_id, win_md5), " +
      "wg AS (SELECT doc_id, mult, " +
      "SUM(mult) OVER (PARTITION BY win_md5) AS g FROM pd) " +
      "SELECT doc_id, CAST(SUM(mult) AS BIGINT) AS n_wins, " +
      "CAST(SUM(CASE WHEN g > 1 THEN mult ELSE 0 END) AS BIGINT) " +
      "AS n_dup_wins, " +
      "(CAST(SUM(CASE WHEN g > 1 THEN mult ELSE 0 END) AS BIGINT) " +
      "* 1000000) // CAST(SUM(mult) AS BIGINT) AS dup_ppm " +
      "FROM wg GROUP BY doc_id ORDER BY doc_id"))

  def queries: Map[String, Q] = Map(
    "q_dedup_spans" -> Q(
      (spark, dir) =>
        // the most-duplicated spans: one hash aggregation over window
        // keys, HAVING count > 1, top-100 via TakeOrdered (never a
        // global sort; win_md5 tiebreak makes the limit deterministic)
        windows(spark, dir)
          .groupBy("win_md5")
          .agg(count(lit(1)).as("n_occ"),
            count_distinct(col("doc_id")).as("n_docs"),
            min(col("doc_id")).as("min_doc"))
          .filter(col("n_occ") > 1)
          .orderBy(desc("n_occ"), asc("win_md5"))
          .limit(100),
      Some("WITH " + winsSql + " " +
        "SELECT win_md5, COUNT(*) AS n_occ, " +
        "COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS min_doc " +
        "FROM w GROUP BY win_md5 HAVING COUNT(*) > 1 " +
        "ORDER BY n_occ DESC, win_md5 LIMIT 100")),

    "q_dedup_span_coverage" -> coverageQ,

    "q_dedup_span_islands" -> Q(
      (spark, dir) => {
        // the "what to cut" artifact of span dedup: duplicated windows
        // per doc, merged into maximal token intervals (a window at
        // start st covers tokens [st, st+W−1]; overlapping OR
        // contiguous covered ranges fuse). Classic gaps-and-islands:
        // break when st exceeds the running max covered end + 1, island
        // id = running sum of breaks. Pure integer window arithmetic →
        // identical SQL on both engines. Shuffle shape: one corpus
        // exchange on win_md5 for the global count, one on doc_id for
        // the per-doc interval windows (docs are bounded, so the
        // per-partition sort is bounded).
        import org.apache.spark.sql.expressions.Window
        val dup = windows(spark, dir)
          .withColumn("g",
            count(lit(1)).over(Window.partitionBy("win_md5")))
          .filter(col("g") > 1)
          .select(col("doc_id"), col("st"),
            (col("st") + (W - 1)).as("en"))
        val byDoc = Window.partitionBy("doc_id").orderBy("st")
        val brk = when(
          col("st") > coalesce(
            max(col("en")).over(byDoc.rowsBetween(
              Window.unboundedPreceding, -1)), lit(-1L)) + 1, 1L)
          .otherwise(0L)
        dup.withColumn("brk", brk)
          .withColumn("island", sum(col("brk")).over(
            byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("doc_id", "island")
          .agg(min(col("st")).as("start_tok"), max(col("en")).as("end_tok"))
          .select(col("doc_id"), col("island"), col("start_tok"),
            col("end_tok"),
            (col("end_tok") - col("start_tok") + 1).as("n_toks"))
          .orderBy("doc_id", "island")
      },
      Some("WITH " + winsSql + ", " +
        "dup AS (SELECT doc_id, st, st + " + (W - 1) + " AS en FROM " +
        "(SELECT doc_id, st, COUNT(*) OVER (PARTITION BY win_md5) AS g " +
        "FROM w) WHERE g > 1), " +
        "f AS (SELECT doc_id, st, en, CASE WHEN st > COALESCE(" +
        "MAX(en) OVER (PARTITION BY doc_id ORDER BY st " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1 " +
        "THEN 1 ELSE 0 END AS brk FROM dup), " +
        "i AS (SELECT doc_id, st, en, CAST(SUM(brk) OVER " +
        "(PARTITION BY doc_id ORDER BY st ROWS BETWEEN UNBOUNDED " +
        "PRECEDING AND CURRENT ROW) AS BIGINT) AS island FROM f) " +
        "SELECT doc_id, island, MIN(st) AS start_tok, " +
        "MAX(en) AS end_tok, MAX(en) - MIN(st) + 1 AS n_toks " +
        "FROM i GROUP BY doc_id, island ORDER BY doc_id, island")),

    "q_pipeline_keep" -> Q(
      (spark, dir) => {
        // the capstone keep/drop decision a training-data pipeline
        // actually ships: compose the DECLARED quality and span-coverage
        // operators (the same registry fns, not re-implementations) and
        // fold their signals into one verdict per document with the
        // first-failing reason — short (< 20 tokens), stopword-poor
        // (< 0.10 — the gibberish heuristic), span-duplicated
        // (> 50% duplicated windows), else keep. Docs below the window
        // length have no coverage row → dup_ppm coalesces to 0 (they
        // are 'short' anyway). All signals are exact ints or identical
        // IEEE divisions, so the composition stays hash-green.
        val quality = LlmQueries.queries("q_text_quality").fn(spark, dir)
          .select("doc_id", "n_tokens", "stop_ratio")
        val cov = coverageQ.fn(spark, dir)
          .select("doc_id", "dup_ppm")
        val reason = when(col("n_tokens") < 20, "short")
          .when(col("stop_ratio") < 0.10, "stopword")
          .when(col("dup_ppm") > 500000L, "dup_spans")
          .otherwise("keep")
        quality.join(cov, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"), col("stop_ratio"),
            coalesce(col("dup_ppm"), lit(0L)).as("dup_ppm"))
          .withColumn("reason", reason)
          .select(col("doc_id"), col("n_tokens"), col("dup_ppm"),
            col("reason"),
            (col("reason") === "keep").cast("int").as("keep"))
          .orderBy("doc_id")
      }, {
        // oracle composed from the SAME declared oracles, as CTEs
        val covSql = coverageQ.oracle.get
        Some("WITH q AS (SELECT doc_id, " +
          "CAST(len(string_split(text, ' ')) AS INT) AS n_tokens, " +
          "CAST(len(list_filter(string_split(text, ' '), t -> " +
          "list_contains(['the','a','of','and','to','value','table'," +
          "'row'], t))) AS DOUBLE)/len(string_split(text, ' ')) " +
          "AS stop_ratio FROM documents), " +
          "c AS (" + covSql + "), " +
          "j AS (SELECT q.doc_id, q.n_tokens, q.stop_ratio, " +
          "COALESCE(c.dup_ppm, 0) AS dup_ppm FROM q " +
          "LEFT JOIN c ON q.doc_id = c.doc_id), " +
          "r AS (SELECT doc_id, n_tokens, dup_ppm, " +
          "CASE WHEN n_tokens < 20 THEN 'short' " +
          "WHEN stop_ratio < 0.10 THEN 'stopword' " +
          "WHEN dup_ppm > 500000 THEN 'dup_spans' " +
          "ELSE 'keep' END AS reason FROM j) " +
          "SELECT doc_id, n_tokens, dup_ppm, reason, " +
          "CAST(reason = 'keep' AS INT) AS keep FROM r ORDER BY doc_id")
      }))
}
