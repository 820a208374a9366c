package graft.llm

import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.ops.Cols

/** Embedding-column corpus operators beyond pair similarity: norm
  * auditing, per-label centroids, and SemDedup-style semantic dedup
  * (connected components over the cosine-threshold near-dup graph —
  * Abbas et al. 2023's "keep one representative per semantic cluster",
  * expressed with the exact pair kernel plus the shared CC operator).
  *
  * All vector math uses the ×1e7 integer quantization (the
  * [[Similarity]] / [[LlmQueries]] discipline): per-element BIGINT
  * lifts make every sum exact and shuffle-order-independent, so the
  * DuckDB oracles hash-match bit-for-bit.
  */
object EmbedQueries {
  /** Shared ×1e7 quantization ([[LlmQueries.quantArr]]) — one definition
    * per side so a precision change can never skew one path.
    */
  private val qArr = LlmQueries.quantArr

  /** Shared full oracle for the two PQ-ADC search paths (in-query build
    * vs persisted index): DuckDB re-derives the iteration-0 codebooks,
    * codes, probe LUTs, and the exact-BIGINT ADC ranking from the raw
    * embeddings — a hash match on BOTH queries proves the persisted
    * round-trip is lossless.
    */
  private val adcCtes =
    "WITH qv AS (SELECT vec_id, CAST(i AS INT) - 1 AS i, " +
      "CAST(ROUND(CAST(v AS DOUBLE)*10000000, 0) AS BIGINT) AS q " +
      "FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS i, " +
      "unnest(embedding) AS v FROM embeddings)), " +
      "init AS (SELECT vec_id, CAST(ROW_NUMBER() OVER " +
      "(ORDER BY vec_id) - 1 AS INT) AS cid FROM " +
      "(SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)), " +
      "cq AS (SELECT init.cid, qv.i, qv.q FROM init " +
      "JOIN qv USING (vec_id)), " +
      "d AS (SELECT a.vec_id, CAST(a.i // 16 AS INT) AS sub, c.cid, " +
      "CAST(SUM((a.q - c.q)*(a.q - c.q)) AS BIGINT) AS d2 " +
      "FROM qv a JOIN cq c ON a.i = c.i " +
      "GROUP BY a.vec_id, 2, c.cid), " +
      "r AS (SELECT vec_id, sub, cid, d2, ROW_NUMBER() OVER " +
      "(PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn FROM d), " +
      "codes AS (SELECT vec_id, sub, cid AS code FROM r WHERE rn = 1), " +
      "lut AS (SELECT vec_id AS probe, sub, cid AS code, d2 AS pd2 " +
      "FROM d WHERE vec_id < 10)"

  private val adcOracleSql = adcCtes +
    ", adc AS (SELECT lut.probe, codes.vec_id AS nb, " +
    "CAST(SUM(lut.pd2) AS BIGINT) AS adc FROM codes " +
    "JOIN lut ON lut.sub = codes.sub AND lut.code = codes.code " +
    "WHERE codes.vec_id <> lut.probe GROUP BY 1, 2), " +
    "nn AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe " +
    "ORDER BY adc, nb) AS rn FROM adc) " +
    "SELECT probe, CAST(rn AS INT) AS rn, nb, adc FROM nn " +
    "WHERE rn <= 3 ORDER BY probe, rn"

  /** Full oracle for the persisted IVF+PQ search: extends the shared ADC
    * CTEs with the full-dimension coarse assignment (same 8 iteration-0
    * centroids), each probe's 3 nearest cells, the cell-pruned candidate
    * set, and the ADC ranking restricted to it.
    */
  private val ivfPqOracleSql = adcCtes +
    ", dfull AS (SELECT a.vec_id, c.cid, " +
    "CAST(SUM((a.q - c.q)*(a.q - c.q)) AS BIGINT) AS d2 " +
    "FROM qv a JOIN cq c ON a.i = c.i GROUP BY 1, 2), " +
    "cells AS (SELECT vec_id, cid FROM (SELECT *, ROW_NUMBER() OVER " +
    "(PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM dfull) " +
    "WHERE rn = 1), " +
    "pcells AS (SELECT vec_id AS probe, cid AS pc FROM " +
    "(SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id " +
    "ORDER BY d2, cid) AS rn FROM dfull WHERE vec_id < 10) " +
    "WHERE rn <= 3), " +
    "cand AS (SELECT p.probe, s.vec_id AS nb FROM pcells p " +
    "JOIN cells s ON s.cid = p.pc WHERE s.vec_id <> p.probe), " +
    "adc2 AS (SELECT cand.probe, cand.nb, " +
    "CAST(SUM(lut.pd2) AS BIGINT) AS adc FROM cand " +
    "JOIN codes ON codes.vec_id = cand.nb " +
    "JOIN lut ON lut.probe = cand.probe AND lut.sub = codes.sub " +
    "AND lut.code = codes.code GROUP BY 1, 2), " +
    "nn2 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe " +
    "ORDER BY adc, nb) AS rn FROM adc2) " +
    "SELECT probe, CAST(rn AS INT) AS rn, nb, adc FROM nn2 " +
    "WHERE rn <= 3 ORDER BY probe, rn"

  def queries: Map[String, Q] = Map(
    "q_embed_norms" -> Q(
      (spark, dir) =>
        // per-vector L2 norm audit (embedding hygiene: unnormalized or
        // near-zero vectors poison cosine math downstream). n2 is the
        // exact quantized squared norm; the norm itself is one sqrt +
        // one division — identical IEEE ops on identical inputs in both
        // engines. Fully narrow: the scan parallelism is the plan.
        Tables(spark, dir, "embeddings")
          .select(col("vec_id"), col("label"),
            expr(LlmQueries.normQ).as("n2"))
          .select(col("vec_id"), col("label"), col("n2"),
            Cols.fround(sqrt(col("n2").cast("double")) / lit(1e7), 6)
              .as("l2_norm"))
          .orderBy("vec_id"),
      // LEFT JOIN + empty/NULL case: unnest over an empty or NULL array
      // yields no qv rows, so an inner join would DROP the vector while
      // Spark keeps it (aggregate over empty → 0, over NULL → NULL).
      // Unreachable with the fixture's fixed 64-dim arrays, but the
      // oracle should mirror Spark's semantics, not the fixture.
      Some("WITH qv AS (SELECT vec_id, " +
        "CAST(ROUND(CAST(v AS DOUBLE)*10000000, 0) AS BIGINT) AS q " +
        "FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings)), " +
        "nrm AS (SELECT vec_id, CAST(SUM(q*q) AS BIGINT) AS n2 FROM qv " +
        "GROUP BY vec_id), " +
        "n AS (SELECT e.vec_id, e.label, CASE WHEN e.embedding IS NULL " +
        "THEN NULL ELSE COALESCE(nrm.n2, 0) END AS n2 " +
        "FROM embeddings e LEFT JOIN nrm USING (vec_id)) " +
        "SELECT vec_id, label, n2, " +
        Cols.froundSql("SQRT(CAST(n2 AS DOUBLE))/1e7", 6) +
        " AS l2_norm FROM n ORDER BY vec_id")),

    "q_embed_centroid" -> Q(
      (spark, dir) =>
        // per-label centroid (the building block behind IVF coarse
        // quantizers and SemDedup cluster representatives): posexplode
        // to (label, dim, q) and sum EXACT quantized integers — the
        // centroid is bit-reproducible under any partitioning because
        // no float addition ever reorders. Shuffle volume is
        // |labels|×dim partial-sum rows, not the corpus.
        Tables(spark, dir, "embeddings")
          .select(col("label"), posexplode(expr(qArr)).as(Seq("dim", "q")))
          .groupBy("label", "dim")
          .agg(count(lit(1)).as("n"), sum(col("q")).as("sum_q"))
          .select(col("label"), col("dim"), col("n"), col("sum_q"),
            Cols.fround(col("sum_q").cast("double") / col("n"), 6)
              .as("centroid"))
          .orderBy("label", "dim"),
      Some("WITH qv AS (SELECT label, i, " +
        "CAST(ROUND(CAST(v AS DOUBLE)*10000000, 0) AS BIGINT) AS q " +
        "FROM (SELECT label, generate_subscripts(embedding, 1) AS i, " +
        "unnest(embedding) AS v FROM embeddings)) " +
        "SELECT label, CAST(i - 1 AS INT) AS dim, COUNT(*) AS n, " +
        "CAST(SUM(q) AS BIGINT) AS sum_q, " +
        Cols.froundSql("CAST(SUM(q) AS DOUBLE)/COUNT(*)", 6) +
        " AS centroid FROM qv GROUP BY label, i ORDER BY label, dim")),

    "q_dedup_semantic" -> Q(
      (spark, dir) => {
        // SemDedup: semantic duplicate clusters = connected components
        // of the cosine ≥ 0.35 graph; keep the min-vec_id representative
        // per cluster. Pairs come from the bounded block-pair kernel
        // (never all-pairs materialized), components from the hybrid CC
        // operator (driver union-find under the edge budget, distributed
        // min-label propagation above it).
        val emb = Tables(spark, dir, "embeddings")
        val pairs = Similarity.cosineAbove(emb, 0.35)
          .select(col("va").as("doc_a"), col("vb").as("doc_b"))
        val cc = Dedup.connectedComponents(
          emb.select(col("vec_id").as("doc_id")), pairs)
        val sizes = cc.groupBy("cluster").agg(count(lit(1)).as("csize"))
        cc.join(sizes, "cluster")
          .select(col("doc_id").as("vec_id"), col("cluster"), col("csize"),
            (col("doc_id") === col("cluster")).cast("int").as("keep"))
          .orderBy("vec_id")
      },
      Some("WITH RECURSIVE " + LlmQueries.qvecsSql + ", " +
        "p AS (SELECT va, vb FROM sims WHERE cos >= 0.35), " +
        "e AS (SELECT va AS a, vb AS b FROM p " +
        "UNION ALL SELECT vb, va FROM p), " +
        "reach(v, root) AS (" +
        "SELECT vec_id, vec_id FROM embeddings " +
        "UNION " +
        "SELECT e.b, reach.root FROM reach JOIN e ON reach.v = e.a), " +
        "cc AS (SELECT v, MIN(root) AS cluster FROM reach GROUP BY v), " +
        "s AS (SELECT cluster, COUNT(*) AS csize FROM cc " +
        "GROUP BY cluster) " +
        "SELECT cc.v AS vec_id, cc.cluster, s.csize, " +
        "CAST(cc.v = cc.cluster AS INT) AS keep FROM cc " +
        "JOIN s USING (cluster) ORDER BY vec_id")),

    "q_embed_quantize" -> Q(
      (spark, dir) =>
        // int8 range quantization (embedding compression, the storage
        // half of a PQ/SQ serving pipeline): per-vector min/max → 0..255
        // codes + total reconstruction error, computed ENTIRELY on the
        // ×1e7 integer plane with floor division — no float op anywhere,
        // so the oracle hash-matches without rounding discipline. Fully
        // narrow (higher-order transforms; the scan parallelism is the
        // plan); codes leave as md5, errors as exact BIGINT sums.
        Tables(spark, dir, "embeddings")
          .select(col("vec_id"), expr(qArr).as("q"))
          .select(col("vec_id"), array_min(col("q")).as("mn"),
            array_max(col("q")).as("mx"), col("q"))
          .select(col("vec_id"), col("mn"), col("mx"),
            expr("transform(q, x -> ((x - mn) * 255) div " +
              "greatest(mx - mn, 1L))").as("codes"), col("q"))
          .select(col("vec_id"), col("mn"), col("mx"),
            md5(array_join(col("codes"), ",")).as("codes_md5"),
            expr("aggregate(codes, 0L, (a, c) -> a + c)").as("sum_code"),
            // recon_i = mn + (code_i·(mx−mn)) div 255 ≤ q_i, so the
            // error terms are non-negative by construction
            expr("aggregate(zip_with(q, codes, (x, c) -> " +
              "x - mn - (c * (mx - mn)) div 255), 0L, (a, e) -> a + e)")
              .as("sum_abs_err"))
          .orderBy("vec_id"),
      Some("WITH qv AS (SELECT vec_id, list_transform(embedding, x -> " +
        "CAST(ROUND(CAST(x AS DOUBLE)*10000000, 0) AS BIGINT)) AS q " +
        "FROM embeddings), " +
        "mm AS (SELECT vec_id, q, CAST(list_min(q) AS BIGINT) AS mn, " +
        "CAST(list_max(q) AS BIGINT) AS mx FROM qv), " +
        "cd AS (SELECT vec_id, mn, mx, q, list_transform(q, x -> " +
        "((x - mn) * 255) // GREATEST(mx - mn, 1)) AS codes FROM mm) " +
        "SELECT vec_id, mn, mx, " +
        "md5(array_to_string(codes, ',')) AS codes_md5, " +
        "CAST(list_aggregate(codes, 'sum') AS BIGINT) AS sum_code, " +
        "CAST(list_aggregate(list_transform(list_zip(q, codes), p -> " +
        "p[1] - mn - (p[2] * (mx - mn)) // 255), 'sum') AS BIGINT) " +
        "AS sum_abs_err " +
        "FROM cd ORDER BY vec_id")),

    "q_embed_outliers" -> Q(
      (spark, dir) => {
        // intra-class outlier audit (embedding hygiene: a vector far
        // from its own label's centroid marks a mislabel or a poisoned
        // embedding). Centroids re-quantize the exact-integer mean to
        // the ×1e7 plane (the Kmeans.meanQ device, sign-split so
        // floor==truncate in both engines); d² to the own-label
        // centroid is then exact BIGINT, and the outlier flag compares
        // d² against 2× the label's mean d² (integer floor mean —
        // deterministic, no float anywhere). Shape: one narrow
        // posexplode feeds |labels|×dim partials; the centroid array
        // (array_sort over the collected (dim, c) structs — collection
        // order-free) broadcasts back; d² is a narrow zip_with; label
        // means are |labels| rows broadcast again.
        val qv = Tables(spark, dir, "embeddings")
          .select(col("vec_id"), col("label"), expr(qArr).as("q"))
        val cent = qv
          .select(col("label"), posexplode(col("q")).as(Seq("dim", "qd")))
          .groupBy("label", "dim")
          .agg(sum(col("qd")).as("s"), count(lit(1)).as("n"))
          .select(col("label"), col("dim"),
            expr("CASE WHEN s >= 0 THEN (2*s + n) div (2*n) " +
              "ELSE -((2*(-s) + n) div (2*n)) END").as("c"))
          .groupBy("label")
          .agg(expr("transform(array_sort(collect_list(struct(dim, c)))," +
            " x -> x.c)").as("carr"))
        val d2 = qv.join(broadcast(cent), "label")
          .select(col("vec_id"), col("label"),
            expr("aggregate(zip_with(q, carr, (a, b) -> (a - b) * " +
              "(a - b)), 0L, (acc, v) -> acc + v)").as("d2"))
        // decimal-lifted sum: worst-case d² is 64·(2e7)² ≈ 2.6e16, so a
        // plain Long sum would WRAP silently past ~350 worst-case (or
        // ~5k realistic) vectors per label while DuckDB's HUGEINT sum
        // would not — the decimal(38) accumulator keeps both engines
        // exact to ~10^21 vectors; the floored mean is back in Long
        // range by construction
        val stats = d2.groupBy("label")
          .agg(expr("cast(sum(cast(d2 as decimal(38,0))) div count(1) " +
            "as bigint)").as("mean_d2"))
        d2.join(broadcast(stats), "label")
          .select(col("vec_id"), col("label"), col("d2"), col("mean_d2"),
            (col("d2") > lit(2L) * col("mean_d2")).cast("int")
              .as("outlier"))
          .orderBy("vec_id")
      },
      Some("WITH qv AS (SELECT vec_id, label, CAST(i AS INT) - 1 AS i, " +
        "CAST(ROUND(CAST(v AS DOUBLE)*10000000, 0) AS BIGINT) AS q " +
        "FROM (SELECT vec_id, label, " +
        "generate_subscripts(embedding, 1) AS i, " +
        "unnest(embedding) AS v FROM embeddings)), " +
        "cent AS (SELECT label, i, CASE WHEN SUM(q) >= 0 " +
        "THEN (2*CAST(SUM(q) AS BIGINT) + COUNT(*)) // (2*COUNT(*)) " +
        "ELSE -((2*(-CAST(SUM(q) AS BIGINT)) + COUNT(*)) // " +
        "(2*COUNT(*))) END AS c FROM qv GROUP BY label, i), " +
        "d AS (SELECT qv.vec_id, qv.label, " +
        "CAST(SUM((qv.q - cent.c)*(qv.q - cent.c)) AS BIGINT) AS d2 " +
        "FROM qv JOIN cent ON qv.label = cent.label AND qv.i = cent.i " +
        "GROUP BY qv.vec_id, qv.label), " +
        "st AS (SELECT label, CAST(SUM(d2) AS BIGINT) // COUNT(*) " +
        "AS mean_d2 FROM d GROUP BY label) " +
        "SELECT d.vec_id, d.label, d.d2, st.mean_d2, " +
        "CAST(d.d2 > 2*st.mean_d2 AS INT) AS outlier " +
        "FROM d JOIN st USING (label) ORDER BY d.vec_id")),

    "q_embed_kmeans" -> Q(
      (spark, dir) => {
        // deterministic Lloyd k-means (see llm.Kmeans): k=8, 10 rounds,
        // init = the 8 lowest-vec_id vectors, every step exact-integer
        // so the trajectory is partition-invariant. Output: per-cluster
        // population, exact inertia (Σ d² to the final centroid), and
        // the final centroid as an md5 content address. Iterative
        // corpus-wide argmin → not SQL-expressible → rows-only;
        // KmeansSpec pins the full trajectory against an in-memory
        // reference and q_embed_kmeans_assign hash-pins the assignment
        // kernel on the SAME code path.
        import spark.implicits._
        val (centroids, assigned) =
          Kmeans.lloyd(Tables(spark, dir, "embeddings"), k = 8, iters = 10)
        val cdf = centroids.zipWithIndex
          .map { case (c, i) => (i, c.mkString(",")) }
          .toSeq.toDF("cluster", "cstr")
        assigned.toDF("vec_id", "cluster", "d2")
          .groupBy("cluster")
          .agg(count(lit(1)).as("n_vecs"),
            // decimal-lifted like q_embed_outliers' mean: worst-case d²
            // ≈ 2.6e16, so a Long inertia would wrap silently past
            // ~350 worst-case members; decimal(38) is exact to ~10^21
            sum(col("d2").cast("decimal(38,0)")).as("inertia"))
          // left join FROM cdf so every centroid appears even when its
          // cluster is empty; the aggregated side carries the hint —
          // BroadcastHashJoin builds the non-preserved side, so hinting
          // the preserved side of an outer join cannot be honored
          .transform(agg => cdf.join(broadcast(agg), Seq("cluster"), "left"))
          .select(col("cluster"),
            coalesce(col("n_vecs"), lit(0L)).as("n_vecs"),
            coalesce(col("inertia"), lit(0L)).as("inertia"),
            md5(col("cstr").cast("binary")).as("centroid_md5"))
          .orderBy("cluster")
      },
      None),

    "q_embed_kmeans_assign" -> Q(
      (spark, dir) => {
        // oracle twin for the k-means assignment kernel: ONE round of
        // the SAME Kmeans.assign path (exact integer d², lowest-id
        // tiebreak) against the deterministic init centroids — plain
        // SQL, so the step Lloyd repeats 10× is hash-checked; the
        // sequential dependence between rounds stays pinned by
        // KmeansSpec's trajectory differential.
        import spark.implicits._
        val qv = graft.ops.Caches.register(
          Kmeans.quantized(Tables(spark, dir, "embeddings")).persist())
        Kmeans.assign(qv, Kmeans.initCentroids(qv, 8))
          .toDF("vec_id", "cluster", "d2")
          .orderBy("vec_id")
      },
      Some("WITH qv AS (SELECT vec_id, CAST(i AS INT) - 1 AS i, " +
        "CAST(ROUND(CAST(v AS DOUBLE)*10000000, 0) AS BIGINT) AS q " +
        "FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS i, " +
        "unnest(embedding) AS v FROM embeddings)), " +
        "init AS (SELECT vec_id, CAST(ROW_NUMBER() OVER " +
        "(ORDER BY vec_id) - 1 AS INT) AS cid FROM " +
        "(SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)), " +
        "cq AS (SELECT init.cid, qv.i, qv.q FROM init " +
        "JOIN qv USING (vec_id)), " +
        "d AS (SELECT a.vec_id, c.cid, " +
        "CAST(SUM((a.q - c.q)*(a.q - c.q)) AS BIGINT) AS d2 " +
        "FROM qv a JOIN cq c ON a.i = c.i GROUP BY a.vec_id, c.cid), " +
        "r AS (SELECT vec_id, cid, d2, ROW_NUMBER() OVER " +
        "(PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d) " +
        "SELECT vec_id, cid AS cluster, d2 FROM r WHERE rn = 1 " +
        "ORDER BY vec_id")),

    "q_embed_kmeans_update" -> Q(
      (spark, dir) => {
        // oracle twin for the k-means UPDATE leg (the other half of a
        // Lloyd round — the assignment leg is q_embed_kmeans_assign):
        // one round's per-(cluster, dim) exact BIGINT partial sums from
        // the deterministic init centroids via the SAME Kmeans.updateSums
        // aggregation lloyd collects, re-quantized with the SAME meanQ
        // half-away-from-zero integer formula. Empty clusters keep their
        // init centroid (the left-join COALESCE mirrors lloyd's
        // `centroids.clone()` carry-over). With both legs hash-pinned,
        // only the 10-round sequential composition remains rows-only
        // (q_embed_kmeans; KmeansSpec pins the full trajectory).
        import spark.implicits._
        val qv = graft.ops.Caches.register(
          Kmeans.quantized(Tables(spark, dir, "embeddings")).persist())
        val init = Kmeans.initCentroids(qv, 8)
        val grid = init.zipWithIndex.flatMap { case (c, cid) =>
          c.zipWithIndex.map { case (q0, d) => (cid, d, q0) }
        }.toSeq.toDF("cluster", "dim", "q0")
        val upd = Kmeans.updateSums(qv, init)
          .as[(Int, Int, Long, Long)]
          .map { case (c, d, s, n) => (c, d, Kmeans.meanQ(s, n)) }
          .toDF("cluster", "dim", "c")
        grid.join(upd, Seq("cluster", "dim"), "left")
          .select(col("cluster"), col("dim"),
            coalesce(col("c"), col("q0")).as("c_new"))
          .orderBy("cluster", "dim")
      },
      Some("WITH qv AS (SELECT vec_id, CAST(i AS INT) - 1 AS i, " +
        "CAST(ROUND(CAST(v AS DOUBLE)*10000000, 0) AS BIGINT) AS q " +
        "FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS i, " +
        "unnest(embedding) AS v FROM embeddings)), " +
        "init AS (SELECT vec_id, CAST(ROW_NUMBER() OVER " +
        "(ORDER BY vec_id) - 1 AS INT) AS cid FROM " +
        "(SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)), " +
        "cq AS (SELECT init.cid, qv.i, qv.q FROM init " +
        "JOIN qv USING (vec_id)), " +
        "d AS (SELECT a.vec_id, c.cid, " +
        "CAST(SUM((a.q - c.q)*(a.q - c.q)) AS BIGINT) AS d2 " +
        "FROM qv a JOIN cq c ON a.i = c.i GROUP BY a.vec_id, c.cid), " +
        "r AS (SELECT vec_id, cid, d2, ROW_NUMBER() OVER " +
        "(PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d), " +
        "asn AS (SELECT vec_id, cid FROM r WHERE rn = 1), " +
        "sums AS (SELECT asn.cid AS cluster, qv.i AS dim, " +
        "CAST(SUM(qv.q) AS BIGINT) AS s, COUNT(*) AS n " +
        "FROM asn JOIN qv USING (vec_id) GROUP BY 1, 2), " +
        "upd AS (SELECT cluster, dim, CASE WHEN s >= 0 " +
        "THEN (2*s + n) // (2*n) " +
        "ELSE -((2*(-s) + n) // (2*n)) END AS c FROM sums) " +
        "SELECT cq.cid AS cluster, cq.i AS dim, " +
        "CAST(COALESCE(upd.c, cq.q) AS BIGINT) AS c_new " +
        "FROM cq LEFT JOIN upd ON upd.cluster = cq.cid " +
        "AND upd.dim = cq.i ORDER BY cluster, dim")),

    "q_embed_pq_assign" -> Q(
      (spark, dir) => {
        // oracle twin for the PQ ENCODE kernel (see llm.Pq): per-subspace
        // argmin against the deterministic iteration-0 codebooks (the 8
        // lowest-vec_id vectors' subvectors — the q_embed_kmeans_assign
        // init discipline, per 16-dim block). One narrow flatMap, one
        // (vec_id, sub, code, d2) row per vector×subspace, exact integer
        // d² → plain SQL. The trained composition stays rows-only
        // (q_embed_pq; PqSpec pins it).
        import spark.implicits._
        val qv = graft.ops.Caches.register(
          Kmeans.quantized(Tables(spark, dir, "embeddings")).persist())
        Pq.encode(qv, Pq.initBooks(qv, m = 4, k = 8))
          .toDF("vec_id", "sub", "code", "d2")
          .orderBy("vec_id", "sub")
      },
      Some("WITH qv AS (SELECT vec_id, CAST(i AS INT) - 1 AS i, " +
        "CAST(ROUND(CAST(v AS DOUBLE)*10000000, 0) AS BIGINT) AS q " +
        "FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS i, " +
        "unnest(embedding) AS v FROM embeddings)), " +
        "init AS (SELECT vec_id, CAST(ROW_NUMBER() OVER " +
        "(ORDER BY vec_id) - 1 AS INT) AS cid FROM " +
        "(SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)), " +
        "cq AS (SELECT init.cid, qv.i, qv.q FROM init " +
        "JOIN qv USING (vec_id)), " +
        "d AS (SELECT a.vec_id, CAST(a.i // 16 AS INT) AS sub, c.cid, " +
        "CAST(SUM((a.q - c.q)*(a.q - c.q)) AS BIGINT) AS d2 " +
        "FROM qv a JOIN cq c ON a.i = c.i " +
        "GROUP BY a.vec_id, 2, c.cid), " +
        "r AS (SELECT vec_id, sub, cid, d2, ROW_NUMBER() OVER " +
        "(PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn FROM d) " +
        "SELECT vec_id, sub, cid AS code, d2 FROM r WHERE rn = 1 " +
        "ORDER BY vec_id, sub")),

    "q_embed_pq" -> Q(
      (spark, dir) => {
        // trained PQ index audit: per-subspace Lloyd codebooks (M=4,
        // k=8, 3 rounds — llm.Pq.trainedBooks reuses Kmeans.lloyd
        // verbatim per 16-dim slice), then ONE narrow encode pass.
        // Output: per-subspace code population and exact reconstruction
        // inertia — the "how much does the compressed index lose"
        // summary an ANN deployment reads before swapping PQ in.
        // Iterative training → not SQL-expressible → rows-only; PqSpec
        // pins encode against a JVM twin and trained-vs-init inertia,
        // and q_embed_pq_assign hash-pins the same encode kernel.
        import spark.implicits._
        val emb = Tables(spark, dir, "embeddings")
        // one quantized cache shared by training and encode (the
        // separate trainedBooks(emb) entry would build its own)
        val qv = graft.ops.Caches.register(
          Kmeans.quantized(emb).persist())
        val books = Pq.trainedBooksQ(qv, m = 4, k = 8, iters = 3)
        Pq.encode(qv, books)
          .toDF("vec_id", "sub", "code", "d2")
          .groupBy("sub", "code")
          .agg(count(lit(1)).as("n_vecs"),
            sum(col("d2").cast("decimal(38,0)")).as("inertia"))
          .orderBy("sub", "code")
      },
      None),

    "q_sim_ann_pq_adc" -> Q(
      (spark, dir) =>
        // PQ asymmetric-distance search (llm.Pq.adcTop3): probes rank
        // the corpus by Σ of m distance-table lookups at each vector's
        // codes — the corpus embeddings are never read at query time.
        // Unlike IVF/LSH pruning, ADC is exhaustive over candidates
        // (approximate in VALUE only) and all-integer, so the whole
        // search path gets a full hash oracle.
        Pq.adcTop3(Tables(spark, dir, "embeddings"), m = 4, k = 8,
          nProbes = 10)
          .orderBy("probe", "rn"),
      Some(adcOracleSql)),

    "q_sim_ann_pq_persisted" -> Q(
      (spark, dir) => {
        // search FROM THE PERSISTED PQ index — the operational shape of
        // a production vector store: Pq.persistedIndex trains and
        // WRITES the index (codes + codebooks parquet) as a separate
        // job, and this query's plan contains only index-table scans, a
        // probe-pruned embeddings scan, and the broadcast-LUT ADC join
        // — no training, no encode stage (gated in PlanSpec). Results
        // are byte-identical to q_sim_ann_pq_adc (exact-integer devices
        // + lossless long round-trip through parquet), so the SAME full
        // hash oracle pins the whole persisted path.
        val idx = Pq.persistedIndex(spark, dir, m = 4, k = 8)
        Pq.adcTop3FromIndex(spark, idx,
          Tables(spark, dir, "embeddings"), nProbes = 10)
          .orderBy("probe", "rn")
      },
      Some(adcOracleSql)),

    "q_sim_ann_pq_incremental" -> Q(
      (spark, dir) => {
        // INCREMENTAL index maintenance: the index is built on the
        // id-prefix half of the corpus, extended with only the new
        // vectors (broadcast-anti against the persisted codes — the
        // nightly delta job), extended AGAIN as a replay no-op, and
        // searched. Iteration-0 codebooks are prefix-stable (k lowest
        // vec_ids), so the result is byte-identical to the full build —
        // the SAME full ADC oracle pins the whole maintenance cycle:
        // a codes row lost, doubled, or re-coded anywhere breaks the
        // hash.
        val idx = Pq.persistedIndexIncremental(spark, dir, m = 4, k = 8)
        Pq.adcTop3FromIndex(spark, idx,
          Tables(spark, dir, "embeddings"), nProbes = 10)
          .orderBy("probe", "rn")
      },
      Some(adcOracleSql)),

    "q_sim_ann_ivfpq_persisted" -> Q(
      (spark, dir) => {
        // the FULL production ANN pipeline from a persisted combined
        // index: IVF cells prune each probe to its 3 nearest inverted
        // lists (coarse centroids = one KB driver collect; candidate
        // volume nProbes·3·n/k, never the corpus), then PQ-ADC ranks
        // the survivors from their persisted codes — embeddings are
        // read only for the 10 probe vectors. Both quantizers are the
        // deterministic iteration-0 devices, so unlike the trained-IVF
        // family this combined search is exact-integer SQL end to end
        // → FULL oracle (pruning QUALITY of the trained path is
        // audited by q_sim_ann_recall; this pins the pipeline SHAPE).
        val idx = Pq.persistedIvfPq(spark, dir, k = 8, m = 4, kb = 8)
        Pq.ivfPqTop3FromIndex(spark, idx,
          Tables(spark, dir, "embeddings"),
          nProbes = 10, probeCells = 3)
          .orderBy("probe", "rn")
      },
      Some(ivfPqOracleSql)),

    "q_sim_ann_ivfpq_incremental" -> Q(
      (spark, dir) => {
        // the FULL production index LIFECYCLE under one hash oracle:
        // combined IVF+PQ built on the id-prefix half, extended with
        // the delta (cells AND codes delta commits — a vector missing from
        // cells would silently never be searched), codes COMPACTED
        // behind the manifest swap, extend replayed as a no-op, then
        // searched index-only. Iteration-0 devices are prefix-stable,
        // so the result is byte-identical to the one-shot build and
        // the SAME combined oracle pins every step: a cells row lost
        // in the append, a codes row dropped by compaction, or a
        // replay double-encode anywhere breaks the hash.
        val idx = Pq.persistedIvfPqIncremental(spark, dir,
          k = 8, m = 4, kb = 8)
        Pq.ivfPqTop3FromIndex(spark, idx,
          Tables(spark, dir, "embeddings"),
          nProbes = 10, probeCells = 3)
          .orderBy("probe", "rn")
      },
      Some(ivfPqOracleSql)),

    "q_sim_ann_ivfpq_trained" -> Q(
      (spark, dir) => {
        // the TRAINED nightly build: Lloyd coarse centroids + Lloyd
        // per-subspace codebooks persisted to the same four-table
        // layout, searched by the SAME ivfPqTop3FromIndex (index-only
        // plan, gated in PlanSpec alongside the init family). Lloyd is
        // iterative re-quantized argmin — not SQL-expressible → rows-
        // only; PqSpec pins the quality law instead: on a planted
        // clustered corpus the trained index's recall@3 is ≥ the
        // init-index recall and is exactly 1.0 (cells align with the
        // true clusters), and on THIS corpus the search returns 3
        // valid rows per probe from index tables alone.
        val idx = Pq.persistedIvfPqTrained(spark, dir,
          k = 8, m = 4, kb = 8, iters = 3)
        Pq.ivfPqTop3FromIndex(spark, idx,
          Tables(spark, dir, "embeddings"),
          nProbes = 10, probeCells = 3)
          .orderBy("probe", "rn")
      },
      None),

    "q_embed_pca" -> Q(
      (spark, dir) => {
        // covariance eigen-spectrum of the embedding corpus (see
        // llm.Pca): one narrow pass folds every partition into a 64×64
        // integer Gram summary, the driver merges O(P) summaries and
        // eigendecomposes 64×64 — the whitening/compression audit that
        // precedes ANN index builds. Eigendecomposition isn't
        // SQL-expressible → rows-only; PcaSpec pins the spectrum against
        // an in-memory reference on the same quantized integers.
        import spark.implicits._
        val dim = 64
        val ev = Pca.eigenvalues(
          Pca.summarize(Tables(spark, dir, "embeddings"), dim), dim)
        val total = ev.sum
        var cum = 0.0
        ev.toSeq.zipWithIndex.map { case (v, i) =>
          cum += v
          (i, v, v / total, cum / total)
        }.toDF("component", "eigenvalue", "var_explained", "cum_explained")
          .select(col("component"),
            Cols.fround(col("eigenvalue"), 6).as("eigenvalue"),
            Cols.fround(col("var_explained"), 6).as("var_explained"),
            Cols.fround(col("cum_explained"), 6).as("cum_explained"))
          .orderBy("component")
      },
      None),

    "q_embed_pca_gram_check" -> Q(
      (spark, dir) => {
        // oracle twin for PCA's one DISTRIBUTED leg: the exact integer
        // Gram/sum/count summary (the same llm.Pca.summarize fold
        // q_embed_pca eigendecomposes) flattened to upper-triangular
        // (i, j) rows. Pure ×1e3-quantized integer arithmetic → DuckDB
        // replays it bit-for-bit; the remaining driver-side 64×64 eigen
        // leg is pinned against breeze in PcaSpec, so between the two
        // checks every leg of the PCA operator is covered.
        import spark.implicits._
        val dim = 64
        val s = Pca.summarize(Tables(spark, dir, "embeddings"), dim)
        val rows = for {
          i <- 0 until dim
          j <- i until dim
        } yield {
          val k = i * dim - i * (i - 1) / 2 + (j - i)
          (i, j, s.gram(k), s.sums(i), s.sums(j), s.n)
        }
        rows.toDF("i", "j", "gram", "sum_i", "sum_j", "n")
          .orderBy("i", "j")
      },
      Some("WITH qv AS (SELECT vec_id, CAST(i AS INT) - 1 AS i, " +
        "CAST(ROUND(CAST(v AS DOUBLE)*1000, 0) AS BIGINT) AS q " +
        "FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS i, " +
        "unnest(embedding) AS v FROM embeddings)), " +
        "g AS (SELECT a.i AS i, b.i AS j, " +
        "CAST(SUM(a.q * b.q) AS BIGINT) AS gram FROM qv a JOIN qv b " +
        "ON a.vec_id = b.vec_id AND a.i <= b.i GROUP BY 1, 2), " +
        "s AS (SELECT i, CAST(SUM(q) AS BIGINT) AS sm FROM qv " +
        "GROUP BY i), " +
        "cnt AS (SELECT COUNT(*) AS n FROM embeddings) " +
        "SELECT g.i, g.j, g.gram, sa.sm AS sum_i, sb.sm AS sum_j, " +
        "cnt.n FROM g JOIN s sa ON sa.i = g.i " +
        "JOIN s sb ON sb.i = g.j, cnt ORDER BY g.i, g.j")))
}
