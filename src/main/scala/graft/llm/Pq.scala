package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import graft.llm.Kmeans.KVec

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the memory side of 100 TB
  * ANN. IVF prunes which vectors a probe touches; PQ shrinks what each
  * resident vector COSTS: the D-dim embedding is split into M
  * contiguous subspaces and each subvector replaced by the id of its
  * nearest per-subspace centroid, so D floats become M small codes
  * (k ≤ 256 → one byte each) plus one shared M×k×(D/M) codebook.
  *
  * Everything runs on the Kmeans ×1e7 integer plane: codebooks come
  * from the SAME deterministic per-subspace Lloyd (exact BIGINT d²,
  * re-quantized integer means, lowest-vec_id init and tiebreaks), so
  * codes and reconstruction errors are bit-identical under any
  * partitioning or execution order.
  *
  * 100 TB shape: a codebook is k×D longs (a few KB) riding the task
  * closure; encoding is ONE narrow map over the quantized corpus (no
  * shuffle); training costs M×iters corpus passes, cut by `trainMod`
  * (production PQ trains codebooks on a small deterministic sample —
  * here vec_id % trainMod == 0 — exactly like a sampled Lloyd).
  */
object Pq {
  /** Per-subspace codebooks from the k lowest-vec_id vectors — the
    * deterministic iteration-0 state of [[trainedBooks]], and the
    * SQL-expressible anchor q_embed_pq_assign hash-pins in DuckDB.
    * books(m)(c) = centroid c of subspace m, length D/M.
    */
  def initBooks(qv: Dataset[KVec], m: Int, k: Int)
      : Array[Array[Array[Long]]] = {
    val init = Kmeans.initCentroids(qv, k)
    require(init.nonEmpty, "empty corpus")
    val dim = init.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    Array.tabulate(m)(s => init.map(_.slice(s * sub, (s + 1) * sub)))
  }

  /** Per-subspace Lloyd-trained codebooks: subspace s trains on the
    * sliced corpus `embedding[s·D/M, (s+1)·D/M)` (sampled by
    * `trainMod`) — the same init, exact-integer update, and
    * empty-cluster carry-over as [[Kmeans.lloyd]], but all M subspace
    * trainings FUSED into one corpus pass per iteration. The
    * per-subspace-lloyd form paid M×(init + iters) jobs and M separate
    * persisted slices of the corpus; the subspaces are independent
    * coordinate blocks of the SAME rows, so one cached quantized
    * corpus, ONE init collect (quantization commutes with slicing —
    * the k lowest-vec_id vectors seed every subspace), and one
    * assign+explode aggregation per round carrying the subspace id
    * reproduce every trajectory bit for bit (PqSpec pins fused ≡
    * per-subspace lloyd). At corpus scale this is M× fewer passes over
    * the training sample per round, not just fewer job barriers.
    */
  def trainedBooks(embeddings: DataFrame, m: Int, k: Int, iters: Int,
      trainMod: Long = 1L): Array[Array[Array[Long]]] = {
    import org.apache.spark.sql.functions._
    val src =
      if (trainMod <= 1L) embeddings
      else embeddings.filter(col("vec_id") % trainMod === 0L)
    val qv = graft.ops.Caches.register(Kmeans.quantized(src).persist())
    trainedBooksQ(qv, m, k, iters)
  }

  /** [[trainedBooks]] over an already-quantized (and ideally cached)
    * corpus — callers that hold a `Kmeans.quantized` cache (the encode
    * pass needs one anyway) avoid a second quantization lineage.
    */
  def trainedBooksQ(qv: Dataset[KVec], m: Int, k: Int,
      iters: Int): Array[Array[Array[Long]]] = {
    import org.apache.spark.sql.functions._
    import qv.sparkSession.implicits._
    // iteration-0 state: one collect seeds every subspace (initBooks
    // slices the k lowest-vec_id vectors — elementwise quantization
    // commutes with slicing, so this equals per-subspace
    // Kmeans.initCentroids over the sliced corpus)
    var books = initBooks(qv, m, k)
    val sub = books(0)(0).length
    var it = 0
    while (it < iters) {
      val cur = books
      // one narrow mapPartitions collect for ALL subspaces: per task, a
      // m×k accumulator of (member count, Σq per subspace dim) — exact
      // BIGINT sums whose partial order is free (Long addition is
      // associative/commutative), m×k×P rows to the driver, no
      // exchange and no per-round adaptive re-planning (the lloydQ
      // discipline)
      val partials = qv.rdd.mapPartitions { rows =>
        val cnt = Array.ofDim[Long](cur.length, k)
        val acc = Array.ofDim[Long](cur.length, k, sub)
        rows.foreach { v =>
          var s = 0
          while (s < cur.length) {
            val c = nearestAt(v.q, s * sub, cur(s))._1
            cnt(s)(c) += 1
            val a = acc(s)(c)
            var i = 0
            while (i < sub) { a(i) += v.q(s * sub + i); i += 1 }
            s += 1
          }
        }
        for (s <- (0 until cur.length).iterator; c <- 0 until k
             if cnt(s)(c) > 0) yield (s, c, cnt(s)(c), acc(s)(c))
      }.collect()
      // empty clusters keep their previous centroid (the lloyd
      // discipline): clone, overwrite only the clusters present
      val next = books.map(_.map(_.clone()))
      val totN = Array.ofDim[Long](cur.length, k)
      val totS = Array.ofDim[Long](cur.length, k, sub)
      partials.foreach { case (s, c, n, a) =>
        totN(s)(c) += n
        var i = 0
        while (i < sub) { totS(s)(c)(i) += a(i); i += 1 }
      }
      for (s <- 0 until cur.length; c <- 0 until k if totN(s)(c) > 0) {
        var i = 0
        while (i < sub) {
          next(s)(c)(i) = Kmeans.meanQ(totS(s)(c)(i), totN(s)(c)); i += 1
        }
      }
      books = next
      it += 1
    }
    books
  }

  /** Exact integer argmin over one subspace's codebook, ties to the
    * lowest code (strict `<` scans in code order — the Kmeans.nearest
    * discipline).
    */
  @inline private def nearestAt(q: Array[Long], off: Int,
      book: Array[Array[Long]]): (Int, Long) = {
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < book.length) {
      val ctr = book(c)
      var d = 0L
      var i = 0
      while (i < ctr.length) {
        val t = q(off + i) - ctr(i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    (best, bestD)
  }

  /** PQ encode: one narrow pass, one output row per (vector, subspace)
    * with the chosen code and the exact subspace reconstruction d² (the
    * full-vector reconstruction error is their sum — subspaces are
    * orthogonal coordinate blocks).
    */
  def encode(qv: Dataset[KVec], books: Array[Array[Array[Long]]])
      : Dataset[(Long, Int, Int, Long)] = {
    import qv.sparkSession.implicits._
    val m = books.length
    qv.flatMap { v =>
      val sub = v.q.length / m
      (0 until m).map { s =>
        val (c, d) = nearestAt(v.q, s * sub, books(s))
        (v.id, s, c, d)
      }
    }
  }

  /** JVM-side naive twin of [[encode]] for spec differentials — plain
    * Scala over one vector, the same ops in the same order.
    */
  private[graft] def encodeOne(q: Array[Long],
      books: Array[Array[Array[Long]]]): Array[(Int, Long)] = {
    val m = books.length
    val sub = q.length / m
    Array.tabulate(m)(s => nearestAt(q, s * sub, books(s)))
  }

  /** PQ asymmetric-distance (ADC) top-3 search — the query side of the
    * compressed index: each probe precomputes its m×k table of exact
    * subspace distances to every codebook centroid (the "distance
    * table" of Jégou et al. §IV), and a corpus vector's approximate
    * distance is the SUM of m table lookups at its codes — the corpus
    * embeddings are never touched at query time, only their M codes.
    *
    * 100 TB shape: the LUT is nProbes×m×k longs (KBs) broadcast; the
    * corpus side flows narrow (codes ⋈ broadcast LUT), one map-combined
    * groupBy reduces m rows → 1 per (probe, vector), and only the
    * (probe, vector, adc) triples reach the per-probe top-k. Exact
    * BIGINT arithmetic end to end → fully oracle-checkable (unlike
    * IVF/LSH pruning, ADC over deterministic codebooks is exhaustive —
    * approximate in VALUE, not in candidate coverage).
    */
  def adcTop3(embeddings: DataFrame, m: Int = 4, k: Int = 8,
      nProbes: Int = 10): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = embeddings.sparkSession
    import spark.implicits._
    val qv = graft.ops.Caches.register(
      Kmeans.quantized(embeddings).persist())
    val books = initBooks(qv, m, k)
    val codes = Pq.encode(qv, books).toDF("vec_id", "sub", "code", "d2")
      .select("vec_id", "sub", "code")
    val lut = probeLut(qv.filter(_.id < nProbes).collect().sortBy(_.id),
      books).toDF("probe", "sub", "code", "pd2")
    top3ByAdc(codes.join(broadcast(lut), Seq("sub", "code"))
      .filter(col("probe") =!= col("vec_id"))
      .withColumnRenamed("vec_id", "nb"))
  }

  private val indexWritten =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Sidecar Bloom sizing: 16 bits/key at the expected-id count (FPP
    * ~5e-4, the [[graft.llm.Selection]] discipline). Fixed per index
    * family so an incrementally-extended sidecar stays bit-compatible
    * (merge = bitwise OR needs identical bit size and hash count) AND
    * byte-identical to a from-scratch build over the same id set. At
    * 100 TB the build job passes its real corpus-key cardinality here;
    * a 1e9-id index is ~2 GB of sidecar — one driver read per nightly
    * extend, vs broadcasting the ids themselves (impossible).
    */
  private val bloomExpectedIds = 1L << 16
  private val bloomNumBits = 1L << 20

  /** Writes the PQ half of a persisted index (`codes` + flattened
    * `books` tables + the id-Bloom sidecar `idbloom`) under `out` —
    * shared by every persisted-index builder so the encode/flatten
    * discipline exists once; `books` may be the iteration-0 devices
    * ([[initBooks]], oracle-exact) or the Lloyd-trained ones
    * ([[trainedBooks]], the production nightly build).
    */
  private def writePqTables(spark: org.apache.spark.sql.SparkSession,
      out: String, qv: Dataset[KVec],
      books: Array[Array[Array[Long]]]): Unit = {
    import spark.implicits._
    encode(qv, books).toDF("vec_id", "sub", "code", "d2")
      .select("vec_id", "sub", "code")
      .write.mode("overwrite").parquet(s"$out/codes")
    books.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.flatMap { case (ctr, c) =>
        ctr.zipWithIndex.map { case (q, i) => (s, c, i, q) }
      }
    }.toSeq.toDF("sub", "code", "i", "q")
      .write.mode("overwrite").parquet(s"$out/books")
    writeIdBloom(spark, out, Selection.bloomBuild(
      qv.map(_.id).toDF("vec_id"), org.apache.spark.sql.functions
        .col("vec_id"), bloomExpectedIds, bloomNumBits))
  }

  /** The id-Bloom sidecar is ONE parquet row (bytes + the build params
    * a later merge must reuse) — read by every [[extendIndex]] before
    * any distributed work touches the index.
    */
  private def writeIdBloom(spark: org.apache.spark.sql.SparkSession,
      indexRoot: String, bytes: Array[Byte],
      expected: Long = bloomExpectedIds,
      numBits: Long = bloomNumBits): Unit =
    writeIdBloomDir(spark, indexRoot, "idbloom", bytes, expected,
      numBits)

  /** Sidecar dirs are VERSIONED and immutable once the build lands the
    * legacy `idbloom` — maintenance writes run-unique `idbloom_v*`
    * dirs the manifest names, never overwrites in place (in-place
    * overwrite is the lost-OR-merge race two extends used to have).
    */
  private def writeIdBloomDir(spark: org.apache.spark.sql.SparkSession,
      indexRoot: String, name: String, bytes: Array[Byte],
      expected: Long, numBits: Long): Unit = {
    import spark.implicits._
    Seq((bytes, expected, numBits))
      .toDF("bf", "expected", "numbits")
      .write.mode("overwrite").parquet(s"$indexRoot/$name")
  }

  /** (bytes, expected, numbits) — the stored params, not the session
    * constants, drive every later merge: a build sized to its own
    * corpus cardinality stays bit-compatible with its extensions.
    */
  private def readIdBloomAt(spark: org.apache.spark.sql.SparkSession,
      indexRoot: String, m: IndexManifest)
      : (Array[Byte], Long, Long) = {
    val r = spark.read.parquet(s"$indexRoot/${m.idbloom}").head()
    (r.getAs[Array[Byte]]("bf"), r.getAs[Long]("expected"),
      r.getAs[Long]("numbits"))
  }

  /** The live sidecar bytes — spec surface for the byte-identity law. */
  private[graft] def liveIdBloomBytes(
      spark: org.apache.spark.sql.SparkSession, indexRoot: String)
      : Array[Byte] =
    readIdBloomAt(spark, indexRoot, liveIndexManifest(indexRoot))._1

  /** The committed layout of a persisted index — what one version of
    * the [[graft.io.CommitLog]] names: the compacted `codes` base plus
    * the `delta` dirs nightly extends have landed since (snapshot =
    * base ∪ deltas), the live id-Bloom sidecar dir, and (combined
    * indexes only) the `cells` base + its delta dirs. `books`/`cents`
    * are immutable from the build and deliberately NOT versioned.
    * Mirrors `Selection.StateManifest` — the dedup state and the ANN
    * index are the same table shape under maintenance, and round 19
    * live-race-proved this manifest-through-the-log discipline there.
    */
  private[graft] final case class IndexManifest(codes: String,
      delta: Seq[String], idbloom: String, cells: String,
      cellsDelta: Seq[String]) {
    def render: String =
      s"codes=$codes;delta=${delta.mkString(",")};" +
        s"idbloom=$idbloom;cells=$cells;" +
        s"cellsdelta=${cellsDelta.mkString(",")}"
    def dirNames: Seq[String] =
      Seq(codes, idbloom) ++ delta ++
        (if (cells.nonEmpty) Seq(cells) else Nil) ++ cellsDelta
  }

  private[graft] object IndexManifest {
    def parse(s: String): IndexManifest = {
      val kv = s.split(';').map(_.split("=", 2))
        .map(a => a(0) -> (if (a.length > 1) a(1) else "")).toMap
      def list(k: String): Seq[String] =
        kv.getOrElse(k, "").split(',').filter(_.nonEmpty).toSeq
      IndexManifest(kv("codes"), list("delta"), kv("idbloom"),
        kv.getOrElse("cells", ""), list("cellsdelta"))
    }
  }

  /** Pre-log layout: the original build's fixed dir names, honoring a
    * legacy `MANIFEST` pointer file if a pre-arbitration compaction
    * left one (those builds swapped a bare codes pointer).
    */
  private def legacyManifest(indexRoot: String): IndexManifest = {
    val mf = java.nio.file.Paths.get(indexRoot, "MANIFEST")
    val codes =
      if (java.nio.file.Files.exists(mf))
        new String(java.nio.file.Files.readAllBytes(mf),
          java.nio.charset.StandardCharsets.UTF_8).trim
      else "codes"
    val cells =
      if (java.nio.file.Files.exists(
          java.nio.file.Paths.get(indexRoot, "cells"))) "cells"
      else ""
    IndexManifest(codes, Nil, "idbloom", cells, Nil)
  }

  /** The LIVE layout: the commit log's head manifest when the root has
    * one, else the legacy build layout. Every reader resolves through
    * this once per query, so a maintenance commit is invisible to
    * in-flight searches (their dir list is already pinned).
    */
  private[graft] def liveIndexManifest(indexRoot: String): IndexManifest =
    graft.io.CommitLog.headSnapshot(indexRoot) match {
      case Some((_, payload)) => IndexManifest.parse(payload)
      case None => legacyManifest(indexRoot)
    }

  private def codesPaths(indexRoot: String, m: IndexManifest)
      : Seq[String] = (m.codes +: m.delta).map(n => s"$indexRoot/$n")

  private def cellsPaths(indexRoot: String, m: IndexManifest)
      : Seq[String] = (m.cells +: m.cellsDelta).map(n => s"$indexRoot/$n")

  /** The live codes table (base ∪ extend deltas) as one frame. */
  private[graft] def codesOf(spark: org.apache.spark.sql.SparkSession,
      indexRoot: String): DataFrame =
    spark.read.parquet(codesPaths(indexRoot, liveIndexManifest(indexRoot)): _*)

  /** The live cells table (base ∪ extend deltas) as one frame. */
  private[graft] def cellsOf(spark: org.apache.spark.sql.SparkSession,
      indexRoot: String): DataFrame =
    spark.read.parquet(cellsPaths(indexRoot, liveIndexManifest(indexRoot)): _*)

  /** In-JVM serialization of maintenance per root — the commit log
    * arbitrates cross-process; this keeps two threads of ONE session
    * from burning CAS retries against each other (the
    * `Selection.withMaintenanceLock` discipline).
    */
  private val indexLocks =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  private def withIndexLock[A](root: String)(body: => A): A =
    indexLocks.computeIfAbsent(root, _ => new AnyRef)
      .synchronized(body)

  /** First maintenance op on a pre-log index commits its legacy layout
    * as v0 so later arbitration has a base; losing the v0 CAS means
    * another migrator won with the identical deterministic layout.
    */
  private def migrateLegacyIndex(indexRoot: String): Unit =
    if (graft.io.CommitLog.currentVersion(indexRoot) < 0)
      graft.io.CommitLog.tryCommit(indexRoot, -1,
        legacyManifest(indexRoot).render)

  /** A rebased extend found nothing left to absorb (the winner already
    * carried every arrival) — abandon instead of committing an
    * identical manifest.
    */
  private object NothingPending extends RuntimeException
    with scala.util.control.NoStackTrace

  private def indexStateDirPattern(n: String): Boolean =
    n == "codes" || n == "cells" || n == "idbloom" ||
      n.startsWith("codes_v") || n.startsWith("codesdelta_v") ||
      n.startsWith("cells_v") || n.startsWith("cellsdelta_v") ||
      n.startsWith("idbloom_v")

  /** Every committed manifest's dir names, in version order — the
    * caller-side half of the shared [[graft.io.StateGc]] policy.
    */
  private def committedDirNames(indexRoot: String): Seq[Seq[String]] =
    graft.io.CommitLog.versions(indexRoot)
      .map(v => scala.util.Try(IndexManifest.parse(v._2)))
      .collect { case scala.util.Success(m) => m.dirNames }

  /** One-version-grace reclamation of SUPERSEDED index history —
    * policy in [[graft.io.StateGc.reapSuperseded]]; never-referenced
    * dirs go through the operator-invoked [[vacuumIndex]].
    */
  private def reapUnreferencedIndex(indexRoot: String): Unit =
    graft.io.StateGc.reapSuperseded(indexRoot,
      committedDirNames(indexRoot), indexStateDirPattern)

  /** Reclaims never-referenced index dirs (staged by a run that died
    * before its CAS) — policy in [[graft.io.StateGc.vacuum]]. The
    * referenced set includes the LIVE manifest's dirs: on a
    * built-but-never-maintained root the commit log is still empty
    * (migration happens on the first extend/compact) and the legacy
    * `codes`/`cells`/`idbloom` dirs ARE the index — a vacuum must
    * never age the live tables into "crash residue".
    */
  def vacuumIndex(indexRoot: String,
      olderThanMs: Long = 7L * 24 * 3600 * 1000): Seq[String] =
    graft.io.StateGc.vacuum(indexRoot,
      committedDirNames(indexRoot).flatten.toSet ++
        liveIndexManifest(indexRoot).dirNames,
      indexStateDirPattern, olderThanMs)

  /** COMPACTS the index — the maintenance job that follows a run of
    * nightly [[extendIndex]] commits, each of which lands its own
    * small delta dir (the lakehouse small-files problem, here on the
    * index itself): fold codes base ∪ deltas into ONE new
    * `targetFiles`-file generation (cells base ∪ deltas likewise when
    * the combined index has any), REBUILD the id-Bloom sidecar sized
    * to the live corpus (the long-run drift fix — extends OR-merge
    * into params frozen at build time; with unchanged params the
    * rebuild is byte-identical to the merged chain), and commit the
    * new manifest through the log. ARBITRATED: two compactors racing
    * serialize through the version CAS — the loser rebases on the
    * winner's snapshot instead of overwriting its generation dir, and
    * an extend that commits mid-compaction is never dropped (the
    * rebase re-reads its delta). Codes content is identical as a SET,
    * so search results are unchanged (PqSpec pins row identity and
    * the file counts).
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      indexRoot: String, targetFiles: Int = 4): Unit =
    withIndexLock(indexRoot) {
      migrateLegacyIndex(indexRoot)
      var staged: Seq[String] = Nil
      graft.io.CommitLog.commitStateRetry(indexRoot) { (cur, snap) =>
        // a retry abandons the loser's staged dirs (scratch discipline)
        staged.foreach(graft.io.Scratch.reap); staged = Nil
        val m = snap.map(IndexManifest.parse)
          .getOrElse(legacyManifest(indexRoot))
        val tag = f"${cur + 1}%06d-" +
          java.util.UUID.randomUUID().toString.take(8)
        val codesName = s"codes_v$tag"
        spark.read.parquet(codesPaths(indexRoot, m): _*)
          .repartition(targetFiles)
          .write.mode("overwrite").parquet(s"$indexRoot/$codesName")
        staged = Seq(s"$indexRoot/$codesName")
        val cellsName =
          if (m.cells.nonEmpty && m.cellsDelta.nonEmpty) {
            val n = s"cells_v$tag"
            spark.read.parquet(cellsPaths(indexRoot, m): _*)
              .repartition(math.max(1, targetFiles / 2))
              .write.mode("overwrite").parquet(s"$indexRoot/$n")
            staged :+= s"$indexRoot/$n"
            n
          } else m.cells
        // sidecar rebuild sized to the live corpus, from the codes this
        // job just rewrote (one narrow pushed sub=0 scan): stored
        // params are the floor, so small indexes rebuild byte-identical
        // and a grown one gets re-sized instead of saturating
        val (_, expected0, numBits0) = readIdBloomAt(spark, indexRoot, m)
        val ids = spark.read.parquet(s"$indexRoot/$codesName")
          .filter(org.apache.spark.sql.functions.col("sub") === 0)
          .select("vec_id")
        val (expected, numBits) = Selection.sizedToCorpus(ids.count(),
          floorKeys = expected0,
          bitsPerKey = math.max(1L, numBits0 / expected0))
        val bloomName = s"idbloom_v$tag"
        writeIdBloomDir(spark, indexRoot, bloomName,
          Selection.bloomBuild(ids,
            org.apache.spark.sql.functions.col("vec_id"),
            expected, numBits), expected, numBits)
        staged :+= s"$indexRoot/$bloomName"
        IndexManifest(codesName, Nil, bloomName, cellsName, Nil).render
      }
      staged = Nil // committed — these dirs are the live index now
      reapUnreferencedIndex(indexRoot)
    }

  /** Loads the flattened `books` table back into the m×k×(D/M) array.
    * All three dimensions are inferred from the rows themselves, so the
    * search never has to touch the corpus (or trust a caller) for
    * shape information the index already carries.
    */
  private def loadBooks(spark: org.apache.spark.sql.SparkSession,
      indexRoot: String): Array[Array[Array[Long]]] = {
    val rows = spark.read.parquet(s"$indexRoot/books").collect()
    val m = rows.map(_.getAs[Int]("sub")).max + 1
    val k = rows.map(_.getAs[Int]("code")).max + 1
    val sub = rows.map(_.getAs[Int]("i")).max + 1
    val books = Array.fill(m, k)(Array.ofDim[Long](sub))
    rows.foreach { r =>
      books(r.getAs[Int]("sub"))(r.getAs[Int]("code"))(
        r.getAs[Int]("i")) = r.getAs[Long]("q")
    }
    books
  }

  /** The first `nProbes` quantized probe vectors, id-ascending — the
    * only embeddings read any persisted search performs.
    */
  private def collectProbes(embeddings: DataFrame, nProbes: Int)
      : Array[KVec] = {
    import org.apache.spark.sql.functions.col
    Kmeans.quantized(embeddings.filter(col("vec_id") < nProbes))
      .collect().sortBy(_.id)
  }

  /** Shared ranking tail of every ADC leg: per-probe top-3 by exact
    * integer ADC, ties to the lower neighbor id.
    */
  private def top3ByAdc(perCodeHits: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe").orderBy(asc("adc"), asc("nb"))
    perCodeHits
      .groupBy("probe", "nb")
      .agg(sum(col("pd2")).as("adc"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("probe", "rn", "nb", "adc")
  }

  /** Per-probe m×k exact subspace distance table (Jégou §IV) — ONE
    * implementation shared by every ADC leg (in-query, persisted PQ,
    * persisted IVF+PQ), so tie-breaks and the ×1e7 integer plane cannot
    * silently diverge between the paths the shared oracle equates.
    */
  private def probeLut(probes: Array[KVec],
      books: Array[Array[Array[Long]]]): Seq[(Long, Int, Int, Long)] = {
    val m = books.length
    val sub = books(0)(0).length
    probes.toSeq.flatMap { p =>
      for (s <- 0 until m; c <- books(s).indices) yield {
        val ctr = books(s)(c)
        var d = 0L
        var i = 0
        while (i < ctr.length) {
          val t = p.q(s * sub + i) - ctr(i)
          d += t * t
          i += 1
        }
        (p.id, s, c, d)
      }
    }
  }

  /** Builds (once per JVM × corpus × params) and PERSISTS the PQ index
    * for `dir` as two parquet tables under one root — `codes` (vec_id,
    * sub, code: the compressed corpus) and `books` (sub, code, i, q:
    * the flattened codebooks) — and returns the root. This is the
    * operational shape of every production vector store: the index is
    * TRAINED AND WRITTEN by one job and SEARCHED by many later ones
    * that never see the raw embeddings. computeIfAbsent makes
    * concurrent callers block on the first build instead of racing a
    * half-written index; the memo (and the scratch tag) key on the
    * quantization params too, so a differently-shaped request can never
    * be served someone else's index.
    */
  def persistedIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, m: Int = 4, k: Int = 8): String =
    indexWritten.computeIfAbsent(s"$dir#pq:$m:$k", { _ =>
      val out = graft.io.Scratch.stable("pqindex_" +
        java.lang.Integer.toHexString(dir.hashCode) + s"_${m}_$k")
      val qv = Kmeans.quantized(graft.Tables(spark, dir, "embeddings"))
      writePqTables(spark, out, qv, initBooks(qv, m, k))
      out
    })

  /** Writes the IVF half of a persisted index (`cells` assignments +
    * flattened `cents` coarse centroids) under `out`.
    */
  private def writeIvfTables(spark: org.apache.spark.sql.SparkSession,
      out: String, qv: Dataset[KVec],
      cents: Array[Array[Long]]): Unit = {
    import spark.implicits._
    qv.map(v => (v.id, nearestAt(v.q, 0, cents)._1))
      .toDF("vec_id", "c")
      .write.mode("overwrite").parquet(s"$out/cells")
    cents.zipWithIndex.flatMap { case (ctr, c) =>
      ctr.zipWithIndex.map { case (q, i) => (c, i, q) }
    }.toSeq.toDF("c", "i", "q")
      .write.mode("overwrite").parquet(s"$out/cents")
  }

  /** Persists the COMBINED IVF+PQ index for `dir` — four tables under
    * one root: `cells` (vec_id, c: which inverted list each corpus
    * vector lives in), `cents` (c, i, q: the flattened coarse
    * centroids, needed at query time to pick probe cells), `codes` and
    * `books` (the PQ compression, as in [[persistedIndex]]). Both
    * quantizers use the deterministic iteration-0 devices (k lowest
    * vec_ids), so the ENTIRE search path — coarse assignment, probe
    * cell choice, ADC ranking — is exact-integer and SQL-expressible:
    * the combined query gets a FULL oracle, unlike the trained-IVF
    * path (whose pruning quality q_sim_ann_recall audits separately).
    */
  def persistedIvfPq(spark: org.apache.spark.sql.SparkSession,
      dir: String, k: Int = 8, m: Int = 4, kb: Int = 8): String =
    indexWritten.computeIfAbsent(s"$dir#ivfpq:$k:$m:$kb", { _ =>
      val out = graft.io.Scratch.stable("ivfpq_" +
        java.lang.Integer.toHexString(dir.hashCode) + s"_${k}_${m}_$kb")
      val qv = Kmeans.quantized(graft.Tables(spark, dir, "embeddings"))
      writeIvfTables(spark, out, qv, Kmeans.initCentroids(qv, k))
      writePqTables(spark, out, qv, initBooks(qv, m, kb))
      out
    })

  /** Builds the TRAINED combined index — full-dim Lloyd coarse
    * centroids and per-subspace Lloyd codebooks (vs the iteration-0
    * devices of [[persistedIvfPq]]) — into the SAME four-table layout,
    * so [[ivfPqTop3FromIndex]] searches both families unchanged. This
    * is the production nightly shape: train → persist trained books →
    * search from the index. Exposed un-memoized for the spec's planted
    * corpora; [[persistedIvfPqTrained]] is the memoized per-corpus
    * entry.
    */
  private[graft] def buildIvfPqTrained(
      spark: org.apache.spark.sql.SparkSession, out: String,
      embeddings: DataFrame, k: Int, m: Int, kb: Int,
      iters: Int): Unit = {
    // ONE quantized cache feeds coarse training, codebook training, and
    // both encode passes — the per-consumer quantization lineages (and
    // their separate persists) were four corpus passes for one input
    val qv = graft.ops.Caches.register(
      Kmeans.quantized(embeddings).persist())
    writeIvfTables(spark, out, qv, Kmeans.lloydQ(qv, k, iters)._1)
    writePqTables(spark, out, qv, trainedBooksQ(qv, m, kb, iters))
  }

  /** Memoized trained-index build for `dir`'s embeddings table.
    * Training (Lloyd) is not SQL-expressible, so the declared query
    * over this index is rows-only; its quality is pinned by PqSpec's
    * recall law — searched-from-trained-index recall ≥ the init-index
    * recall on a planted clustered corpus — and its plan by the same
    * index-only gate as the init family.
    */
  def persistedIvfPqTrained(spark: org.apache.spark.sql.SparkSession,
      dir: String, k: Int = 8, m: Int = 4, kb: Int = 8,
      iters: Int = 3): String =
    indexWritten.computeIfAbsent(s"$dir#ivfpqt:$k:$m:$kb:$iters", { _ =>
      val out = graft.io.Scratch.stable("ivfpqt_" +
        java.lang.Integer.toHexString(dir.hashCode) +
        s"_${k}_${m}_${kb}_$iters")
      buildIvfPqTrained(spark, out,
        graft.Tables(spark, dir, "embeddings"), k, m, kb, iters)
      out
    })

  /** IVF+PQ top-3 search FROM the persisted combined index — the full
    * production ANN query shape: the coarse centroids (k×D longs) and
    * codebooks load from their tables in two KB-sized driver collects,
    * each probe picks its `probeCells` nearest inverted lists
    * DRIVER-SIDE (k exact integer distances per probe), the `cells`
    * table prunes the corpus to those lists via a broadcast join, and
    * ADC ranks the surviving candidates from their persisted codes —
    * corpus embeddings are never read, candidate volume is
    * nProbes·probeCells·n/k, and the plan has no training stage.
    */
  /** Loads the flattened coarse centroids back into the k×D array —
    * KBs, one driver collect, shapes inferred from the rows.
    */
  private def loadCents(spark: org.apache.spark.sql.SparkSession,
      indexRoot: String): Array[Array[Long]] = {
    val centRows = spark.read.parquet(s"$indexRoot/cents").collect()
    val k = centRows.map(_.getAs[Int]("c")).max + 1
    val dim = centRows.map(_.getAs[Int]("i")).max + 1
    val cents = Array.fill(k)(Array.ofDim[Long](dim))
    centRows.foreach(r =>
      cents(r.getAs[Int]("c"))(r.getAs[Int]("i")) = r.getAs[Long]("q"))
    cents
  }

  def ivfPqTop3FromIndex(spark: org.apache.spark.sql.SparkSession,
      indexRoot: String, embeddings: DataFrame,
      nProbes: Int = 10, probeCells: Int = 3): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cents = loadCents(spark, indexRoot)
    val dim = cents(0).length
    val books = loadBooks(spark, indexRoot)
    val probes = collectProbes(embeddings, nProbes)
    val pcells = probes.toSeq.flatMap { p =>
      cents.indices.map { c =>
        val ctr = cents(c)
        var d = 0L
        var i = 0
        while (i < dim) { val t = p.q(i) - ctr(i); d += t * t; i += 1 }
        (d, c)
      }.sorted.take(probeCells).map { case (_, c) => (p.id, c) }
    }.toDF("probe", "pc")
    val lut = probeLut(probes, books).toDF("probe", "sub", "code", "pd2")
    // resolve the manifest ONCE for both tables: a maintenance commit
    // between two resolutions could pair new cells with old codes
    val m = liveIndexManifest(indexRoot)
    val cand = spark.read.parquet(cellsPaths(indexRoot, m): _*)
      .join(broadcast(pcells),
        col("c") === col("pc") && col("probe") =!= col("vec_id"))
      .select(col("probe"), col("vec_id").as("nb"))
    top3ByAdc(cand
      .join(spark.read.parquet(codesPaths(indexRoot, m): _*)
        .withColumnRenamed("vec_id", "nb"), Seq("nb"))
      .join(broadcast(lut), Seq("probe", "sub", "code")))
  }

  /** The arrivals NOT yet in the index — the delta [[extendIndex]]
    * encodes. Orientation is the 100 TB-critical part (verdict r16 #1):
    * the persisted id set is the BIG side (billions of ids) while the
    * nightly delta is the small one, so the index ids must never be
    * broadcast or collected. Three delta-bounded steps instead:
    *   1. Bloom prefilter — arrivals probe the persisted id-Bloom
    *      sidecar (a narrow codegen'd map; one driver read of the
    *      filter bytes, zero index scans). Negative = PROVEN new (a
    *      Bloom never false-negatives), so only the maybe-known
    *      residue — |delta ∩ index| plus ~5e-4 false positives —
    *      continues.
    *   2. Exact backstop — the index id column (one pushed `sub = 0`
    *      row per vector) STREAMS probe-side through a semi join whose
    *      broadcast build is that maybe-known residue.
    *   3. Arrivals anti-join the confirmed-known ids — again a
    *      delta-bounded broadcast build.
    * Both broadcasts are bounded by the delta, the index contributes
    * one narrow column scan, and nothing index-sized crosses the
    * driver or the network.
    *
    * The nominal delta is small, but a DEGENERATE feed (a full-corpus
    * replay after a crash, a merged backfill) can make the maybe-known
    * residue index-sized — broadcasting it would recreate the problem
    * this method exists to avoid. So the residue is COUNTED first (one
    * narrow job over the prefiltered delta) and above
    * `maxBroadcastIds` the method falls back to the shuffled exact
    * backstop: a plain left_anti exchanging both sides on vec_id (the
    * index contributes the same one narrow column). PqSpec parity-pins
    * the two branches (cap forced to 0) and gates the fallback plan
    * broadcast-free.
    */
  // change-detection key: a SHA-256 of the sidecar, NOT the bytes —
  // retaining the blob strongly per root would pin an index-sized
  // array (2 GB per 1e9 ids) in driver heap beside the broadcast
  // blocks for the JVM lifetime. The owning SparkContext rides along:
  // a handle minted by a since-stopped context must never be served to
  // a successor session in the same JVM (same root, unchanged digest —
  // the probe job would fail on the dead handle), so a context
  // mismatch re-broadcasts.
  private val idBloomBcCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[Byte], org.apache.spark.SparkContext,
      org.apache.spark.broadcast.Broadcast[Array[Byte]])]()

  private def sha256(bytes: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(bytes)

  private[graft] def pendingArrivals(
      spark: org.apache.spark.sql.SparkSession,
      indexRoot: String, embeddings: DataFrame,
      maxBroadcastIds: Long = -1L): DataFrame =
    pendingArrivalsAt(spark, indexRoot,
      liveIndexManifest(indexRoot), embeddings, maxBroadcastIds)

  /** [[pendingArrivals]] against an EXPLICIT snapshot manifest — the
    * rebase surface: a CAS-losing extend re-probes against the
    * WINNER's manifest, so the pending set can only shrink and every
    * arrival is encoded exactly once across racing extends.
    */
  private def pendingArrivalsAt(
      spark: org.apache.spark.sql.SparkSession,
      indexRoot: String, m: IndexManifest, embeddings: DataFrame,
      maxBroadcastIds: Long = -1L): DataFrame = {
    import org.apache.spark.sql.functions._
    val (bloom, _, _) = readIdBloomAt(spark, indexRoot, m)
    // broadcast HANDLE, not a plan literal: the id sidecar is sized to
    // the INDEX (2 GB per 1e9 ids) and a literal re-ships it in every
    // task binary of every probe job (see functions/BloomProbeBc).
    // Maintenance commits versioned idbloom_v* dirs, but the legacy
    // build layout still overwrites `idbloom` in place, so the cache
    // keys on a DIGEST of the bytes just read (one per root):
    // unchanged sidecar → reuse the handle; changed → unpersist the
    // superseded one (safe: every consumer of a maintenance call's
    // frames materializes within that call) and broadcast fresh, so a
    // serving session never accumulates index-sized blobs in the
    // block manager.
    val bloomDigest = sha256(bloom)
    val sc = spark.sparkContext
    val bloomBc = idBloomBcCache.compute(indexRoot, (_, prev) =>
      if (prev != null && java.util.Arrays.equals(prev._1, bloomDigest)
          && (prev._2 eq sc))
        prev
      else {
        // only unpersist a handle this LIVE context owns — a dead
        // context's blocks are gone with it
        if (prev != null && (prev._2 eq sc))
          scala.util.Try(prev._3.unpersist(blocking = false))
        (bloomDigest, sc, sc.broadcast(bloom))
      })._3
    val maybe = embeddings
      .filter(graft.functions.BloomProbeBc.mightContain(bloomBc,
        xxhash64(col("vec_id"))))
      .select("vec_id").distinct()
    val known0 = spark.read.parquet(codesPaths(indexRoot, m): _*)
      .filter(col("sub") === 0).select("vec_id")
    // byte-derived cap (Warehouse.broadcastRowCap): the broadcast rows
    // are the single-long id projection
    val idCap = graft.ops.Warehouse.broadcastRowCap(maybe.schema,
      maxBroadcastIds)
    val probeCap = math.min(idCap + 1, Int.MaxValue).toInt
    if (maybe.limit(probeCap).count() <= idCap) {
      val known = known0.join(broadcast(maybe), Seq("vec_id"),
        "left_semi")
      embeddings.join(broadcast(known), Seq("vec_id"), "left_anti")
    } else {
      embeddings.join(known0.hint("shuffle_merge"), Seq("vec_id"),
        "left_anti")
    }
  }

  /** INCREMENTAL index maintenance — the nightly job of a production
    * vector store: encode ONLY the vectors whose vec_id is not yet in
    * the persisted snapshot ([[pendingArrivals]] — Bloom prefilter
    * plus a delta-broadcast exact backstop; the index id set is never
    * the build side) and COMMIT their codes as a delta dir plus the
    * OR-merged sidecar as a versioned dir, ARBITRATED through the
    * commit log: a CAS-losing extend re-probes against the winner's
    * manifest (the pending set only shrinks), so two racing extends
    * serialize in winner order and every arrival is encoded exactly
    * once — and an extend can no longer drop appends under a
    * concurrent compaction (the pre-arbitration ATOMIC_MOVE swap
    * could). The codebooks are immutable once trained (retraining
    * would silently re-code the old corpus). Because the iteration-0
    * codebooks come from the k lowest vec_ids, an index built on any
    * id-prefix of the corpus and then extended is BYTE-IDENTICAL to
    * one built on the full corpus — which is what lets
    * q_sim_ann_pq_incremental share the full-build ADC oracle.
    */
  def extendIndex(spark: org.apache.spark.sql.SparkSession,
      indexRoot: String, embeddings: DataFrame): Unit =
    extendImpl(spark, indexRoot, embeddings, withCells = false)

  /** INCREMENTAL maintenance for the COMBINED IVF+PQ index: a new
    * arrival needs BOTH halves appended — its coarse-cell assignment
    * (the coarse centroids are immutable like the codebooks; a search
    * that probes cells would silently never see a vector missing from
    * `cells`) and its PQ codes, plus the sidecar merge. Same
    * [[pendingArrivals]] delta discipline; the whole lifecycle —
    * prefix build, extend, compact, replay — is pinned by
    * q_sim_ann_ivfpq_incremental under the full combined oracle.
    */
  def extendIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      indexRoot: String, embeddings: DataFrame): Unit =
    extendImpl(spark, indexRoot, embeddings, withCells = true)

  private def extendImpl(spark: org.apache.spark.sql.SparkSession,
      indexRoot: String, embeddings: DataFrame,
      withCells: Boolean): Unit = withIndexLock(indexRoot) {
    import spark.implicits._
    migrateLegacyIndex(indexRoot)
    // books/cents are immutable from the build — load once, outside
    // the retry loop. cents must be a PLAIN array here, not a lazy
    // val: a lazy local rides into the assignment closure as its
    // unevaluated LazyRef and would force loadCents (a driver-side
    // spark.read) on an executor.
    val books = loadBooks(spark, indexRoot)
    val cents: Array[Array[Long]] =
      if (withCells) loadCents(spark, indexRoot) else null
    var staged: Seq[String] = Nil
    try {
      graft.io.CommitLog.commitStateRetry(indexRoot) { (cur, snap) =>
        // a retry abandons the loser's staged dirs
        staged.foreach(graft.io.Scratch.reap); staged = Nil
        val m = snap.map(IndexManifest.parse)
          .getOrElse(legacyManifest(indexRoot))
        // persisted: the emptiness probe, the encode, the cells
        // assignment, and the sidecar build would otherwise each
        // recompute the anti join
        val newQv = Kmeans.quantized(
          pendingArrivalsAt(spark, indexRoot, m, embeddings)).persist()
        try {
          if (newQv.isEmpty) throw NothingPending
          val tag = f"${cur + 1}%06d-" +
            java.util.UUID.randomUUID().toString.take(8)
          val codesName = s"codesdelta_v$tag"
          Pq.encode(newQv, books)
            .toDF("vec_id", "sub", "code", "d2")
            .select("vec_id", "sub", "code")
            .write.mode("overwrite").parquet(s"$indexRoot/$codesName")
          staged = Seq(s"$indexRoot/$codesName")
          val cellsDelta =
            if (withCells) {
              val n = s"cellsdelta_v$tag"
              newQv.map(v => (v.id, nearestAt(v.q, 0, cents)._1))
                .toDF("vec_id", "c")
                .write.mode("overwrite").parquet(s"$indexRoot/$n")
              staged :+= s"$indexRoot/$n"
              Seq(n)
            } else Nil
          val (curB, expected, numBits) =
            readIdBloomAt(spark, indexRoot, m)
          val bloomName = s"idbloom_v$tag"
          writeIdBloomDir(spark, indexRoot, bloomName,
            Selection.bloomMerge(curB,
              Selection.bloomBuild(newQv.map(_.id).toDF("vec_id"),
                org.apache.spark.sql.functions.col("vec_id"),
                expected, numBits)), expected, numBits)
          staged :+= s"$indexRoot/$bloomName"
          m.copy(delta = m.delta :+ codesName, idbloom = bloomName,
            cellsDelta = m.cellsDelta ++ cellsDelta).render
        } finally newQv.unpersist()
      }
      staged = Nil // committed
      reapUnreferencedIndex(indexRoot)
    } catch {
      case NothingPending => staged.foreach(graft.io.Scratch.reap)
    }
  }

  /** Builds the COMBINED index on the id-prefix half, extends it to the
    * full corpus ([[extendIvfPqIndex]] — cells AND codes), COMPACTS the
    * append-fragmented codes behind the manifest swap, then replays the
    * extend as a no-op — the full production index lifecycle, memoized
    * as one unit. Every device is iteration-0 and prefix-stable, so the
    * searched result is byte-identical to a one-shot full build and the
    * lifecycle query shares the combined full oracle.
    */
  def persistedIvfPqIncremental(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      k: Int = 8, m: Int = 4, kb: Int = 8): String =
    indexWritten.computeIfAbsent(s"$dir#ivfpqinc:$k:$m:$kb", { _ =>
      import org.apache.spark.sql.functions._
      val out = graft.io.Scratch.stable("ivfpqinc_" +
        java.lang.Integer.toHexString(dir.hashCode) + s"_${k}_${m}_$kb")
      val emb = graft.Tables(spark, dir, "embeddings")
      val half = emb.agg(max(col("vec_id"))).head().getLong(0) / 2
      val prefix = emb.filter(col("vec_id") <= half)
      require(prefix.limit(math.max(k, kb) + 1).count() >=
        math.max(k, kb),
        s"id-prefix <= $half holds fewer than max(k,kb) vectors")
      val pqv = Kmeans.quantized(prefix)
      writeIvfTables(spark, out, pqv, Kmeans.initCentroids(pqv, k))
      writePqTables(spark, out, pqv, initBooks(pqv, m, kb))
      extendIvfPqIndex(spark, out, emb)
      compactIndex(spark, out, targetFiles = 4)
      // a REPLAYED extend must be a no-op, through the compacted layout
      extendIvfPqIndex(spark, out, emb)
      out
    })

  /** Builds the persisted PQ index on the id-prefix HALF of the corpus,
    * then [[extendIndex]]s it to the full corpus — memoized as one unit
    * so the build+extend sequence runs once per JVM × corpus × params.
    */
  def persistedIndexIncremental(spark: org.apache.spark.sql.SparkSession,
      dir: String, m: Int = 4, k: Int = 8): String =
    indexWritten.computeIfAbsent(s"$dir#pqinc:$m:$k", { _ =>
      import org.apache.spark.sql.functions._
      val out = graft.io.Scratch.stable("pqinc_" +
        java.lang.Integer.toHexString(dir.hashCode) + s"_${m}_$k")
      val emb = graft.Tables(spark, dir, "embeddings")
      val half = emb.agg(max(col("vec_id"))).head().getLong(0) / 2
      val prefix = emb.filter(col("vec_id") <= half)
      // the byte-identity invariant (prefix build + extend == full
      // build) needs initBooks to see the SAME k lowest ids both ways;
      // a sparse-id or tiny corpus could leave the id-halved prefix
      // with fewer than k vectors and silently train different books
      require(prefix.limit(k + 1).count() >= k,
        s"id-prefix <= $half holds fewer than k=$k vectors")
      val pqv = Kmeans.quantized(prefix)
      writePqTables(spark, out, pqv, initBooks(pqv, m, k))
      extendIndex(spark, out, emb)
      // a REPLAYED extend must be a no-op (the anti join sees every id)
      extendIndex(spark, out, emb)
      out
    })

  /** ADC top-3 search FROM the persisted index: codebooks load from the
    * `books` table (m×k×(D/M) rows — KBs, one driver collect), probe
    * vectors are the only embeddings read (scan-pruned by vec_id), and
    * the corpus flows exclusively as its persisted codes. The search
    * plan contains NO training or encode stage — byte-identical results
    * to [[adcTop3]] because the init/codebook/encode devices are all
    * exact-integer and the index write round-trips longs losslessly.
    */
  def adcTop3FromIndex(spark: org.apache.spark.sql.SparkSession,
      indexRoot: String, embeddings: DataFrame,
      nProbes: Int = 10): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val books = loadBooks(spark, indexRoot)
    val probes = collectProbes(embeddings, nProbes)
    val lut = probeLut(probes, books).toDF("probe", "sub", "code", "pd2")
    top3ByAdc(codesOf(spark, indexRoot)
      .join(broadcast(lut), Seq("sub", "code"))
      .filter(col("probe") =!= col("vec_id"))
      .withColumnRenamed("vec_id", "nb"))
  }
}
