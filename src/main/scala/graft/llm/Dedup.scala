package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Near-duplicate detection for document corpora (driver north star):
  * exact (hash-groupBy, see q_dedup_exact), MinHash+LSH over shingles,
  * 64-bit SimHash with banded candidate generation, and exact n-gram
  * Jaccard verification. Everything is seeded/deterministic.
  */
object Dedup {
  /** Word n-gram shingles as strings (default 3-gram), via a higher-order
    * transform over the token array — codegen'd, no UDF.
    */
  def withShingles(docs: DataFrame, n: Int = 3,
      textCol: String = "text"): DataFrame =
    docs
      .withColumn("__toks", split(col(textCol), " "))
      .withColumn("shingles",
        when(size(col("__toks")) >= n,
          expr(s"array_distinct(transform(sequence(0, size(__toks) - $n), " +
            s"i -> concat_ws(' ', slice(__toks, i + 1, $n))))"))
          .otherwise(array(concat_ws(" ", col("__toks")))))
      .drop("__toks")

  /** splitmix64 finalizer — the per-table hash family for MinHash. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature over a doc's 64-bit shingle hashes: for table t,
    * min over shingles of splitmix64(h ⊕ seed_t). Primitive loops — one
    * pass per doc, no matrix, no ml.Vector boxing.
    *
    * `mixed = false` swaps the family to plain min(h ⊕ seed_t) with
    * small per-table seeds (t·1000003): a degenerate-but-valid MinHash
    * family whose every step is SQL-expressible, so the oracle twin
    * (q_dedup_near_check) can drive this SAME code path against DuckDB.
    * xor is injective, so candidate collisions still imply a shared
    * shingle hash in both families.
    */
  /** Primitive MinHash kernel — shared by the codegen'd
    * [[graft.functions.MinhashSig]] expression (the hot path) and spec
    * differentials. Public object method so generated Java can call it.
    */
  def sigKernel(hs: Array[Long], numTables: Int, seed: Long,
      mixed: Boolean): Array[Long] = {
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      val st =
        if (mixed) seed + t.toLong * 0x9e3779b97f4a7c15L
        else seed + t.toLong * 1000003L
      var m = Long.MaxValue
      var i = 0
      while (i < hs.length) {
        val x = hs(i) ^ st
        val v = if (mixed) mix64(x) else x
        if (v < m) m = v
        i += 1
      }
      out(t) = m
      t += 1
    }
    out
  }

  /** Exact Jaccard over two hashed-shingle sets — primitive kernel for
    * the codegen'd [[graft.functions.JaccardHash]] expression (sorted
    * membership array instead of a boxed Set; identical arithmetic:
    * |distinct a ∩ b| over |distinct a| + |b| − inter, matching the
    * original Set-based UDF bit for bit).
    */
  def jaccardKernel(a: Array[Long], b: Array[Long]): Double = {
    val ac = a.clone()
    java.util.Arrays.sort(ac)
    var saSize = 0
    var i = 0
    while (i < ac.length) {
      if (i == 0 || ac(i) != ac(i - 1)) saSize += 1
      i += 1
    }
    var inter = 0
    i = 0
    while (i < b.length) {
      if (java.util.Arrays.binarySearch(ac, b(i)) >= 0) inter += 1
      i += 1
    }
    inter.toDouble / (saSize + b.length - inter)
  }

  /** MinHash-LSH near-dup candidate pairs (Jaccard distance ≤ maxDist),
    * seeded/deterministic. Shingle set → 64-bit shingle hashes → per-table
    * MinHash signature → candidates = pairs colliding in ≥1 of `numTables`
    * tables (OR-amplification) → EXACT Jaccard verification on the hashed
    * shingle sets. Returns (doc_a, doc_b, jaccard_dist), doc_a < doc_b.
    *
    * Scale shape: the band self-join touches |docs|·numTables signature
    * rows, never the n² pair space; verification cost is proportional to
    * the candidate count. The verify joins are plain shuffle joins keyed
    * on doc_a/doc_b — the shingle-hash table is corpus-sized and must
    * never be broadcast or persisted per call (deterministic recompute is
    * the cheaper currency at 100 TB).
    */
  def minhashPairs(docs: DataFrame, maxDist: Double = 0.8,
      numTables: Int = 5, seed: Long = 42L,
      shingleFamily: String = "xxh",
      mixed: Boolean = true): DataFrame = {
    // DISK_ONLY: the table is corpus-sized (must never pin executor
    // memory or be broadcast), but three lineages read it — banding plus
    // both verify joins — so spilling it to local disk beats recomputing
    // the shingle+hash pass per lineage. The shingle set is built by the
    // fused per-row kernel (graft.functions.ShingleHashes, codegen'd):
    // tokenize/slice/distinct/hash straight off the text bytes — no
    // per-shingle string allocation in the pass that touches every
    // document of the corpus.
    val hashed = graft.ops.Caches.register(docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.TextKernels.shingleHashCol(3, shingleFamily)(
          col("text")).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY))
    val banded = hashed
      .withColumn("sig", graft.functions.MinhashSig
        .sig(numTables, seed, mixed)(col("sh")))
      .select(col("doc_id"), posexplode(col("sig")).as(Seq("table", "mh")))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.table") === col("b.table") && col("a.mh") === col("b.mh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(hashed.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(hashed.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("sh", "sh_b"), "doc_b")
      .withColumn("jaccard_dist",
        lit(1.0) - graft.functions.JaccardHash(col("sh_a"), col("sh_b")))
      .filter(col("jaccard_dist") <= maxDist)
      .select("doc_a", "doc_b", "jaccard_dist")
  }

  /** 64-bit SimHash over tokens (deterministic 2×murmur3 per token). */
  val simhash64: UserDefinedFunction = udf { toks: Seq[String] =>
    val acc = new Array[Int](64)
    toks.foreach { t =>
      val h1 = scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c)
      val h2 = scala.util.hashing.MurmurHash3.stringHash(t, 0x85ebca6b)
      val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** SimHash near-dup pairs: 4×16-bit band join for candidates, exact
    * Hamming verification ≤ maxHamming. Scales as #candidate-collisions,
    * not #pairs.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 12): DataFrame =
    // null-text guard like the sibling kernels (minhashPairs,
    // ngramJaccardPairs): split(null) is null and the simhash UDF
    // would NPE on it — a null-text doc has no signature and joins
    // nothing
    bandedHammingPairs(docs.filter(col("text").isNotNull)
      .withColumn("sim", simhash64(split(col("text"), " "))), maxHamming)

  /** The banding + candidate-join + Hamming-verify leg of
    * [[simhashPairs]], over any (doc_id, sim: long) frame — split out so
    * an oracle-expressible signature (q_dedup_simhash_bands' md5-derived
    * sim) can pin this exact plumbing against DuckDB while the murmur
    * signature stays rows-only.
    */
  def bandedHammingPairs(sh: DataFrame, maxHamming: Int): DataFrame = {
    val banded = sh.select(col("doc_id"), col("sim"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sim"), b * 16).bitwiseAND(lit(0xffffL))
            .as("key"))): _*))
        .as("bk"))
      .select(col("doc_id"), col("sim"), col("bk.band"), col("bk.key"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
      .distinct()
    cand.withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Connected components over an undirected near-duplicate pair graph —
    * the "keep one per duplicate cluster" primitive.
    *
    * PRECONDITION: every pair endpoint must appear in `vertices` (callers
    * derive pairs from the same filtered doc set, as q_dedup_cluster
    * does). Endpoints outside `vertices` would propagate labels on the
    * driver path but be dropped by the join on the distributed path — the
    * two paths agree exactly only under the precondition.
    *
    * Hybrid, same trade as the KR solver (hic/Kr): the near-dup EDGE list
    * is orders of magnitude smaller than the corpus (it's the near-dup
    * pairs, not the documents), so when it fits a driver budget
    * (`maxDriverEdges`) an exact union-find on the driver replaces any
    * distributed machinery — one job to collect the edges, one broadcast
    * join to label the corpus-sized vertex set. The 1M default is sized
    * for the BOXED driver representation (collected Rows + a HashMap of
    * boxed longs ≈ 100-200 B/edge → low hundreds of MB worst-case), not
    * the 16 B/edge raw size.
    *
    * Above the cap, partition-local union-find CONTRACTION: each round
    * replaces every partition's edge slice with its spanning star forest
    * (one `(v, local-min-root)` edge per non-root vertex — connectivity
    * preserved, size collapses to ≤ distinct-vertices-per-partition),
    * then a NARROW 8-way coalesce merges neighboring forests for the
    * next round. log₈(P) one-stage rounds, zero shuffles. At the default
    * floor (1 partition) the final round's union-find sees the whole
    * reduced forest and is globally exact — so the distributed path is
    * ~3 narrow stages end-to-end instead of O(diameter) shuffle rounds.
    * A task is bounded by its slice's reduced forest (≤ one entry per
    * distinct vertex); for corpora where even the global forest exceeds
    * one task, `SPARK_GRAFT_CC_FLOOR`>1 stops the coalesce early and
    * finishes with min-label propagation (maxIters-guarded) over the
    * already-forest-sized remainder — whose diameter the contraction has
    * collapsed to O(floor) star hops. All paths are deterministic (min
    * is order-free: per-partition roots differ across partitionings, but
    * the final label is the component-wide min either way) and agree
    * exactly (spec-pinned).
    *
    * Returns (doc_id, cluster) with cluster = min doc_id of the component.
    */
  def connectedComponents(vertices: DataFrame, pairs: DataFrame,
      maxIters: Int = 50,
      // dev knob: SPARK_GRAFT_CC_MAXDRIVER=0 forces the distributed
      // min-label-propagation branch on fixtures whose edge lists would
      // otherwise take the driver union-find path (the 64× scale probe —
      // both branches are pinned label-identical in DomainSpec)
      maxDriverEdges: Long = sys.env.get("SPARK_GRAFT_CC_MAXDRIVER")
        .flatMap(_.toLongOption).getOrElse(1000000L),
      // contraction floor: coalesce stops at this many partitions; >1
      // switches the final stage from one-task exact union-find to
      // min-label propagation over the reduced forest (the 100 TB escape
      // hatch for vertex sets too big for one task)
      contractFloor: Int = sys.env.get("SPARK_GRAFT_CC_FLOOR")
        .flatMap(_.toIntOption).getOrElse(1)): DataFrame = {
    // DISK_ONLY: the pair lineage (e.g. the n-gram inverted-index join) is
    // the expensive part — materialize it once for the count + (collect |
    // loop) instead of recomputing it per consumer
    // cast ONCE for both branches: the driver path reads getLong and
    // previously crashed on int-typed pair columns the distributed
    // path's defensive cast accepted — a branch-dependent crash for
    // the same data
    val pairList = graft.ops.Caches.register(
      pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY))
    if (pairList.count() <= maxDriverEdges) {
      val collected = pairList.collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val spark = vertices.sparkSession
      import spark.implicits._
      val labelDf = unionFindLabels(collected).toSeq
        .toDF("doc_id", "__root")
      return vertices.join(broadcast(labelDf), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("__root"), col("doc_id")).as("cluster"))
    }
    val spark = vertices.sparkSession
    import spark.implicits._
    // contraction rounds: per-partition union-find → star forest, then a
    // narrow 8-way coalesce; edge count collapses geometrically with no
    // shuffle and no per-round action
    val floor = math.max(contractFloor, 1)
    var cur = pairList.select(col("doc_a"), col("doc_b"))
      .as[(Long, Long)] // already cast long at pairList
    var parts = cur.rdd.getNumPartitions
    while (parts > floor) {
      parts = math.max(parts / 8, floor)
      cur = cur.mapPartitions(it =>
          unionFindLabels(it.toArray).iterator.filter(p => p._1 != p._2))
        .coalesce(parts)
    }
    if (floor == 1) {
      // the single remaining partition holds the whole reduced forest:
      // its union-find is globally exact. No broadcast hint — the label
      // table is O(edge-involved vertices) and may dwarf the driver at
      // corpus scale; AQE picks broadcast when it actually fits.
      val labelDf = graft.ops.Caches.register(
        cur.mapPartitions(it => unionFindLabels(it.toArray).iterator)
          .toDF("doc_id", "__root").persist())
      return vertices.join(labelDf, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("__root"), col("doc_id")).as("cluster"))
    }
    // floor > 1: finish with min-label propagation over the reduced
    // forest (≤ one edge per distinct vertex, diameter collapsed to
    // O(floor) star hops — so the maxIters guard is generous, not tight)
    val reduced = cur.toDF("doc_a", "doc_b")
    val edges = graft.ops.Caches.register(
      reduced.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(reduced.select(col("doc_b").as("src"),
          col("doc_a").as("dst")))
        .persist())
    var labels = vertices.select(col("doc_id"), col("doc_id").as("root"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("doc_id", "src"), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg(min(col("root")).as("nroot"))
      val next = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("root"), coalesce(col("nroot"), col("root")))
            .as("root"))
        .localCheckpoint(true)
      val changed = next
        .join(labels.withColumnRenamed("root", "prev"), "doc_id")
        .filter(col("root") =!= col("prev")).count()
      // the convergence count was the previous label table's last
      // consumer — release its checkpoint blocks now (plain unpersist is
      // a no-op on localCheckpoints)
      graft.ops.Caches.releaseLocalCheckpoint(labels)
      labels = next
      converged = changed == 0L
      iter += 1
    }
    // a silently-truncated propagation would return split clusters that
    // LOOK valid — fail loudly instead (simple min-propagation needs
    // component-diameter rounds; raise maxIters for pathological graphs)
    if (!converged) graft.ops.Caches.releaseLocalCheckpoint(labels)
    require(converged,
      s"connectedComponents did not converge in $maxIters iterations")
    // drain-immune handoff of the final labels to the returned plan
    // (a registered checkpoint dies under a concurrent caller's drain)
    graft.ops.Caches.parquetHandoff(labels, "cc_labels")
      .select(col("doc_id"), col("root").as("cluster"))
  }

  /** Exact union-find labeling of the edge-involved vertices: map from
    * vertex → min doc_id of its component (vertices with no edges are
    * absent — they label themselves downstream). Union-by-min + path
    * halving; pure and order-free, so property-testable without Spark
    * (KernelProps pins it against a brute-force closure).
    */
  private[graft] def unionFindLabels(
      edges: Array[(Long, Long)]): Array[(Long, Long)] = {
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrDefault(x, x) != x) {
        val p = parent.get(x)
        parent.put(x, parent.getOrDefault(p, p)) // path halving
        x = parent.get(x)
      }
      x
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      // union by min keeps the canonical label = min doc_id directly
      if (ra < rb) parent.put(rb, ra)
      else if (rb < ra) parent.put(ra, rb)
    }
    edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      .map(v => (v, find(v)))
  }

  /** Exact n-gram Jaccard for pairs sharing ≥1 shingle: inverted index →
    * pair intersection counts → |A∩B| / (|A|+|B|−|A∩B|).
    *
    * Shingles in more than `maxDf` documents are dropped from BOTH the
    * set sizes and the intersections (stopword-shingle removal): a
    * shingle shared by d docs fans out to d²/2 join rows, so one hot
    * stopword trigram in a web corpus is a skew bomb — the cutoff bounds
    * the worst inverted-index key at maxDf by construction.
    *
    * `maxCandidatesPerDoc` (default off) is the production knob for
    * pathological near-clone clusters, whose candidate volume is
    * inherently quadratic in cluster size even after the df cutoff: keep
    * a pair only if it ranks in the top-k by intersection count
    * (ties → lower partner id) for AT LEAST ONE of its endpoints. This
    * bounds the per-doc survivor list — and with it the sizes join and
    * the output — at 2k·|docs| total rows (union semantics: a pair kept
    * for either endpoint survives, so each doc can contribute its own
    * top-k AND appear in up to k other docs' lists). Exact duplicates have the
    * maximal intersection with their clones, so they rank first and
    * survive any k ≥ clone-cluster size − 1 (spec-pinned); the rows a cap
    * drops are exactly the weakest-overlap candidates a dedup pipeline
    * would discard downstream anyway.
    */
  /** Bounded posting-list aggregate: collects at most `cap` doc_ids per
    * shingle while counting EXACTLY — a group past the cap finishes as
    * the empty list (its exact df exceeds maxDf, so it is dropped from
    * sizes and intersections alike). The buffer is capped at `cap`
    * entries in every partial, so a stopword shingle seen by millions
    * of docs costs each map-side partial ≤ cap longs — the skew bomb is
    * absorbed BEFORE the shuffle, where the old groupBy+join design
    * only bounded it after the df filter. List order is
    * partition-dependent, but a kept list (n ≤ cap) is COMPLETE, so
    * every downstream consumer (pair set, sizes) is order-free.
    */
  private[graft] final class CappedDocList(cap: Int)
      extends org.apache.spark.sql.expressions
        .Aggregator[Long, (Long, List[Long]), Seq[Long]] {
    import org.apache.spark.sql.{Encoder, Encoders}
    override def zero: (Long, List[Long]) = (0L, Nil)
    override def reduce(b: (Long, List[Long]), x: Long): (Long, List[Long]) =
      (b._1 + 1L, if (b._1 < cap) x :: b._2 else b._2)
    override def merge(a: (Long, List[Long]),
        b: (Long, List[Long])): (Long, List[Long]) =
      (a._1 + b._1, (a._2 ++ b._2).take(cap))
    override def finish(b: (Long, List[Long])): Seq[Long] =
      if (b._1 > cap) Nil else b._2
    override def bufferEncoder: Encoder[(Long, List[Long])] =
      Encoders.product[(Long, List[Long])]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** `probeDocs`, when given, is the frame the sizes-join capacity probe
    * counts instead of `docs` — callers whose `docs` carries an
    * expensive derived filter (the ≥3-token tokenize) pass the UNDERLYING
    * table so the probe is a cheap pruned scan of `doc_id` alone. Any
    * SUPERSET of `docs` is sound: an over-count can only demote
    * broadcast to the scale-safe shuffle, never the reverse.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3,
      minJaccard: Double = 0.0, maxDf: Int = 200,
      maxCandidatesPerDoc: Int = Int.MaxValue,
      probeDocs: Option[DataFrame] = None): DataFrame = {
    // (doc_id, sh) arrives unique straight from the fused per-row kernel
    // (ShingleHashes: tokenize/slice/distinct/xxhash64 off the text
    // bytes, no per-shingle string allocation). Shingle IDENTITY, not
    // value, drives everything downstream (df counts, posting lists, set
    // sizes), so the one corpus-sized shuffle below moves 8-byte longs
    // instead of n-word strings. (A 64-bit collision would merge two
    // shingles' posting lists — ~|shingles|²/2⁶⁴, the standard
    // shingle-hashing trade every large-scale dedup makes; the oracle
    // gate pins the actual corpus collision-free.)
    val shAll = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(graft.functions.TextKernels.shingleHashCol(n, "xxh")(
          col("text"))).as("sh"))
    // ONE sh-keyed shuffle builds df-filtered posting lists directly:
    // the capped aggregate counts df exactly while bounding every
    // partial at maxDf doc_ids, so a stopword shingle is absorbed
    // map-side (the old design's groupBy-count + re-join paid the
    // exchange + a second pass over the index for the same set). The
    // posting table is ≤ maxDf longs per distinct shingle — DISK_ONLY:
    // corpus-sized, must never pin executor memory; it feeds the pair
    // expansion AND the set sizes.
    val cappedAgg = udaf(new CappedDocList(maxDf),
      org.apache.spark.sql.Encoders.scalaLong)
    val posting = graft.ops.Caches.register(shAll.groupBy("sh")
      .agg(cappedAgg(col("doc_id")).as("ds"))
      .filter(size(col("ds")) > 0)
      .select("ds")
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY))
    val sizes = posting.select(explode(col("ds")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // pair expansion straight off the bounded lists (≤ maxDf²/2 rows
    // per shingle, the same volume the old self-join produced) — no
    // join, no second corpus shuffle
    val inter = posting
      .select(explode(col("ds")).as("doc_a"), col("ds"))
      .select(col("doc_a"), explode(col("ds")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    val capped =
      if (maxCandidatesPerDoc == Int.MaxValue) inter
      else {
        // per-endpoint row_number over the candidate list being bounded:
        // the window's partition IS the list the cap exists to shrink, so
        // its cost is the pre-cap candidate count — strictly less work
        // than letting those rows reach the sizes join and the output
        val wa = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_a").orderBy(desc("inter"), asc("doc_b"))
        val wb = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_b").orderBy(desc("inter"), asc("doc_a"))
        inter
          .withColumn("__ra", row_number().over(wa))
          .withColumn("__rb", row_number().over(wb))
          .filter(col("__ra") <= maxCandidatesPerDoc ||
            col("__rb") <= maxCandidatesPerDoc)
          .drop("__ra", "__rb")
      }
    // Never let AQE pick the build side: Catalyst can't see the explode
    // fan-out, so it underestimates the PAIR side and would try to
    // broadcast IT (driver OOM at 8×, observed). The sizes side is
    // per-doc — corpus-sized at scale, so it must not broadcast
    // unconditionally either — but its row count is bounded by the doc
    // count, which one narrow limit-capped scan bounds cheaply (the
    // deltaSide discipline): below the cap the two size projections
    // broadcast and the (candidate-heavy) pair table never exchanges;
    // above it the scale-safe shuffle-hash joins stand.
    // byte-derived cap (Warehouse.broadcastRowCap): the broadcast rows
    // are the two-long (doc_id, sz) projections — the historical 1<<22
    // row cutover, now stated in bytes
    val sizesCap = graft.ops.Warehouse.broadcastRowCap(
      sizes.select(col("doc_id"), col("sz")).schema)
    val sizesSide: DataFrame => DataFrame =
      if (probeDocs.getOrElse(docs).select("doc_id")
          .limit(math.min(sizesCap + 1, Int.MaxValue).toInt).count()
          <= sizesCap)
        org.apache.spark.sql.functions.broadcast
      else _.hint("shuffle_hash")
    capped
      .join(sizesSide(sizes.select(col("doc_id").as("doc_a"),
        col("sz").as("sza"))), "doc_a")
      .join(sizesSide(sizes.select(col("doc_id").as("doc_b"),
        col("sz").as("szb"))), "doc_b")
      .withColumn("jaccard", col("inter").cast("double") /
        (col("sza") + col("szb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "inter", "jaccard")
  }
}
