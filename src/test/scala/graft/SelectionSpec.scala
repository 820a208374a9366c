package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-14 data-selection operators (llm.Selection): Bloom-filter
  * incremental corpus membership and DSIR-style importance weights.
  * The sf corpus has no cross-shard exact duplicates, so the membership
  * laws are exercised on a planted-duplicate frame here, not just the
  * declared queries.
  */
class SelectionSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  // 200 synthetic docs with a 157-period content repeat: 157 ∤ 10, so a
  // duplicate pair (i, i+157) always straddles the id%10==7 shard split —
  // the incoming shard has genuine cross-shard members AND non-members
  private def frame = (0L until 200L).map(i => (i, s"content-${i % 157}"))
    .toDF("doc_id", "key")

  private def split = {
    val corpus = frame.filter(col("doc_id") % 10 =!= 7)
    val incoming = frame.filter(col("doc_id") % 10 === 7)
    (corpus, incoming)
  }

  test("bloom membership has no false negatives vs exact join") {
    val (corpus, incoming) = split
    val bytes = llm.Selection.bloomBuild(corpus, col("key"), 4096L, 65536L)
    val flags = incoming.select(col("doc_id"), col("key"),
        llm.Selection.bloomMightContain(bytes, col("key")).as("maybe"))
      .collect().map(r => r.getString(1) -> r.getBoolean(2)).toMap
    val exact = corpus.select("key").distinct()
      .collect().map(_.getString(0)).toSet
    // every exact member MUST be flagged (bloom can never false-negative)
    flags.foreach { case (k, maybe) =>
      if (exact(k)) assert(maybe, s"false negative on $k")
    }
    // and at this sizing (4k items / 64k bits) the planted split has
    // genuine members AND genuine non-members, so both branches ran
    flags.count { case (k, _) => exact(k) } should be > 0
    flags.count { case (k, _) => !exact(k) } should be > 0
    // false-positive band: 64k bits for ≤200 keys → FPP ≪ 1 %, and the
    // non-member keys here number ~20, so expect zero-to-rare FPs
    val fps = flags.count { case (k, maybe) => maybe && !exact(k) }
    fps should be <= 1
  }

  test("bloom bytes are independent of partitioning and row order") {
    val (corpus, _) = split
    val a = llm.Selection.bloomBuild(corpus, col("key"), 4096L, 65536L)
    val b = llm.Selection.bloomBuild(corpus.repartition(13, col("doc_id")),
      col("key"), 4096L, 65536L)
    val c = llm.Selection.bloomBuild(
      corpus.orderBy(desc("doc_id")).coalesce(1), col("key"), 4096L, 65536L)
    a should equal(b)
    a should equal(c)
  }

  test("broadcast-handle bloom probe answers bit-for-bit like the " +
      "literal probe, through codegen") {
    val sp = spark
    import sp.implicits._
    val (corpus, _) = split
    val bytes = llm.Selection.bloomBuild(corpus, col("key"), 4096L, 65536L)
    // range-derived keys matching the fixture's content space (members)
    // plus an out-of-space tail (non-members) — a Seq literal would
    // constant-fold to a LocalTableScan and skip codegen entirely
    val keys = sp.range(200).select(
      concat(lit("content-"), (col("id") % 180).cast("string")).as("key"))
    val viaLiteral = keys
      .select(col("key"),
        llm.Selection.bloomMightContain(bytes, col("key")).as("m"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val bc = sp.sparkContext.broadcast(bytes)
    val probed = keys.select(col("key"),
      functions.BloomProbeBc.mightContain(bc, xxhash64(col("key")))
        .as("m"))
    // the probe stays inside whole-stage codegen (the point of the
    // Expression over a UDF): the projection carrying it renders with
    // the `*(n)` codegen marker
    probed.queryExecution.executedPlan.toString should
      include regex "\\*\\(\\d+\\) Project \\[[^\\n]*bloommightcontainbc"
    probed.collect().map(r => r.getString(0) -> r.getBoolean(1))
      .toMap shouldBe viaLiteral
    bc.unpersist()
  }

  test("declared bloom query obeys the no-false-negative law vs its twin") {
    val dir = "/root/testdata/sf0.001"
    val bloom = Registry.all("q_dedup_bloom").fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val exact = Registry.all("q_dedup_bloom_exactcheck").fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    bloom.keySet should equal(exact.keySet)
    exact.foreach { case (id, in) =>
      if (in) assert(bloom(id), s"false negative on doc $id")
    }
    ops.Caches.drain()
  }

  test("persisted dedup state: probe is exact; absorption cycle — " +
      "corpus no-op, shard absorbed, sidecar byte-identical to scratch") {
    val sp = spark
    val dir = "/root/testdata/sf0.001"
    val root = llm.Selection.persistedDedupState(sp, dir)
    def fpCount: Long = llm.Selection.liveFps(sp, root).count()
    def bloomBytes: Array[Byte] =
      llm.Selection.readStateBloom(sp, root)._1
    val addressedAll = graft.Tables(sp, dir, "documents")
      .select(col("doc_id"), md5(trim(regexp_replace(regexp_replace(
        regexp_replace(lower(col("text")), "<[^>]*>", " "),
        "[^a-z0-9 ]", ""), " +", " ")).cast("binary")).as("clean_md5"))
    val corpus = addressedAll.filter(col("doc_id") % 10 =!= 7)
    val shard = addressedAll.filter(col("doc_id") % 10 === 7)
    val n0 = fpCount
    val b0 = bloomBytes
    // probe = EXACT membership (the declared query's oracle law, here
    // against the exact join directly)
    val probed = llm.Selection.probeDedupState(sp, root, shard)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val exact = shard.join(corpus.select("clean_md5").distinct()
        .withColumn("__in", lit(true)), Seq("clean_md5"), "left")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"),
        !r.isNullAt(r.fieldIndex("__in")))).toMap
    probed shouldBe exact
    // replaying the BUILD input is a no-op: nothing novel to absorb
    llm.Selection.extendDedupState(sp, root, corpus)
    fpCount shouldBe n0
    java.util.Arrays.equals(bloomBytes, b0) shouldBe true
    // absorbing the shard: next probe sees every address as known, and
    // the sidecar equals a from-scratch build over corpus ∪ shard
    llm.Selection.extendDedupState(sp, root, shard)
    llm.Selection.probeDedupState(sp, root, shard)
      .filter(!col("in_corpus")).count() shouldBe 0L
    val scratch = llm.Selection.bloomBuild(
      addressedAll.select("clean_md5").distinct(), col("clean_md5"),
      1L << 16, 1L << 20)
    java.util.Arrays.equals(bloomBytes, scratch) shouldBe true
    // absorption replay is ALSO a no-op
    val n1 = fpCount
    llm.Selection.extendDedupState(sp, root, shard)
    fpCount shouldBe n1
    ops.Caches.drain()
  }

  test("dedup probe degenerate-shard fallback: cap-forced shuffled " +
      "branch is broadcast-free and agrees row-for-row") {
    val sp = spark
    val dir = "/root/testdata/sf0.001"
    val root = llm.Selection.persistedDedupState(sp, dir)
    val shard = graft.Tables(sp, dir, "documents")
      .select(col("doc_id"), md5(trim(regexp_replace(regexp_replace(
        regexp_replace(lower(col("text")), "<[^>]*>", " "),
        "[^a-z0-9 ]", ""), " +", " ")).cast("binary")).as("clean_md5"))
      .filter(col("doc_id") % 10 === 7)
      // fabricated addresses guarantee proven-new rows regardless of
      // what earlier tests absorbed into the memoized state
      .unionByName(Seq((999991L, "0" * 32), (999992L, "f" * 32))
        .toDF("doc_id", "clean_md5"))
    val fb = llm.Selection.probeDedupState(sp, root, shard,
      maxBroadcastKeys = 0L)
    val p = fb.queryExecution.executedPlan.toString
    p should not include "BroadcastHashJoin"
    p should include("SortMergeJoin")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1),
        r.getBoolean(2))).sorted.toSeq
    val got = rows(fb)
    got shouldBe rows(llm.Selection.probeDedupState(sp, root, shard))
    // the fabricated addresses prove the false path is exercised
    got.count(!_._3) should be >= 2
    ops.Caches.drain()
  }

  test("dedup-state compaction: manifest swap invisible to probes, " +
      "files shrink to target, replay stays no-op, grace reaps") {
    val sp = spark
    val dir = "/root/testdata/sf0.001"
    val root = llm.Selection.persistedDedupState(sp, dir)
    val shard = graft.Tables(sp, dir, "documents")
      .select(col("doc_id"), md5(trim(regexp_replace(regexp_replace(
        regexp_replace(lower(col("text")), "<[^>]*>", " "),
        "[^a-z0-9 ]", ""), " +", " ")).cast("binary")).as("clean_md5"))
      .filter(col("doc_id") % 10 === 7)
    // fragment the state the way a week of nightly ingestion does:
    // two absorption appends, each landing its own small files
    llm.Selection.extendDedupState(sp, root,
      Seq((888801L, "1" * 32), (888802L, "2" * 32))
        .toDF("doc_id", "clean_md5"))
    llm.Selection.extendDedupState(sp, root,
      Seq((888803L, "3" * 32)).toDF("doc_id", "clean_md5"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1),
        r.getBoolean(2))).sorted.toSeq
    val before = rows(llm.Selection.probeDedupState(sp, root, shard))
    // the pre-compact sidecar, for the rebuild-identity law below
    val (preB, preExp, preBits) = llm.Selection.readStateBloom(sp, root)
    llm.Selection.compactDedupState(sp, root, targetFiles = 2)
    // the new manifest carries ONE base generation, zero novel dirs
    val m1 = llm.Selection.liveManifest(root)
    m1.novel shouldBe empty
    m1.base should startWith("fingerprints_v")
    // the rewritten live version is bucket-preserving with exactly ONE
    // file per non-empty bucket: the nightly novel-dir fragments are
    // gone, the probe's partition-pruning layout survives
    val v1Buckets = new java.io.File(s"$root/${m1.base}")
      .listFiles().filter(f => f.isDirectory && f.getName.startsWith("fb="))
    v1Buckets should not be empty
    v1Buckets.foreach(b =>
      b.listFiles().count(_.getName.endsWith(".parquet")) shouldBe 1)
    // compaction REBUILDS the sidecar from the live set; at unchanged
    // params (the fixture is far below the floor) the rebuild is
    // byte-identical to the incrementally OR-merged sidecar — the
    // compaction-invisible law, now including the bloom
    val (postB, postExp, postBits) = llm.Selection.readStateBloom(sp, root)
    postExp shouldBe preExp
    postBits shouldBe preBits
    java.util.Arrays.equals(postB, preB) shouldBe true
    // ... and the probe answer is bit-identical through the swap
    rows(llm.Selection.probeDedupState(sp, root, shard)) shouldBe before
    // absorbed addresses stay known post-compact: replay is a no-op
    // (no new version, no new novel dir)
    val n1 = llm.Selection.liveFps(sp, root).count()
    llm.Selection.extendDedupState(sp, root,
      Seq((888801L, "1" * 32)).toDF("doc_id", "clean_md5"))
    llm.Selection.liveFps(sp, root).count() shouldBe n1
    llm.Selection.liveManifest(root) shouldBe m1
    // second compaction: the original layout is two generations stale
    // and gets reaped (one-version grace), answers still identical
    llm.Selection.compactDedupState(sp, root, targetFiles = 2)
    new java.io.File(s"$root/fingerprints").exists() shouldBe false
    rows(llm.Selection.probeDedupState(sp, root, shard)) shouldBe before
    ops.Caches.drain()
  }

  test("dedup-state sidecar rebuild at compaction: extensions that " +
      "saturate the build-time filter degrade the probe residue to " +
      "shard-size; the compactor re-sizes the sidecar to the live " +
      "corpus and the residue returns to the FP-bounded class") {
    val sp = spark
    import sp.implicits._
    val dir = "/root/testdata/sf0.001"
    val root = llm.Selection.persistedDedupState(sp, dir)
    val (_, exp0, bits0) = llm.Selection.readStateBloom(sp, root)
    // absorb ~5× the sidecar's expected keys (fabricated addresses —
    // deterministic md5s, disjoint from real content hashes)
    val grown = sp.range(exp0 * 5)
      .select((col("id") + 7700000L).as("doc_id"),
        md5(concat(lit("sat_"), col("id").cast("string"))
          .cast("binary")).as("clean_md5"))
    llm.Selection.extendDedupState(sp, root, grown)
    // a fresh novel shard against the SATURATED filter: most keys
    // false-positive, so the residue is shard-sized — the degradation
    // class the r18 build-time sizing fix eliminated, re-created here
    // by extension drift
    val novelShard = sp.range(2000)
      .select((col("id") + 8800000L).as("doc_id"),
        md5(concat(lit("fresh_"), col("id").cast("string"))
          .cast("binary")).as("clean_md5"))
    val (satB, satExp, satBits) = llm.Selection.readStateBloom(sp, root)
    satExp shouldBe exp0 // extends never re-size — that's the drift
    satBits shouldBe bits0
    val satResidue = novelShard.filter(
      llm.Selection.bloomMightContain(satB, col("clean_md5"))).count()
    satResidue.toDouble / 2000 should be > 0.5
    // the compactor re-sizes via sizedToCorpus on the live count —
    // the stored params GROW and the same shard's residue collapses
    llm.Selection.compactDedupState(sp, root, targetFiles = 2)
    val (newB, newExp, newBits) = llm.Selection.readStateBloom(sp, root)
    newExp should be > exp0
    newBits should be > bits0
    val newResidue = novelShard.filter(
      llm.Selection.bloomMightContain(newB, col("clean_md5"))).count()
    newResidue.toDouble / 2000 should be < 0.05
    // correctness through the whole cycle: absorbed keys stay known,
    // fresh keys stay novel, replay-extend stays a no-op
    llm.Selection.probeDedupState(sp, root,
        grown.limit(50)).filter(!col("in_corpus")).count() shouldBe 0L
    llm.Selection.probeDedupState(sp, root, novelShard)
      .filter(col("in_corpus")).count() shouldBe 0L
    val mAfter = llm.Selection.liveManifest(root)
    llm.Selection.extendDedupState(sp, root, grown.limit(100))
    llm.Selection.liveManifest(root) shouldBe mAfter
    ops.Caches.drain()
  }

  test("bucketed dedup state: a small residue's fingerprint scan is " +
      "PARTITION-PRUNED to the residue's buckets — the probe reads a " +
      "strict subset of the state's files; answers unchanged") {
    val sp = spark
    import sp.implicits._
    val dir = "/root/testdata/sf0.001"
    val root = llm.Selection.persistedDedupState(sp, dir)
    // resolve the LIVE fingerprint state the way the probe does: an
    // earlier test's maintenance may have committed new generations
    // and reaped the original layout
    val fpsLive = llm.Selection.liveFps(sp, root)
    // one genuinely-known address + one fabricated one — the residue
    // after the Bloom prefilter is ≤2 keys, hashing into ≤2 buckets
    val known = fpsLive.select("clean_md5").orderBy("clean_md5")
      .head().getString(0)
    val shard = Seq((1L, known), (2L, "0" * 32))
      .toDF("doc_id", "clean_md5")
    val probed = llm.Selection.probeDedupState(sp, root, shard)
    val got = probed.collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    got(1L) shouldBe true
    got(2L) shouldBe false
    // the fingerprint scan carries a partition filter on the bucket
    // column (the shard's documents scans are unpartitioned, so any
    // fb partition filter is the state scan's)
    val p = probed.queryExecution.executedPlan.toString
    "PartitionFilters: \\[[^\\]]*fb".r.findAllIn(p).size should be >= 1
    // quantitative: the pruned read touches a strict subset of the
    // state's files (≤2 buckets of StateBuckets)
    def filesOf(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    val totalFiles = filesOf(fpsLive)
    val touched = Seq(known, "0" * 32)
      .map(k => sp.range(1)
        .select(pmod(hash(lit(k)), lit(llm.Selection.StateBuckets)))
        .head().getInt(0)).distinct
    val prunedFiles = filesOf(fpsLive.filter(col("fb").isin(touched: _*)))
    prunedFiles should be <= (2L * totalFiles / llm.Selection.StateBuckets
      max 2L)
    prunedFiles should be < totalFiles
    ops.Caches.drain()
  }

  test("container decode: naive JVM pack+parse agrees frame-for-frame") {
    val dir = "/root/testdata/sf0.001"
    val got = Registry.all("q_multimodal_decode").fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getLong(3), r.getString(4))).toMap
    // independent reimplementation of the container format over the raw
    // bytes: pack 3 length-prefixed frames, then parse by offset walk
    val texts = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    var checked = 0
    texts.foreach { case (id, text) =>
      val body = text.getBytes("UTF-8")
        .map(b => f"${b & 0xff}%02X").mkString
      val nb = body.length / 2
      if (nb >= 64) {
        val lens = (1 to 3).map(i => 8 + (nb + 13 * i) % 24)
        val dirHex = lens.map(l => f"$l%04X").mkString
        val frames = (1 to 3).map { i =>
          val off = (i * 31) % math.max(1, nb - lens(i - 1))
          body.substring(off * 2, off * 2 + lens(i - 1) * 2)
        }
        val container = "4746" + "0003" + dirHex + frames.mkString
        var cursor = 4 + 4 + 12 // hex chars consumed by header + dir
        (1 to 3).foreach { i =>
          val (gl, goff, gmd5) = got((id, i))
          gl shouldBe lens(i - 1)
          goff shouldBe cursor / 2
          gmd5 shouldBe md5Hex(
            container.substring(cursor, cursor + lens(i - 1) * 2))
          cursor += lens(i - 1) * 2
          checked += 1
        }
      }
    }
    checked should be > 0
    got.size shouldBe checked
  }

  test("span bloom: per-doc hit counts upper-bound the exact twin") {
    val dir = "/root/testdata/sf0.001"
    val bloom = Registry.all("q_dedup_bloom_spans").fn(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    ops.Caches.drain()
    val exact = Registry.all("q_dedup_bloom_spans_exactcheck")
      .fn(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    ops.Caches.drain()
    bloom.keySet should equal(exact.keySet)
    exact.foreach { case (id, (nWin, nHit)) =>
      bloom(id)._1 shouldBe nWin
      // bloom can over-count (false positives) but never under-count
      bloom(id)._2 should be >= nHit
    }
    // the sf corpora DO share spans cross-shard (unlike whole-doc
    // content addresses) — the membership branch runs on real data
    exact.values.map(_._2).sum should be > 0L
  }

  test("entropy: bounds, exact reconstruction, uniform-text law") {
    val dir = "/root/testdata/sf0.001"
    val rows = Registry.all("q_text_entropy").fn(spark, dir).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val n = r.getLong(1)
      val ent = r.getDouble(3)
      // 0 ≤ H ≤ ln(n): entropy of n chars can't exceed log of the count
      ent should be >= 0.0
      ent should be <= math.log(n.toDouble) + 1e-6
      // output column is exactly the quantized sum re-divided
      ent shouldBe ops.Cols.froundDouble(
        r.getLong(2).toDouble / (n.toDouble * 1e6), 6)
    }
    // naive JVM differential on the same docs: group chars, apply the
    // identical quantization, exact integer sum — must match bit-for-bit
    val texts = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { case (id, entQ) =>
      // codepoint-based like Spark/DuckDB substr, not UTF-16 units
      val cs = texts(id).codePoints().toArray.toSeq
        .groupBy(identity).values.map(_.size.toLong)
      val n = cs.sum
      val naive = -cs.map(m =>
        m * math.round(math.log(m.toDouble / n.toDouble) * 1e6)).sum
      entQ shouldBe naive
    }
  }

  test("quality threshold: per-lang quantile keeps ceil(0.6n) plus ties") {
    val dir = "/root/testdata/sf0.001"
    val rows = Registry.all("q_sample_quality_threshold").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    rows.length should be > 0
    rows.groupBy(_._2).foreach { case (lang, ls) =>
      val n = ls.length
      val keepN = (3 * n + 4) / 5
      val kept = ls.filter(_._5)
      withClue(s"$lang: ") {
        // at least the quantile count is kept…
        kept.length should be >= keepN
        // …every kept doc outscores every dropped doc (threshold law)
        val minKept = kept.map(_._3).min
        ls.filterNot(_._5).foreach(_._3 should be < minKept)
        // …and without the boundary ties the count drops below the
        // quantile — the threshold is the TIGHTEST score satisfying it
        kept.count(_._3 > minKept) should be < keepN
        // keep ≡ score ≥ thr, one thr per lang
        ls.map(_._4).distinct.length shouldBe 1
        ls.foreach(t => t._5 shouldBe (t._3 >= t._4))
      }
    }
  }

  test("gumbel resample: seeded, size-K, drawn from the importance pool") {
    val dir = "/root/testdata/sf0.001"
    val a = Registry.all("q_sample_importance").fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    ops.Caches.drain()
    val b = Registry.all("q_sample_importance").fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    ops.Caches.drain()
    // seeded noise → the selection is bit-reproducible run to run
    a should equal(b)
    a.length shouldBe 64
    a.map(_._2).toSeq shouldBe (1 to 64)
    // keys strictly descend in rank order (the probed gap law means no
    // ties at this SF; a tie would break the oracle hash anyway)
    a.map(_._3).toSeq shouldBe a.map(_._3).sorted.reverse
    val pool = Registry.all("q_text_importance").fn(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    a.foreach { case (id, _, _) => pool should contain(id) }
    ops.Caches.drain()
  }

  test("importance weights: sign follows target affinity, exact sums") {
    val dir = "/root/testdata/sf0.001"
    val rows = Registry.all("q_text_importance").fn(spark, dir)
      .join(Tables(spark, dir, "documents").select("doc_id", "lang"),
        "doc_id")
      .select("lang", "llr_sum_q", "n_bg", "importance")
      .collect()
    rows.length should be > 0
    // DSIR law at the distribution level: target-language docs must score
    // higher on average than non-target (their features ARE the target
    // distribution) — a sign/wiring check that catches swapped numerators
    val (en, rest) = rows.partition(_.getString(0) == "en")
    val avg = (xs: Array[org.apache.spark.sql.Row]) =>
      xs.map(_.getDouble(3)).sum / xs.length
    en.length should be > 0
    rest.length should be > 0
    avg(en) should be > avg(rest)
    // importance is exactly llr_sum_q / (n_bg · 1e6) under fround 6 —
    // the float leg is one expression over exact integers
    rows.foreach { r =>
      val recomputed = ops.Cols.froundDouble(
        r.getLong(1).toDouble / (r.getLong(2).toDouble * 1e6), 6)
      r.getDouble(3) shouldBe recomputed
    }
    ops.Caches.drain()
  }

  test("cms estimates upper-bound exact corpus counts, exact sans collision") {
    val dir = "/root/testdata/sf0.001"
    val est = Registry.all("q_text_cms_freq").fn(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    est.length should be > 0
    // exact corpus-side counts for the same shard vocabulary
    val exact = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(
        org.apache.spark.sql.functions.split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "" && col("doc_id") % 10 =!= 7)
      .groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // CMS law (Cormode-Muthukrishnan): est ≥ true, always — a violated
    // lower bound means the hash rows disagree between build and probe
    est.foreach { case (tok, _, e) =>
      val t = exact.getOrElse(tok, 0L)
      assert(e >= t, s"cms underestimate on '$tok': est $e < true $t")
    }
    // at this vocab (~dozens of tokens over 4×65536 counters) collisions
    // are essentially impossible — the estimates should be EXACT; allow
    // a stray collision but not a systematic offset
    val off = est.count { case (tok, _, e) =>
      e != exact.getOrElse(tok, 0L) }
    assert(off <= est.length / 10, s"$off of ${est.length} inexact")
    ops.Caches.drain()
  }
}
