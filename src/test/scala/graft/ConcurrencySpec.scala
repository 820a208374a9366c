package graft

import java.util.concurrent.Executors

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Concurrent-session correctness: a production cluster serves MANY
  * queries on one SparkSession at once, so the engine's shared state —
  * the [[Tables]] per-session memo, the [[ops.Caches]] release bag (a
  * global: one query's post-run drain may unpersist a cache another
  * in-flight query is still reading), persisted mid-frames, the ranged
  * GlobalOrder caches — must stay CORRECT under interleaving. Losing a
  * cache mid-read is allowed to cost recompute (Spark falls back to
  * lineage), never wrong rows.
  *
  * The probe: a family-spanning query set runs sequentially for the
  * baseline, then twice concurrently on a small pool WITH per-query
  * drains (the Verify/Bench discipline, now racing), and every result
  * must match the baseline row-for-row. All chosen queries end in a
  * total ORDER BY, so plain ordered row comparison is exact.
  */
class ConcurrencySpec extends AnyFunSuite with Matchers with SparkTest {
  private val sf = "/root/testdata/sf0.001"

  // spans: persisted shared frames (tpch q15/q20, pagerank), ranged
  // caches (equal-occupancy), broadcast+window+agg families, semi/anti,
  // and the STATEFUL layouts (standing-state memos, once-per-JVM commit
  // log builds, cached delta folds) — two racing callers must converge
  // on ONE build and read consistent state
  private val names = Seq(
    "q_tpch_q15", "q_tpch_q20", "q_tpch_q21", "q_graph_pagerank",
    "q_hic_bh", "q_hic_equal_occupancy", "q_join_broadcast",
    "q_win_rank", "q_agg_cube", "q_dedup_exact", "q_text_tfidf",
    "q_events_sessionize", "q_warehouse_ivm_distinct",
    "q_warehouse_commit_log", "q_warehouse_ivm_incremental",
    "q_dedup_cluster", "q_hic_kr_biases")

  private def rows(name: String): Seq[String] = {
    val out = Registry.all(name).fn(spark, sf).collect().map(_.toString).toSeq
    ops.Caches.drain()
    out
  }

  test("17 family-spanning queries under a 4-thread race equal their " +
      "sequential baselines, twice") {
    val baseline = names.map(n => n -> rows(n)).toMap
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      for (round <- 1 to 2) {
        val futs = scala.util.Random.shuffle(names).map { n =>
          Future(n -> rows(n))
        }
        val got = Await.result(Future.sequence(futs), Duration.Inf).toMap
        names.foreach { n =>
          withClue(s"round $round, $n: ") { got(n) shouldBe baseline(n) }
        }
      }
    } finally pool.shutdown()
  }

  test("dedup-state maintenance law: concurrent extends with " +
      "overlapping shards land every address exactly once, through " +
      "the commit log; vacuum reclaims only aged never-referenced " +
      "dirs") {
    val sp = spark
    import org.apache.spark.sql.functions._
    import sp.implicits._
    val root = graft.io.Scratch.sub("maint_law_spec") + "/state"
    llm.Selection.buildDedupStateAt(sp, sf, root)
    val v0 = graft.io.CommitLog.currentVersion(root)
    // four threads, overlapping fabricated shards (i and i+1 share
    // half their addresses): the law is SERIAL-IN-WINNER-ORDER — the
    // final state carries the UNION exactly once no matter which
    // extend saw which predecessor
    def shard(i: Int) = sp.range(400)
      .select((col("id") + 5550000L).as("doc_id"),
        md5(concat(lit("law_"), ((col("id") + i * 200) % 1000)
          .cast("string")).cast("binary")).as("clean_md5"))
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      Await.result(Future.sequence((0 until 4).map(i =>
        Future(llm.Selection.extendDedupState(sp, root, shard(i))))),
        Duration.Inf)
    } finally pool.shutdown()
    val fps = llm.Selection.liveFps(sp, root)
    // union of the four shards = md5("law_0..999") — every address
    // exactly once, alongside the untouched corpus build
    val expected = sp.range(1000)
      .select(md5(concat(lit("law_"), col("id").cast("string"))
        .cast("binary")).as("k"))
      .collect().map(_.getString(0)).toSet
    val got = fps.select("clean_md5").collect().map(_.getString(0))
    got.length shouldBe got.toSet.size // zero duplicates anywhere
    expected.subsetOf(got.toSet) shouldBe true
    // every extend committed (some after a rebase): version advanced
    graft.io.CommitLog.currentVersion(root) should be > v0
    // replay of any shard after the dust settles: full no-op
    val mAfter = llm.Selection.liveManifest(root)
    llm.Selection.extendDedupState(sp, root, shard(2))
    llm.Selection.liveManifest(root) shouldBe mAfter
    // vacuum: a never-referenced dir (crash residue shape) is ignored
    // by automatic reaping and by a vacuum inside retention, reclaimed
    // by a vacuum past it
    val orphan = java.nio.file.Paths.get(root, "novel_v999999-dead")
    java.nio.file.Files.createDirectories(orphan)
    llm.Selection.compactDedupState(sp, root)
    java.nio.file.Files.exists(orphan) shouldBe true // auto-reap: no
    llm.Selection.vacuumDedupState(root) shouldBe empty // in retention
    llm.Selection.vacuumDedupState(root, olderThanMs = 0L) should
      contain("novel_v999999-dead")
    java.nio.file.Files.exists(orphan) shouldBe false
    ops.Caches.drain()
  }

  test("vacuum-vs-live-extend law: a vacuum inside its retention " +
      "window never deletes a concurrent extend's staging, and the " +
      "extend commits intact") {
    // The VACUUM contract (llm.Selection.vacuumDedupState): the
    // operator asserts no maintenance job older than `olderThanMs` is
    // still staging. The law pinned here is the safe side of that
    // contract — while an extend IS live, any vacuum whose retention
    // exceeds the extend's age must be a no-op on its dirs (staged
    // dirs are never-referenced until the CAS, so only the age guard
    // protects them). Minimum safe retention = the longest extend a
    // deployment ever runs (staging a corpus-scale novel dir) plus
    // clock-skew margin; the r19 512x extend staged for minutes, so
    // the 7-day default is conservative by orders of magnitude.
    val sp = spark
    import org.apache.spark.sql.functions._
    val root = graft.io.Scratch.sub("vacuum_law_spec") + "/state"
    llm.Selection.buildDedupStateAt(sp, sf, root)
    def shard(tag: String) = sp.range(3000)
      .select((col("id") + 6660000L).as("doc_id"),
        md5(concat(lit(s"vac_${tag}_"), col("id").cast("string"))
          .cast("binary")).as("clean_md5"))
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val extend = Future(
        llm.Selection.extendDedupState(sp, root, shard("live")))
      // hammer vacuums (retention 60 s >> the extend's lifetime) the
      // whole time the extend is staging: none may reap its dirs — a
      // deleted staging dir would fail the extend's commit loudly
      val vacuums = Future {
        var reaped = Seq.empty[String]
        while (!extend.isCompleted)
          reaped ++= llm.Selection.vacuumDedupState(root,
            olderThanMs = 60000L)
        reaped
      }
      Await.result(extend, Duration.Inf) // would throw on lost staging
      Await.result(vacuums, Duration.Inf) shouldBe empty
    } finally pool.shutdown()
    // the extend landed exactly once despite the concurrent vacuums
    val fps = llm.Selection.liveFps(sp, root)
    fps.filter(col("clean_md5").isin(
      shard("live").select("clean_md5").collect()
        .map(_.getString(0)).take(50).toSeq: _*)).count() shouldBe 50
    ops.Caches.drain()
  }

  test("standing-table publication law: racing builders publish " +
      "exactly once through the commit log, the loser attaches to the " +
      "winner's snapshot, and vacuum reclaims only aged staging") {
    val sp = spark
    val root = graft.io.Scratch.sub("standing_law_spec")
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    def build(p: String): Unit = {
      built.incrementAndGet()
      Thread.sleep(200) // widen the race window
      sp.range(100).toDF("x").write.mode("overwrite").parquet(p)
    }
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val paths = try {
      Await.result(Future.sequence(Seq(
        Future(ops.Caches.durableStanding(root, "law", sf)(build)),
        Future(ops.Caches.durableStanding(root, "law", sf)(build)))),
        Duration.Inf)
    } finally pool.shutdown()
    // both callers resolve the SAME committed snapshot (the loser's
    // staging was reaped; at most one version exists)
    paths.distinct should have size 1
    sp.read.parquet(paths.head).count() shouldBe 100
    val slug = new java.io.File(paths.head).getParentFile.getPath
    graft.io.CommitLog.currentVersion(slug) shouldBe 0
    // both may have BUILT (the race), but exactly one published; a
    // third call attaches without building
    val b = built.get()
    ops.Caches.durableStanding(root, "law", sf)(build)
    built.get() shouldBe b
    // crash residue (a staged dir never committed): inside retention a
    // vacuum leaves it; past retention it reaps — committed snapshots
    // are never touched
    val orphan = java.nio.file.Paths.get(slug, "t_deadbeef")
    java.nio.file.Files.createDirectories(orphan)
    ops.Caches.vacuumStanding(root) shouldBe empty
    ops.Caches.vacuumStanding(root, olderThanMs = 0L)
      .exists(_.endsWith("t_deadbeef")) shouldBe true
    java.nio.file.Files.exists(orphan) shouldBe false
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(paths.head)) shouldBe true
  }

  test("index-maintenance law: concurrent extends with overlapping " +
      "arrivals encode every vector exactly once through the commit " +
      "log; compact folds deltas; vacuum honors retention") {
    val sp = spark
    import org.apache.spark.sql.functions._
    val root = graft.io.Scratch.sub("idx_law_spec") + "/index"
    val dim = 8
    // content is a pure function of vec_id (not the window offset), so
    // overlapping extends stage byte-identical rows for shared ids
    def emb(lo: Long, n: Long) = sp.range(n)
      .select((col("id") + lo).as("vec_id"),
        expr(s"transform(sequence(0, ${dim - 1}), " +
          s"j -> cast(sin((id + ${lo}L) * 131 + j) as float))")
          .as("embedding"))
    llm.Pq.buildIvfPqTrained(sp, root, emb(0L, 64), k = 4, m = 4,
      kb = 4, iters = 0)
    // four threads, OVERLAPPING arrival windows (i*100 .. i*100+200):
    // serial-in-winner-order — each vec_id encodes exactly once (m
    // code rows, one cells row) no matter which extend saw which
    // predecessor; losers rebase and their pending sets shrink
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      Await.result(Future.sequence((0 until 4).map(i =>
        Future(llm.Pq.extendIvfPqIndex(sp, root,
          emb(1000L + i * 100, 200))))), Duration.Inf)
    } finally pool.shutdown()
    val codes = llm.Pq.codesOf(sp, root)
    val nIds = 64L + 500L // build ∪ overlapping windows [1000, 1500)
    codes.select("vec_id").distinct().count() shouldBe nIds
    codes.count() shouldBe nIds * 4 // m rows per id — zero doubles
    llm.Pq.cellsOf(sp, root).groupBy("vec_id").count()
      .filter(col("count") > 1).count() shouldBe 0L
    // replay after the dust settles: full no-op (no version bump)
    val head = graft.io.CommitLog.currentVersion(root)
    llm.Pq.extendIvfPqIndex(sp, root, emb(1000L, 500))
    graft.io.CommitLog.currentVersion(root) shouldBe head
    // compact folds every delta into one generation; results identical
    val before = llm.Pq.codesOf(sp, root).collect().map(_.toString).sorted
    llm.Pq.compactIndex(sp, root, targetFiles = 2)
    val m = llm.Pq.liveIndexManifest(root)
    m.delta shouldBe empty
    m.cellsDelta shouldBe empty
    llm.Pq.codesOf(sp, root).collect().map(_.toString).sorted shouldBe
      before
    // vacuum: never-referenced crash residue ignored inside retention,
    // reclaimed past it; committed dirs never touched
    val orphan = java.nio.file.Paths.get(root, "codesdelta_v999999-dead")
    java.nio.file.Files.createDirectories(orphan)
    llm.Pq.vacuumIndex(root) shouldBe empty
    llm.Pq.vacuumIndex(root, olderThanMs = 0L) should
      contain("codesdelta_v999999-dead")
    java.nio.file.Files.exists(orphan) shouldBe false
    new java.io.File(s"$root/${m.codes}").exists() shouldBe true
    ops.Caches.drain()
  }

  test("pre-migration vacuum law: on a built-but-never-maintained " +
      "root (empty commit log) the LIVE legacy dirs are never aged " +
      "into crash residue — vacuum at zero retention reaps nothing") {
    // The hole this pins: migration to the commit log happens on the
    // FIRST extend/compact, so a freshly built index has an empty log.
    // A vacuum that derives its referenced set from committed
    // manifests alone sees everything as never-referenced and — past
    // retention — deletes the live codes/cells/idbloom, destroying
    // the index. The referenced set must include the LIVE manifest.
    val sp = spark
    import org.apache.spark.sql.functions._
    val root = graft.io.Scratch.sub("premigrate_vacuum_spec") + "/index"
    val emb = sp.range(64).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 7), " +
        "j -> cast(sin(id * 131 + j) as float))").as("embedding"))
    llm.Pq.buildIvfPqTrained(sp, root, emb, k = 4, m = 4, kb = 4,
      iters = 0)
    graft.io.CommitLog.currentVersion(root) shouldBe -1
    llm.Pq.vacuumIndex(root, olderThanMs = 0L) shouldBe empty
    Seq("codes", "cells", "idbloom").foreach(d =>
      new java.io.File(s"$root/$d").exists() shouldBe true)
    // the index still searches after the vacuum
    llm.Pq.ivfPqTop3FromIndex(sp, root, emb, nProbes = 2,
      probeCells = 2).count() should be > 0L
    // the dedup-state twin: simulate a pre-log legacy root by
    // removing the build's commit log — the live legacy layout
    // (fixed `fingerprints` name) must survive a zero-retention
    // vacuum the same way
    val sroot = graft.io.Scratch.sub("premigrate_vacuum_spec") + "/state"
    llm.Selection.buildDedupStateAt(sp, sf, sroot)
    graft.io.Scratch.reap(s"$sroot/commits")
    llm.Selection.vacuumDedupState(sroot, olderThanMs = 0L)
      .contains("fingerprints") shouldBe false
    new java.io.File(s"$sroot/fingerprints").exists() shouldBe true
    ops.Caches.drain()
  }
}
