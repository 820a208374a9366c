package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.io.CommitLog

/** Laws of the filesystem-CAS commit protocol (io.CommitLog) — the
  * arbitration the declared query's deterministic build relies on. No
  * Spark involved: the protocol is pure pointer arithmetic; data
  * directories are opaque strings here.
  */
class CommitLogSpec extends AnyFunSuite with Matchers {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("clog_spec_").toString

  test("a staled committer loses its CAS deterministically and wins " +
      "after exactly one rebase that sees the new snapshot") {
    val root = freshRoot()
    CommitLog.tryCommit(root, -1, "base") shouldBe true
    // A reads the current version... then B commits first
    val aStale = CommitLog.currentVersion(root)
    aStale shouldBe 0
    CommitLog.tryCommit(root, 0, "b-wins") shouldBe true
    // A's stale attempt MUST lose — v1 exists
    CommitLog.tryCommit(root, aStale, "a-stale") shouldBe false
    // ...and the loser's staging tmp must not linger as a phantom v1
    CommitLog.versions(root).map(_._2) shouldBe Seq("base", "b-wins")
    // commitRetry rebases: prepare runs once at cur=1 (not the stale 0)
    val seen = scala.collection.mutable.ArrayBuffer[Int]()
    val won = CommitLog.commitRetry(root) { cur =>
      seen += cur; s"a-rebased-on-$cur"
    }
    won shouldBe 2
    seen.toSeq shouldBe Seq(1)
    CommitLog.versions(root).map(_._2) shouldBe
      Seq("base", "b-wins", "a-rebased-on-1")
  }

  test("streaming state guard: a fold that lost its version CAS aborts " +
      "and reaps its orphaned write instead of advancing split-brained") {
    val root = freshRoot()
    // run A seeds v0 and folds to v1
    stream.StreamMain.commitStateVersion("cdc", root, 0, s"$root/v0")
    stream.StreamMain.commitStateVersion("cdc", root, 1, s"$root/v1")
    // run B (a second live writer) wins the v2 CAS first
    CommitLog.tryCommit(root, 1, s"$root/v2-B") shouldBe true
    // run A's v2 attempt must abort, and its orphan directory is reaped
    val orphan = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "v2"))
    val ex = intercept[IllegalStateException] {
      stream.StreamMain.commitStateVersion("cdc", root, 2, orphan.toString)
    }
    ex.getMessage should include("split-brain")
    java.nio.file.Files.exists(orphan) shouldBe false
    // the winner's lineage is intact
    CommitLog.versions(root).map(_._2) shouldBe
      Seq(s"$root/v0", s"$root/v1", s"$root/v2-B")
  }

  test("checkpoint prunes covered pointers, keeps the version sequence " +
      "continuable, and exactly one checkpointer wins") {
    val root = freshRoot()
    (0 to 3).foreach(i =>
      CommitLog.commitRetry(root)(_ => s"batch-$i") shouldBe i)
    CommitLog.checkpoint(root, 1, "snap-0-1") shouldBe true
    // the layering guard refuses the always-wrong calls: a checkpoint
    // at or below the existing one (whose data it cannot cover), and
    // one past the committed head
    intercept[IllegalArgumentException] {
      CommitLog.checkpoint(root, 1, "snap-other")
    }
    intercept[IllegalArgumentException] {
      CommitLog.checkpoint(root, 99, "snap-early")
    }
    CommitLog.latestCheckpoint(root) shouldBe Some(1 -> "snap-0-1")
    // covered pointers pruned; the tail intact
    CommitLog.versions(root) shouldBe Seq(2 -> "batch-2", 3 -> "batch-3")
    // appenders continue where the sequence left off
    CommitLog.currentVersion(root) shouldBe 3
    CommitLog.commitRetry(root)(_ => "batch-4") shouldBe 4
    // a LAYERED checkpoint (built from the previous snapshot ∪ tail)
    // advances, prunes the covered tail AND the superseded marker —
    // a periodically-checkpointing writer stays O(1) in log files
    CommitLog.checkpoint(root, 3, "snap-0-3") shouldBe true
    CommitLog.latestCheckpoint(root) shouldBe Some(3 -> "snap-0-3")
    CommitLog.versions(root) shouldBe Seq(4 -> "batch-4")
    val names = {
      val it = java.nio.file.Files.list(
        java.nio.file.Paths.get(root, "commits"))
      try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala.map(_.getFileName.toString).toSet
      } finally it.close()
    }
    names shouldBe Set("c00000003", "v00000004")
    // a FULLY-pruned log still floors at the checkpoint
    val root2 = freshRoot()
    (0 to 1).foreach(i => CommitLog.commitRetry(root2)(_ => s"b$i"))
    CommitLog.checkpoint(root2, 1, "snap") shouldBe true
    CommitLog.versions(root2) shouldBe Seq.empty
    CommitLog.currentVersion(root2) shouldBe 1
    CommitLog.commitRetry(root2)(_ => "b2") shouldBe 2
  }

  test("restore is a new commit pointing at an old version's data: " +
      "history is preserved and the restored state is re-readable") {
    val root = freshRoot()
    (0 to 3).foreach(i => CommitLog.commitRetry(root)(_ => s"d$i"))
    // RESTORE to v1 = commit v4 whose data pointer IS v1's — a forward
    // write, never a history rewrite (an auditor still sees v2/v3).
    // This is the FULL-STATE-per-version shape (the streaming state
    // log); an increment-log table restores by committing a compensating
    // delta instead
    val restoreTo = CommitLog.versions(root).find(_._1 == 1).get._2
    CommitLog.commitRetry(root)(_ => restoreTo) shouldBe 4
    CommitLog.versions(root).map(_._2) shouldBe
      Seq("d0", "d1", "d2", "d3", "d1")
    CommitLog.currentVersion(root) shouldBe 4
  }

  test("N racing committers all land exactly once on a dense log, and " +
      "concurrent readers only ever see complete dense prefixes") {
    val root = freshRoot()
    val n = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n + 1)
    val start = new java.util.concurrent.CountDownLatch(1)
    val readerStop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readerBad =
      new java.util.concurrent.atomic.AtomicReference[String](null)
    // a polling reader: every observation must be a dense prefix of
    // fully-written pointers (rename-atomicity — never a torn read)
    pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        while (!readerStop.get()) {
          val vs = CommitLog.versions(root)
          if (vs.map(_._1) != (0 until vs.size))
            readerBad.compareAndSet(null, s"non-dense: $vs")
          if (vs.exists(_._2.isEmpty))
            readerBad.compareAndSet(null, s"torn pointer: $vs")
        }
      }
    })
    val futs = (0 until n).map { i =>
      pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int = {
          start.await()
          CommitLog.commitRetry(root)(cur => s"writer-$i")
        }
      })
    }
    start.countDown()
    val wonVersions = futs.map(_.get())
    readerStop.set(true)
    pool.shutdown()
    pool.awaitTermination(30, java.util.concurrent.TimeUnit.SECONDS)
    // dense log, one version per committer, every batch exactly once
    wonVersions.sorted shouldBe (0 until n)
    CommitLog.currentVersion(root) shouldBe n - 1
    CommitLog.versions(root).map(_._2).sorted shouldBe
      (0 until n).map(i => s"writer-$i").sorted
    readerBad.get() shouldBe null
  }

  // ---- the STATE-REPLACING commit class: rebase must RE-APPLY ----

  /** A toy full-state table: one file holding a sorted element set.
    * Each version's data dir is the COMPLETE state (the streaming
    * CLI's shape), so a correct rebase must re-derive from the
    * winner's snapshot, not recommit a stale derivation.
    */
  private def writeState(elems: Set[String]): String = {
    val d = java.nio.file.Files.createTempDirectory("clog_state_")
    java.nio.file.Files.write(d.resolve("state.txt"),
      elems.toSeq.sorted.mkString(",")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.toString
  }

  private def readState(dir: String): Set[String] = {
    val s = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "state.txt")),
      java.nio.charset.StandardCharsets.UTF_8)
    if (s.isEmpty) Set.empty else s.split(",").toSet
  }

  test("rebase-reapply law: a state-replacing committer that loses its " +
      "CAS re-derives from the WINNER's snapshot — the final state " +
      "equals sequential application in winner order, and recommitting " +
      "the stale derivation is a detectable lost update") {
    val root = freshRoot()
    CommitLog.tryCommit(root, -1, writeState(Set("x"))) shouldBe true
    // A derives {x, a} from the v0 snapshot it read...
    val aStaleBase = CommitLog.headSnapshot(root).get
    aStaleBase._1 shouldBe 0
    val aStaleDir = writeState(readState(aStaleBase._2) + "a")
    // ...then B races past it with {x, b}
    CommitLog.commitStateRetry(root) { (_, base) =>
      writeState(readState(base.get) + "b")
    } shouldBe 1
    // A's stale CAS loses; its stale derivation LACKS b — committing
    // it verbatim at v2 would silently drop the winner's change
    CommitLog.tryCommit(root, aStaleBase._1, aStaleDir) shouldBe false
    readState(aStaleDir) should not contain "b"
    // the rebase contract: prepare re-derives from the handed head
    var basesSeen = List.empty[Set[String]]
    CommitLog.commitStateRetry(root) { (cur, base) =>
      val s = readState(base.get)
      basesSeen ::= s
      writeState(s + "a")
    } shouldBe 2
    basesSeen.head shouldBe Set("x", "b") // re-applied on the winner
    // final head = serial execution in winner order: x, then +b, then +a
    readState(CommitLog.headSnapshot(root).get._2) shouldBe
      Set("x", "b", "a")
  }

  test("N racing state committers through commitStateRetry compose as " +
      "serial execution in winner order: every changeset survives and " +
      "each version's state extends its predecessor by exactly one") {
    val root = freshRoot()
    CommitLog.tryCommit(root, -1, writeState(Set.empty)) shouldBe true
    val n = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    val start = new java.util.concurrent.CountDownLatch(1)
    val futs = (0 until n).map { i =>
      pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int = {
          start.await()
          CommitLog.commitStateRetry(root) { (_, base) =>
            writeState(readState(base.get) + s"e$i")
          }
        }
      })
    }
    start.countDown()
    val won = futs.map(_.get()).sorted
    pool.shutdown()
    pool.awaitTermination(30, java.util.concurrent.TimeUnit.SECONDS)
    won shouldBe (1 to n)
    // no lost updates: the head carries every writer's element
    readState(CommitLog.headSnapshot(root).get._2) shouldBe
      (0 until n).map(i => s"e$i").toSet
    // winner-order seriality: version k's state = version k-1's plus
    // exactly the element version k's winner added
    val states = CommitLog.versions(root).map(v => readState(v._2))
    states.head shouldBe Set.empty
    states.sliding(2).foreach { w =>
      val (prev, next) = (w(0), w(1))
      prev.subsetOf(next) shouldBe true
      (next -- prev).size shouldBe 1
    }
  }

  test("checkpoint floor: a stale committer cannot re-link a version " +
      "slot the checkpoint pruned — covered history is not a vacancy") {
    // the live two-process race that found this: winner commits v0,v1,
    // checkpoints c0 (pruning pointer v0); a second run that listed
    // the log BEFORE the winner's first commit then CAS-es at
    // expected=-1, finds the v0 slot absent, and used to re-link it —
    // a zombie version below the checkpoint
    val root = freshRoot()
    CommitLog.tryCommit(root, -1, "w-v0") shouldBe true
    CommitLog.tryCommit(root, 0, "w-v1") shouldBe true
    CommitLog.checkpoint(root, 0, "w-v0") shouldBe true
    // stale seed CAS at the pruned slot must LOSE, not re-create it
    CommitLog.tryCommit(root, -1, "stale-v0") shouldBe false
    CommitLog.versions(root) shouldBe Seq(1 -> "w-v1")
    CommitLog.latestCheckpoint(root) shouldBe Some(0 -> "w-v0")
    // ...and the legitimate appender continues past the checkpoint
    CommitLog.tryCommit(root, 1, "w-v2") shouldBe true
    CommitLog.checkpoint(root, 1, "w-v1") shouldBe true
    CommitLog.tryCommit(root, 0, "stale-v1") shouldBe false
    CommitLog.versions(root) shouldBe Seq(2 -> "w-v2")
    CommitLog.currentVersion(root) shouldBe 2
  }

  test("checkpoint lineage records each pruned slot's true owner, " +
      "cumulatively across markers, and a zombie re-link can never " +
      "overwrite it") {
    // the decidability record behind tryCommit's covered-slot
    // post-check: "was version N's pointer MY payload?" cannot be
    // answered from pointer presence (a genuine win whose slot the
    // pruner hasn't deleted yet looks identical to a zombie re-link)
    val root = freshRoot()
    CommitLog.tryCommit(root, -1, "a-v0") shouldBe true
    CommitLog.tryCommit(root, 0, "b-v1") shouldBe true
    CommitLog.checkpoint(root, 0, "snap-0") shouldBe true
    CommitLog.checkpointLineage(root) shouldBe Map(0 -> "a-v0")
    CommitLog.tryCommit(root, 1, "c-v2") shouldBe true
    CommitLog.checkpoint(root, 1, "snap-1") shouldBe true
    // cumulative: the superseding marker still knows v0's owner
    CommitLog.checkpointLineage(root) shouldBe
      Map(0 -> "a-v0", 1 -> "b-v1")
    // a zombie pointer forged below the checkpoint (simulating the
    // re-link the floor check exists for) must not poison the NEXT
    // checkpoint's lineage: previous-marker lineage takes precedence
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "commits", "v00000000"),
      "zombie-v0".getBytes)
    CommitLog.tryCommit(root, 2, "d-v3") shouldBe true
    CommitLog.checkpoint(root, 2, "snap-2") shouldBe true
    CommitLog.checkpointLineage(root) shouldBe
      Map(0 -> "a-v0", 1 -> "b-v1", 2 -> "c-v2")
  }

  test("a genuine win observed and checkpointed-over by a fast peer " +
      "is reported as a WIN — racing committers against an aggressive " +
      "checkpointer never double-apply") {
    // the r18-advice TOCTOU: committer links v(N+1); before its
    // post-check runs, a peer commits v(N+2) and checkpoints c(N+1).
    // Pointer presence cannot decide the verdict — the lineage does.
    // 8 writers × unique payloads race a checkpointer that collapses
    // the log after every observed commit; exactly-once means every
    // payload appears exactly once across the final pointers + lineage.
    val root = freshRoot()
    val nWriters = 8
    val perWriter = 6
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      nWriters + 1)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ckpt = pool.submit(new Runnable {
      def run(): Unit = while (!stop.get()) {
        val head = CommitLog.currentVersion(root)
        val covered = CommitLog.latestCheckpoint(root).map(_._1)
          .getOrElse(-1)
        if (head > covered)
          try CommitLog.checkpoint(root, head, s"snap-$head")
          catch { case _: IllegalArgumentException => () } // raced
        Thread.`yield`()
      }
    })
    val won = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val writers = (0 until nWriters).map { w =>
      pool.submit(new Runnable {
        def run(): Unit = (0 until perWriter).foreach { i =>
          val payload = s"w$w-c$i"
          CommitLog.commitRetry(root, maxAttempts = 4096)(_ => payload)
          won.add(payload)
        }
      })
    }
    writers.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    stop.set(true)
    ckpt.get(30, java.util.concurrent.TimeUnit.SECONDS)
    pool.shutdown()
    // exactly-once: pointers ∪ lineage holds every payload once
    val fromPointers = CommitLog.versions(root).map(_._2)
    val fromLineage = CommitLog.checkpointLineage(root).values.toSeq
    val all = fromPointers ++ fromLineage
    all.distinct.size shouldBe all.size // no slot double-owned
    all.toSet shouldBe (0 until nWriters).flatMap(w =>
      (0 until perWriter).map(i => s"w$w-c$i")).toSet
    won.size() shouldBe nWriters * perWriter
    // dense version sequence: every slot 0..head owned exactly once
    CommitLog.currentVersion(root) shouldBe nWriters * perWriter - 1
  }

  test("lineage retention law: markers stay O(retain) over an " +
      "arbitrarily long commit history, the floor advances " +
      "monotonically, and retained-window verdicts stay decidable") {
    // the streaming CLI checkpoints once per micro-batch: without
    // retention every marker rewrites one line per version EVER
    // committed (O(n^2) marker I/O over a stream's life). With
    // retain=8, marker size must stay flat across 60 commits.
    val root = freshRoot()
    var markerLines = Seq.empty[Int]
    (0 until 60).foreach { i =>
      CommitLog.commitRetry(root)(_ => s"d$i")
      CommitLog.checkpoint(root, i, s"snap-$i", lineageRetain = 8)
      val content = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(root, "commits", f"c$i%08d")),
        java.nio.charset.StandardCharsets.UTF_8)
      markerLines :+= content.linesIterator.size
    }
    // flat: snapshot line + floor line + ≤8 lineage lines, forever
    markerLines.max should be <= 10
    markerLines.takeRight(30).distinct.size shouldBe 1
    // and the commits DIR is O(1) too: each checkpoint prunes exactly
    // the entries that exist (never a 0..upTo sweep — that's O(n²)
    // metadata calls over a per-batch-checkpointing stream's life), so
    // after 60 commit+checkpoint rounds only the newest marker remains
    java.nio.file.Files.list(
      java.nio.file.Paths.get(root, "commits")).count() should be <= 2L
    // the retained window still answers ownership exactly
    CommitLog.checkpointLineage(root) shouldBe
      (52 to 59).map(v => v -> s"d$v").toMap
    // a staled pre-link CAS below the floor still loses cleanly (the
    // checkpoint-floor guard, unchanged by retention)
    CommitLog.tryCommit(root, 3, "zombie") shouldBe false
  }

  test("covered-slot verdict under retention: own payload wins, " +
      "foreign payload loses and un-publishes, sub-floor is a LOUD " +
      "refusal — never a silent guess") {
    val root = freshRoot()
    (0 until 20).foreach(i => CommitLog.commitRetry(root)(_ => s"d$i"))
    CommitLog.checkpoint(root, 19, "snap", lineageRetain = 4) shouldBe
      true
    val marker = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "commits", "c00000019")),
      java.nio.charset.StandardCharsets.UTF_8)
    def linked(slot: Int): java.nio.file.Path = {
      val p = java.nio.file.Paths.get(root, "commits", f"v$slot%08d")
      java.nio.file.Files.write(p, "x".getBytes)
      p
    }
    // genuine win inside the retained window (lineage names us)
    val t1 = linked(18)
    CommitLog.decideCoveredSlot(root, 18, "d18", marker, t1) shouldBe
      true
    java.nio.file.Files.deleteIfExists(t1)
    // zombie inside the window (lineage names someone else): lose and
    // un-publish the re-link
    val t2 = linked(17)
    CommitLog.decideCoveredSlot(root, 17, "not-mine", marker, t2) shouldBe
      false
    java.nio.file.Files.exists(t2) shouldBe false
    // below the floor the record is evicted: refusing is the ONLY safe
    // verdict (loss could double-apply a genuine win, win could
    // resurrect a zombie) — and the transient pointer is removed
    val t3 = linked(2)
    an[IllegalStateException] should be thrownBy
      CommitLog.decideCoveredSlot(root, 2, "d2", marker, t3)
    java.nio.file.Files.exists(t3) shouldBe false
  }

  test("headSnapshot resolves the head pointer, falls back to a " +
      "covering checkpoint on a fully-pruned log, and is None when " +
      "empty") {
    val root = freshRoot()
    CommitLog.headSnapshot(root) shouldBe None
    (0 to 2).foreach(i => CommitLog.commitRetry(root)(_ => s"d$i"))
    CommitLog.headSnapshot(root) shouldBe Some(2 -> "d2")
    CommitLog.checkpoint(root, 2, "snap-0-2") shouldBe true
    CommitLog.versions(root) shouldBe Seq.empty
    CommitLog.headSnapshot(root) shouldBe Some(2 -> "snap-0-2")
  }
}
