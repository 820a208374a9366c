package graft.io

import java.nio.file.{Files, Path, Paths}

/** Optimistic-concurrency commit log for a table root — the missing
  * arbitration half of the lakehouse layer (the manifest swap in
  * `llm.Selection`/`llm.Pq` serializes ONE writer's versions; nothing
  * there decides between TWO). This is the Iceberg/Delta commit protocol
  * shape, filesystem-native:
  *
  *   - the log is a dense sequence of pointer files `commits/v%08d`,
  *     each naming the data directory its version ADDS (append-only
  *     snapshots: snapshot V = union of data dirs 0..V);
  *   - committing version N+1 is a compare-and-swap on the filesystem:
  *     write the pointer to a temp file, then `link(2)` it to
  *     `commits/v{N+1}` — link is atomic and fails with EEXIST, so
  *     exactly one of any set of concurrent committers wins; every
  *     loser re-reads the log, REBASES its delta on the new snapshot,
  *     and retries. (Rename is NOT the primitive: POSIX rename silently
  *     replaces an existing target.)
  *
  * On an object store without atomic rename the same contract comes from
  * a conditional PUT (If-None-Match) or a commit service; the protocol —
  * read snapshot, prepare data files, CAS the pointer, rebase on loss —
  * is identical, which is why the laws are pinned here against the
  * rename-based implementation (CommitLogSpec: dense versions, exactly
  * one winner per version, every committer's batch lands exactly once,
  * a deterministically-staled committer loses its CAS and succeeds on
  * rebase).
  *
  * Readers never lock: a snapshot read resolves the pointer files once
  * and reads immutable data directories — a concurrent commit can only
  * ADD a version, never mutate one, so reads are trivially
  * snapshot-isolated (same immutability discipline as the merge-on-read
  * layout's base).
  */
object CommitLog {
  private def commitsDir(root: String): Path = {
    val d = Paths.get(root, "commits")
    Files.createDirectories(d)
    d
  }

  private def pointer(root: String, v: Int): Path =
    commitsDir(root).resolve(f"v$v%08d")

  /** Highest committed version, or -1 for an empty log. Floors at the
    * latest checkpoint: a fully-pruned log (every pointer covered by
    * the checkpoint) must still tell appenders where the sequence
    * continues.
    */
  def currentVersion(root: String): Int = {
    val it = Files.list(commitsDir(root))
    try {
      import scala.jdk.CollectionConverters._
      it.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => (n.startsWith("v") || n.startsWith("c")) &&
          !n.endsWith(".tmp"))
        .map(n => n.drop(1).toInt)
        .foldLeft(-1)(math.max)
    } finally it.close()
  }

  /** The log in version order: (version, data directory it adds).
    * Enumerates the pointers that EXIST rather than assuming density —
    * a legacy resume may begin the log past absent predecessors (the
    * streaming state path), and future pointer retention may prune a
    * prefix; a log whose every version was committed here is dense.
    */
  def versions(root: String): Seq[(Int, String)] = {
    // list-then-read retries: a checkpoint may PRUNE a listed pointer
    // before its read (the documented reader guarantee is "the old
    // pointers or the checkpoint — never neither", so a vanished
    // pointer means a re-list now resolves through the checkpoint)
    var attempt = 0
    while (true) {
      val it = Files.list(commitsDir(root))
      val vs = try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala
          .map(_.getFileName.toString)
          .filter(n => n.startsWith("v") && !n.endsWith(".tmp"))
          .map(n => n.drop(1).toInt)
          .toSeq.sorted
      } finally it.close()
      try {
        return vs.map { v =>
          v -> new String(Files.readAllBytes(pointer(root, v)),
            java.nio.charset.StandardCharsets.UTF_8).trim
        }
      } catch {
        case e: java.nio.file.NoSuchFileException =>
          attempt += 1
          if (attempt > 16) throw e
      }
    }
    Seq.empty // unreachable
  }

  /** Latest checkpoint, if any: (version it covers through, snapshot
    * directory). The snapshot carries a `version` column so
    * per-version lineage survives consolidation.
    */
  def latestCheckpoint(root: String): Option[(Int, String)] = {
    val it = Files.list(commitsDir(root))
    val cs = try {
      import scala.jdk.CollectionConverters._
      it.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("c") && !n.endsWith(".tmp"))
        .map(n => n.drop(1).toInt)
        .toSeq.sorted
    } finally it.close()
    cs.lastOption.map { v =>
      v -> new String(Files.readAllBytes(
        commitsDir(root).resolve(f"c$v%08d")),
        java.nio.charset.StandardCharsets.UTF_8).trim
    }
  }

  /** Publishes a CHECKPOINT covering versions 0..upTo and prunes their
    * pointers — the log-compaction half of the protocol (Delta's
    * `_last_checkpoint`, Iceberg's snapshot expiry): without it,
    * resolving a year-old table means listing and reading a million
    * pointer files. The caller has already materialized the
    * consolidated snapshot (tagged with a `version` column) at
    * `snapshotDir`; this publishes the `c{upTo}` marker through the
    * same link(2) CAS (exactly one checkpointer wins a given version)
    * and only THEN deletes the covered pointers, so a concurrent
    * reader resolves either the old pointers or the checkpoint —
    * never neither. `currentVersion` floors at the checkpoint, so
    * appenders continue past a fully-pruned log.
    */
  def checkpoint(root: String, upTo: Int, snapshotDir: String): Boolean = {
    // LAYERING GUARD: a later checkpoint must cover everything the
    // earlier one covered — its snapshot must be built from the
    // PREVIOUS checkpoint's snapshot ∪ the tail pointers (building it
    // from versions() alone would silently drop every already-pruned
    // version, then prune the survivors too). The API can't validate
    // snapshot contents, but it CAN refuse the two always-wrong calls:
    // re-checkpointing at or below the existing checkpoint, and
    // checkpointing past the committed head.
    latestCheckpoint(root).foreach { case (v, _) =>
      require(upTo > v,
        s"checkpoint at v$upTo does not advance past the existing " +
          s"checkpoint at v$v")
    }
    require(upTo <= currentVersion(root),
      s"checkpoint at v$upTo exceeds the committed head " +
        s"v${currentVersion(root)}")
    val target = commitsDir(root).resolve(f"c$upTo%08d")
    val tmp = commitsDir(root).resolve(
      f"c$upTo%08d.${java.util.UUID.randomUUID().toString}.tmp")
    Files.write(tmp,
      snapshotDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val won =
      try { Files.createLink(target, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
      finally Files.deleteIfExists(tmp)
    if (won) {
      (0 to upTo).foreach(v => Files.deleteIfExists(pointer(root, v)))
      // superseded checkpoint markers prune too — a periodically-
      // checkpointing writer (the streaming CLI) must not grow one
      // marker per batch; latestCheckpoint takes the max, so removing
      // older markers is invisible to readers
      (0 until upTo).foreach(v =>
        Files.deleteIfExists(commitsDir(root).resolve(f"c$v%08d")))
    }
    won
  }

  /** One CAS attempt: commit `dataDir` as version `expected + 1`.
    * Returns true iff this caller won. The primitive is `link(2)`
    * (`Files.createLink`), NOT rename: POSIX rename silently REPLACES
    * an existing target, so an ATOMIC_MOVE "CAS" lets two winners
    * clobber each other (caught by CommitLogSpec's race). link(2) is
    * atomic and fails with EEXIST when the pointer already exists —
    * and because the temp file is fully written before the link, a
    * reader can never observe a torn pointer.
    */
  def tryCommit(root: String, expected: Int, dataDir: String): Boolean = {
    val target = pointer(root, expected + 1)
    val tmp = commitsDir(root).resolve(
      f"v${expected + 1}%08d.${java.util.UUID.randomUUID().toString}.tmp")
    Files.write(tmp,
      dataDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    try {
      Files.createLink(target, tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  /** Commit with rebase-and-retry: `prepare` sees the CURRENT version
    * and returns the data directory to commit on top of it (a real
    * writer re-derives its delta against the new snapshot here — e.g.
    * re-checks its MERGE keys; an append-only writer returns the same
    * directory). Returns the version this committer won.
    */
  def commitRetry(root: String, maxAttempts: Int = 64)(
      prepare: Int => String): Int = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(root)
      val dataDir = prepare(cur)
      if (tryCommit(root, cur, dataDir)) return cur + 1
      attempt += 1
    }
    throw new IllegalStateException(
      s"commit lost $maxAttempts consecutive races under $root")
  }
}
