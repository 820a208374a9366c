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
  *
  * == Commit classes ==
  *
  * The log arbitrates version ORDER for two distinct table shapes, and
  * the rebase obligation after a lost CAS differs:
  *
  *   - APPEND-ONLY snapshots (snapshot V = union of data dirs 0..V):
  *     a loser's prepared data directory is still valid verbatim — the
  *     winner only added rows the loser never claimed to know about.
  *     Rebase = retry the CAS at the new version with the SAME dir
  *     ([[commitRetry]] with a prepare that ignores its argument).
  *   - STATE-REPLACING versions (each data dir is the FULL state, the
  *     streaming CLI's shape): a loser's prepared state was derived
  *     from a snapshot the winner has REPLACED — recommitting it
  *     verbatim would silently drop the winner's changes (lost
  *     update). Rebase = RE-DERIVE the state from the WINNER's
  *     snapshot (re-apply the changeset on the new base), then retry.
  *     [[commitStateRetry]] enforces this mechanically by handing
  *     `prepare` the current HEAD SNAPSHOT each attempt;
  *     CommitLogSpec pins the law — the final state of two racing
  *     state committers equals sequential application of both
  *     changesets in winner order, and a loser that (incorrectly)
  *     recommits its stale derivation is detectably wrong.
  */
object CommitLog {
  private def commitsDir(root: String): Path = {
    val d = Paths.get(root, "commits")
    Files.createDirectories(d)
    d
  }

  private def pointer(root: String, v: Int): Path =
    commitsDir(root).resolve(f"v$v%08d")

  /** Read-only listing of the commits dir's entry names. Reads must
    * not MUTATE: [[commitsDir]] creates the directory (right for the
    * write paths), but a reader probing a root that has never
    * committed — `Caches.vacuumStanding` walking arbitrary dirs under
    * a shared standing root, a query resolving a legacy pre-log
    * layout — would otherwise scatter empty `commits/` dirs into
    * directories it doesn't own.
    */
  private def listCommitNames(root: String): Seq[String] = {
    val d = Paths.get(root, "commits")
    if (!Files.isDirectory(d)) return Seq.empty
    val it = Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      it.iterator().asScala.map(_.getFileName.toString).toSeq
    } finally it.close()
  }

  /** The ONE slot-number parser for commits/ entry names: digits after
    * the one-char prefix, LENGTH-BOUNDED to 9 so a foreign all-digit
    * name longer than an Int (operator artifact, corrupted file —
    * 'v9999999999') is IGNORED by listings instead of throwing
    * NumberFormatException out of a WON checkpoint's prune walk or any
    * currentVersion/versions read (Warehouse.numOf was bounded for
    * exactly this failure mode).
    */
  private def slotNum(n: String): Option[Int] = {
    val digits = n.drop(1)
    if (digits.nonEmpty && digits.length <= 9 &&
      digits.forall(_.isDigit)) Some(digits.toInt) else None
  }

  /** Highest committed version, or -1 for an empty log. Floors at the
    * latest checkpoint: a fully-pruned log (every pointer covered by
    * the checkpoint) must still tell appenders where the sequence
    * continues.
    */
  def currentVersion(root: String): Int =
    listCommitNames(root)
      .filter(n => (n.startsWith("v") || n.startsWith("c")) &&
        !n.endsWith(".tmp"))
      .flatMap(slotNum)
      .foldLeft(-1)(math.max)

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
      val vs = listCommitNames(root)
        .filter(n => n.startsWith("v") && !n.endsWith(".tmp"))
        .flatMap(slotNum)
        .sorted
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
    *
    * Same list-then-read prune race as [[versions]]: [[checkpoint]]
    * deletes SUPERSEDED c-markers after publishing a newer one, so a
    * concurrent reader (or a racing second checkpointer's layering
    * guard) can list c(N) and then find it vanished because c(N+1)
    * won. Markers only ever prune in favor of a NEWER marker, so the
    * newest-first read falls back to the next candidate and a full
    * re-list bounds the loop — the documented "old pointers or the
    * checkpoint, never neither" guarantee holds for markers too.
    */
  def latestCheckpoint(root: String): Option[(Int, String)] =
    latestCheckpointRaw(root).map { case (v, content) =>
      v -> content.linesIterator.next().trim
    }

  /** Newest marker's (version, FULL content). Line 1 is the snapshot
    * directory; line 2 is the lineage FLOOR (`floor<TAB>n` — every
    * slot ≤ n has had its lineage line evicted by retention); the
    * remaining lines are the pointer LINEAGE — one
    * `version<TAB>payload` row per RETAINED version the checkpoint
    * chain has pruned. The lineage is what makes [[tryCommit]]'s
    * covered-slot post-check DECIDABLE: "was version N's pointer MY
    * payload before the prune?" cannot be answered from pointer
    * presence (a genuine win whose slot the pruner hasn't deleted yet
    * looks identical to a zombie re-link), only from a durable record
    * of what each slot held when it became history. Retention bounds
    * the marker at O(lineageRetain) — without it a per-micro-batch
    * checkpointing stream rewrites one line per version EVER committed
    * into every marker (O(n²) total marker I/O over its life).
    */
  private def latestCheckpointRaw(root: String): Option[(Int, String)] = {
    var attempt = 0
    while (attempt <= 16) {
      val cs = listCommitNames(root)
        .filter(n => n.startsWith("c") && !n.endsWith(".tmp"))
        .flatMap(slotNum)
        .sorted(Ordering.Int.reverse)
      if (cs.isEmpty) return None
      // read ONLY the newest marker: an older one from the same
      // listing may pair a stale snapshot with pointers the newer
      // checkpoint has since pruned. A newest marker that vanished
      // mid-read was superseded by a strictly NEWER one, which the
      // re-list resolves.
      val v = cs.head
      try {
        return Some(v -> new String(Files.readAllBytes(
          commitsDir(root).resolve(f"c$v%08d")),
          java.nio.charset.StandardCharsets.UTF_8).trim)
      } catch {
        case _: java.nio.file.NoSuchFileException => ()
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"latestCheckpoint under $root: markers kept vanishing across " +
        "16 re-lists")
  }

  /** The latest checkpoint's pruned-slot lineage: version → the payload
    * its pointer held when it became history (empty when no checkpoint
    * exists). Spec surface for the covered-slot ownership law.
    */
  private[graft] def checkpointLineage(root: String): Map[Int, String] =
    latestCheckpointRaw(root).map(r => markerLineage(r._2))
      .getOrElse(Map.empty)

  /** Parses a marker's lineage lines (everything after line 1; the
    * `floor` line is skipped by the all-digits guard).
    */
  private def markerLineage(content: String): Map[Int, String] =
    content.linesIterator.drop(1).flatMap { ln =>
      ln.split('\t') match {
        case Array(v, payload) if v.nonEmpty && v.forall(_.isDigit) =>
          Some(v.toInt -> payload)
        case _ => None
      }
    }.toMap

  /** The marker's lineage floor: every slot ≤ this version has had its
    * lineage evicted by retention. -1 on markers that retain
    * everything — pre-retention legacy markers, and a marker whose
    * floor line is malformed (degrade like [[markerLineage]]'s digit
    * guard: a corrupt floor must not wedge every later checkpoint
    * and covered-slot verdict on a parse exception).
    */
  private def markerFloor(content: String): Int =
    content.linesIterator.drop(1).collectFirst {
      case ln if ln.startsWith("floor\t") &&
          ln.drop(6).trim.nonEmpty && ln.drop(6).trim.forall(_.isDigit) =>
        ln.drop(6).trim.toInt
    }.getOrElse(-1)

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
  def checkpoint(root: String, upTo: Int, snapshotDir: String,
      lineageRetain: Int = 256): Boolean = {
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
    // LINEAGE GATHER (before publish): record what every slot this
    // checkpoint chain prunes actually held. Previous-marker lineage
    // takes PRECEDENCE over a listed pointer at the same version —
    // history is immutable, so a pointer sitting below the previous
    // checkpoint is definitionally a zombie re-link whose payload must
    // NOT overwrite the true owner's record. Versions above the
    // previous checkpoint can only come from live pointers. READ ORDER
    // matters: pointers FIRST, marker second — a concurrent
    // checkpointer that publishes+prunes between the two reads then
    // shows up in the marker read (markers are supersets over the
    // retained window); the reverse order can miss both.
    //
    // RETENTION: only the newest `lineageRetain` slots keep lineage
    // lines; everything below is evicted behind a monotonic FLOOR, so
    // a per-micro-batch checkpointing stream writes O(retain) markers
    // forever instead of one line per version ever committed. The
    // covered-slot verdict below the floor becomes UNDECIDABLE — safe,
    // because tryCommit REFUSES (throws) rather than guesses there,
    // and reaching it requires a committer suspended between its link
    // and its post-check for as long as the log takes to advance
    // `lineageRetain` versions (micro-seconds of code, hundreds of
    // commits — size retain to the deployment's suspension SLA).
    val gathered = versions(root).filter(_._1 <= upTo).toMap
    val prevRaw = latestCheckpointRaw(root)
    val prevLineage = prevRaw.map(r => markerLineage(r._2))
      .getOrElse(Map.empty)
    val prevFloor = prevRaw.map(r => markerFloor(r._2)).getOrElse(-1)
    val floor = math.max(prevFloor, upTo - math.max(1, lineageRetain))
    val lineage = (gathered ++ prevLineage).toSeq.sortBy(_._1)
      .filter(_._1 > floor)
    val target = commitsDir(root).resolve(f"c$upTo%08d")
    val tmp = commitsDir(root).resolve(
      f"c$upTo%08d.${java.util.UUID.randomUUID().toString}.tmp")
    Files.write(tmp,
      (snapshotDir +: s"floor\t$floor" +:
        lineage.map { case (v, p) => s"$v\t$p" })
        .mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val won =
      try { Files.createLink(target, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
      finally Files.deleteIfExists(tmp)
    if (won) {
      // prune exactly the entries that EXIST (one listing, O(live)
      // deletes) rather than sweeping 0..upTo — a per-micro-batch
      // checkpointing stream at version N would otherwise issue ~2N
      // deleteIfExists calls per batch (O(n²) metadata ops over its
      // life, the same cost profile lineage retention just removed
      // from the markers). Listing also cleans crash residue a
      // "start after the previous checkpoint" bound would leak: a
      // checkpointer that died between its link and its prune leaves
      // covered pointers and a stale marker BELOW the previous
      // checkpoint, and this walk still finds them.
      // Superseded markers prune too — latestCheckpoint takes the
      // max, so removing older markers is invisible to readers.
      listCommitNames(root).foreach { n =>
        if (!n.endsWith(".tmp"))
          slotNum(n).foreach { v =>
            if ((n.startsWith("v") && v <= upTo) ||
                (n.startsWith("c") && v < upTo))
              Files.deleteIfExists(commitsDir(root).resolve(n))
          }
      }
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
    // CHECKPOINT FLOOR: a checkpoint PRUNES the pointers it covers —
    // those version slots are history, not vacancies. Without this
    // check a committer holding a stale `expected` (a second run that
    // listed the log before the winner's first commit) finds the
    // pruned slot ABSENT and re-links it, "winning" a version below
    // the checkpoint — a zombie pointer that corrupts the version
    // sequence for every reader. Found by a live two-process race:
    // the winner committed v0,v1 and checkpointed c0; the loser's
    // seed CAS at expected=-1 then re-created v0.
    def coveredBy(cp: Option[(Int, String)]): Boolean =
      cp.exists(_._1 >= expected + 1)
    if (coveredBy(latestCheckpoint(root))) return false
    val target = pointer(root, expected + 1)
    val tmp = commitsDir(root).resolve(
      f"v${expected + 1}%08d.${java.util.UUID.randomUUID().toString}.tmp")
    Files.write(tmp,
      dataDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val linked =
      try {
        Files.createLink(target, tmp)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      } finally Files.deleteIfExists(tmp)
    if (linked) {
      latestCheckpointRaw(root) match {
        case Some((cv, content)) if cv >= expected + 1 =>
          decideCoveredSlot(root, expected + 1, dataDir, content,
            target)
        case _ => true
      }
    } else false
  }

  /** The covered-slot verdict after a successful link: a checkpoint
    * covering our slot appeared inside the link→post-check window.
    * THREE cases share this observation and pointer presence cannot
    * tell them apart — the marker decides:
    *  - lineage(slot) == our payload: we genuinely won and a fast peer
    *    committed past us and checkpointed — our commit is durable
    *    history; reporting a loss here would make
    *    commitRetry/commitStateRetry DOUBLE-APPLY the changeset (the
    *    exactly-once violation).
    *  - lineage(slot) is someone else's (or absent above the floor):
    *    the slot was another committer's — the live-race zombie;
    *    un-publish the re-link and lose.
    *  - slot ≤ the lineage FLOOR: retention evicted the record, the
    *    verdict is UNDECIDABLE — refuse loudly. Losing here could
    *    double-apply a genuine win; winning could resurrect a zombie.
    *    Reaching this requires a committer suspended between its link
    *    and this check for as long as the log took to advance
    *    `lineageRetain` versions — a crashed-and-thawed process, not
    *    a code path; the throw turns it into a visible operator
    *    incident instead of silent corruption.
    */
  private[graft] def decideCoveredSlot(root: String, slot: Int,
      dataDir: String, markerContent: String, target: Path): Boolean = {
    if (markerLineage(markerContent).get(slot).contains(dataDir)) true
    else if (slot <= markerFloor(markerContent)) {
      Files.deleteIfExists(target)
      throw new IllegalStateException(
        s"commit verdict for slot v$slot under $root is undecidable: " +
          "the slot is below the checkpoint lineage floor " +
          s"(${markerFloor(markerContent)}) — this committer was " +
          "suspended past the lineage retention horizon between its " +
          "link and its post-check; refusing to guess between a " +
          "genuine win (loss ⇒ double-apply) and a zombie re-link " +
          "(win ⇒ resurrected slot)")
    } else {
      Files.deleteIfExists(target)
      false
    }
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

  /** Snapshot directory of the current HEAD version — the full state a
    * STATE-REPLACING committer must re-derive from. Resolves the head
    * pointer when one exists, else the latest checkpoint (a
    * fully-pruned log's head data lives in its snapshot); None on an
    * empty log. Re-resolves on the same prune race as [[versions]]:
    * a head pointer can only vanish in favor of a checkpoint covering
    * it or a newer head.
    */
  def headSnapshot(root: String): Option[(Int, String)] = {
    var attempt = 0
    while (attempt <= 16) {
      val cur = currentVersion(root)
      if (cur < 0) return None
      try {
        return Some(cur -> new String(Files.readAllBytes(
          pointer(root, cur)), java.nio.charset.StandardCharsets.UTF_8)
          .trim)
      } catch {
        case _: java.nio.file.NoSuchFileException =>
          latestCheckpoint(root) match {
            case Some((v, snap)) if v >= cur => return Some(v -> snap)
            case _ => () // pruned mid-read by a NEWER commit: re-list
          }
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"headSnapshot under $root: head kept vanishing across 16 re-lists")
  }

  /** Commit-with-rebase for the STATE-REPLACING class (see the commit
    * classes note above): each attempt hands `prepare` the current
    * version AND the current head snapshot directory (None on an
    * empty log), and `prepare` must derive the FULL next state from
    * THAT base — never from a snapshot it read before the attempt. A
    * CAS loss therefore re-applies the changeset on the winner's
    * state, which is exactly serial execution in winner order; the
    * loser's previously-prepared directory is abandoned (the caller's
    * scratch discipline reaps it). Returns the version this committer
    * won.
    */
  def commitStateRetry(root: String, maxAttempts: Int = 64)(
      prepare: (Int, Option[String]) => String): Int = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val cur = currentVersion(root)
      val dataDir = prepare(cur, headSnapshot(root).map(_._2))
      if (tryCommit(root, cur, dataDir)) return cur + 1
      attempt += 1
    }
    throw new IllegalStateException(
      s"state commit lost $maxAttempts consecutive races under $root")
  }
}
