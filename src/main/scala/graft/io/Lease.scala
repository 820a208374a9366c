package graft.io

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Single-writer LEASE on a durable streaming root — the missing
  * front door of the split-brain story.
  *
  * The commit-log CAS makes a second writer's STATE commits lose
  * (exactly-once is safe), but it arbitrates too late to protect the
  * shared Spark checkpoint: a second streaming CLI on the same root
  * starts its own query against the same offset WAL, and before its
  * first state CAS can kill it it may (a) record an offset range for a
  * batch id the winner folds differently — Spark's HDFSMetadataLog is
  * first-writer-wins, so whichever process loses the WAL write dies
  * with "concurrent update" (BOTH queries can die, not just the
  * arbitrated loser), and (b) leave a recorded range no surviving
  * process actually folded, which a LATER resume trusts — the
  * replay-skip guard then starts the next batch from a boundary the
  * state never reached, silently shifting the folded window. Live
  * two-process race on one root reproduced exactly this: state commits
  * stayed exactly-once through the race, both queries died, and the
  * post-resume external audit caught a ±1-per-pair shifted fold.
  *
  * The lease closes the entry point: a writer acquires `$root/LEASE`
  * BEFORE creating its streaming query, so the second CLI dies before
  * it ever touches the checkpoint. Liveness is a heartbeat (a daemon
  * thread bumps the file's mtime); a crashed owner's lease goes stale
  * after `graceMs` and the next writer takes over. The takeover CAS is
  * the same link(2) primitive as the commit log, so two simultaneous
  * takeover attempts serialize. The state-CAS split-brain guard stays
  * as the backstop for writers that bypass the lease (an operator
  * pointing a raw Spark job at the root).
  *
  * Contract notes: `graceMs` must exceed the longest heartbeat stall
  * the deployment tolerates (GC pause, NFS hiccup) — a stalled-but-live
  * owner losing its lease degrades to the pre-lease world (the CAS
  * backstop still keeps state correct, and the WAL hazard window
  * reopens only for that overlap). Resume after kill -9 must wait out
  * the grace; the default is seconds, not minutes, for exactly that
  * operational path.
  */
final class Lease private (path: String, uuid: String,
    heartbeatMs: Long) {
  @volatile private var held = true

  private val beat = new Thread(() => {
    while (held) {
      try Files.setLastModifiedTime(Paths.get(path),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis()))
      catch { case _: Throwable => () }
      // the sleep is guarded too: an InterruptedException must not
      // silently kill the heartbeat while `held` stays true — a
      // frozen-mtime lease would be taken over after graceMs with the
      // owner still running, believing it holds. (Guarded SEPARATELY
      // from the mtime bump so a persistent bump failure still sleeps
      // instead of busy-looping.)
      try Thread.sleep(heartbeatMs)
      catch { case _: Throwable => () }
    }
  }, s"lease-heartbeat-$uuid")
  beat.setDaemon(true)
  beat.start()

  // release on graceful JVM exit (SIGTERM / normal return); kill -9
  // leaves the file and the grace window handles it
  private val hook = new Thread(() => releaseQuietly())
  Runtime.getRuntime.addShutdownHook(hook)

  private def releaseQuietly(): Unit =
    try release() catch { case _: Throwable => () }

  /** Stops the heartbeat and deletes the lease file — but only if this
    * lease still owns it (a takeover after a long stall means the file
    * is someone else's now; deleting it would unseat THEM).
    */
  def release(): Unit = if (held) {
    held = false
    try {
      val p = Paths.get(path)
      if (Files.exists(p) && new String(Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8).startsWith(uuid))
        Files.deleteIfExists(p)
    } finally {
      try Runtime.getRuntime.removeShutdownHook(hook)
      catch { case _: Throwable => () } // already shutting down
    }
  }
}

object Lease {
  /** Acquire the lease at `path` or throw: a LIVE owner (mtime within
    * `graceMs`) refuses the caller loudly; a stale one is taken over
    * through a link(2) CAS so concurrent takeovers serialize.
    */
  def acquire(path: String, heartbeatMs: Long = 1000,
      graceMs: Long = 5000): Lease = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val uuid = java.util.UUID.randomUUID().toString
    val content = s"$uuid pid=${ProcessHandle.current().pid()}"
    var attempt = 0
    while (attempt < 3) {
      val tmp = Paths.get(path + "." + uuid + ".tmp")
      Files.write(tmp, content.getBytes(
        java.nio.charset.StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      val won =
        try { Files.createLink(p, tmp); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
        finally Files.deleteIfExists(tmp)
      if (won) return new Lease(path, uuid, heartbeatMs)
      // holder exists: live → refuse; stale → take over (atomic
      // rename-to-tombstone — exactly one of N racing takeover-ers'
      // moves succeeds) and retry the CAS; the losers loop back and
      // see either the winner's fresh lease (refuse) or a clear path
      val age =
        try System.currentTimeMillis() -
          Files.getLastModifiedTime(p).toMillis
        catch { case _: java.nio.file.NoSuchFileException => Long.MaxValue }
      if (age < graceMs)
        throw new IllegalStateException(
          s"lease at $path is held by a live writer (heartbeat " +
            s"${age} ms ago < grace $graceMs ms) — refusing to start: " +
            "a second streaming writer on this root would race the " +
            "shared checkpoint's offset WAL, which no commit-log CAS " +
            "protects")
      // Takeover by ATOMIC RENAME to a unique tombstone, never a bare
      // delete: with two concurrent takeover attempts, a loser's
      // delayed deleteIfExists could land AFTER the winner's fresh
      // link and unseat a live owner (both would then hold the lease —
      // the exact split-brain this file exists to prevent). Only the
      // process whose rename succeeds owns the removal; the loser's
      // move throws NoSuchFileException and loops back to the CAS.
      val tomb = Paths.get(path + "." + uuid + ".tomb")
      val moved =
        try { Files.move(p, tomb,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE); true }
        catch { case _: java.nio.file.NoSuchFileException => false }
      if (moved) {
        // the move is atomic but not conditional: between our staleness
        // check and the move, a THIRD writer may have taken over and
        // linked a FRESH lease at p — the mtime travels with the move,
        // so re-check it on the tombstone and restore (re-link) a
        // fresh one instead of destroying it
        val movedAge =
          try System.currentTimeMillis() -
            Files.getLastModifiedTime(tomb).toMillis
          catch { case _: java.nio.file.NoSuchFileException => Long.MaxValue }
        if (movedAge < graceMs) {
          try Files.createLink(p, tomb)
          catch { case _: java.nio.file.FileAlreadyExistsException => () }
          Files.deleteIfExists(tomb)
          throw new IllegalStateException(
            s"lease at $path was re-acquired by a live writer during " +
              "takeover — refusing to start")
        }
        Files.deleteIfExists(tomb)
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"lease at $path: lost 3 consecutive takeover races")
  }
}
