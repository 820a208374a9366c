package graft.io

import java.nio.file.{Files, Path}
import java.util.Comparator
import java.util.concurrent.atomic.AtomicLong

/** Per-JVM scratch directories for queries that exercise a sink + re-read
  * (q_csv_roundtrip, q_sink_partitioned). Every call gets a UNIQUE subdir
  * (two concurrent runs must never clobber each other's files mid-read),
  * but all of them live under one per-JVM base that a shutdown hook
  * deletes — without this, each bench invocation (3 runs/query) plus
  * Verify/DevSmoke/PlanSpec left another full table copy in /tmp forever.
  */
object Scratch {
  private val counter = new AtomicLong()

  private lazy val base: Path = {
    // Prefer a tmpfs mount when one exists: the sink/roundtrip queries
    // time a full table write + re-read, and /tmp on a shared spinning
    // root has produced a load-noise driver flag every round (BASELINE
    // r9 orc, r10 orc, r11 csv). Output content is identical either way.
    // Guarded: SPARK_GRAFT_NO_SHM=1 opts out entirely (matching the
    // other SPARK_GRAFT_* dev knobs), and a mount with <4 GiB usable is
    // skipped — a scale-probe write onto a nearly-full tmpfs would fail
    // mid-query instead of just running slower on disk.
    val shm = java.nio.file.Paths.get("/dev/shm")
    val shmOk = !sys.env.get("SPARK_GRAFT_NO_SHM").exists(_ == "1") &&
      Files.isDirectory(shm) && Files.isWritable(shm) &&
      (try shm.toFile.getUsableSpace >= (4L << 30)
       catch { case _: Throwable => false })
    val p =
      if (shmOk) Files.createTempDirectory(shm, "graft_scratch_")
      else Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(p)))
    p
  }

  /** A fresh empty directory, reaped at JVM exit. */
  def sub(tag: String): String =
    Files.createDirectories(
      base.resolve(s"${tag}_${counter.incrementAndGet()}")).toString

  private val generations =
    new java.util.concurrent.ConcurrentHashMap[
      String, java.util.Queue[String]]()

  /** [[sub]] with BOUNDED accumulation: each call reaps this tag's
    * stale prior generations (a long serving session no longer grows
    * tmpfs by one state copy per invocation). A generation is reaped
    * only when BOTH graces pass: it is older than `minAgeMs` (age
    * grace) AND at least one newer PRIOR generation exists beyond the
    * directory being created now (count grace — the most recent prior
    * is always retained regardless of age, because a consumer of a
    * lazily-returned plan, e.g. a `parquetHandoff` frame, may
    * materialize it well after `minAgeMs` while a later invocation of
    * the same operator tag races this reaper).
    */
  def subTagged(tag: String, minAgeMs: Long = 60000L): String = {
    val q = generations.computeIfAbsent(tag,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[String]())
    val d = sub(tag)
    // the reap DECISION runs under the queue's lock: an unlocked
    // peek-check-poll pair lets a concurrent caller poll a DIFFERENT
    // (newer, unchecked) element than the one the condition approved —
    // reaping the very generation the count grace protects. The reap
    // I/O itself runs AFTER the monitor is released: a slow recursive
    // delete of a large state generation must not stall every
    // concurrent subTagged caller for this tag (the lock protects the
    // queue, not the filesystem — a polled path is exclusively owned)
    val doomed = scala.collection.mutable.ArrayBuffer.empty[String]
    q.synchronized {
      // q.size >= 2 ⇒ after the add below the head has ≥2 newer
      // generations — reaping it leaves the one-generation grace intact
      while (q.size() >= 2 && {
          val prior = q.peek()
          prior != null && {
            val f = new java.io.File(prior)
            !f.exists() ||
              System.currentTimeMillis() - f.lastModified() > minAgeMs
          }
        }) {
        val p = q.poll()
        if (p != null) doomed += p
      }
      q.add(d)
    }
    doomed.foreach(reap)
    d
  }

  /** A DETERMINISTIC (per tag, per JVM) directory under the same reaped
    * base — for callers that must re-find the path later in the JVM,
    * e.g. the bucketed-table cache keyed by sfDir. Cross-process safety
    * comes from `base` itself being a fresh temp dir per JVM.
    */
  def stable(tag: String): String =
    Files.createDirectories(base.resolve(tag)).toString

  /** Eagerly reap one scratch path (e.g. a superseded layout version)
    * instead of waiting for the JVM-exit hook — tmpfs space is finite.
    */
  def reap(path: String): Unit =
    deleteTree(java.nio.file.Paths.get(path))

  private def deleteTree(p: Path): Unit =
    try {
      if (Files.exists(p))
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => { try Files.delete(f) catch { case _: Throwable => () } })
    } catch { case _: Throwable => () }
}
