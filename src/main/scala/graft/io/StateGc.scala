package graft.io

/** Shared garbage collection for commit-log-arbitrated state roots —
  * the dedup state (`llm.Selection`) and the ANN index (`llm.Pq`) are
  * the same table shape under maintenance (versioned dirs named by
  * committed manifests), and their reap/vacuum rules must not diverge:
  * the two hand-rolled copies already did once (the index-side vacuum
  * forgot that a BUILT-but-never-maintained root has an empty log, so
  * `everReferenced` came back empty and the live build dirs aged into
  * "crash residue" — callers now pass the LIVE manifest's dirs
  * explicitly, see [[vacuum]]).
  *
  * Both entry points take the caller's manifest knowledge as plain
  * data (each committed manifest's dir names, a dir-name pattern) so
  * the policy lives here exactly once:
  *
  *  - [[reapSuperseded]]: one-version-grace reclamation of SUPERSEDED
  *    history — dirs referenced by some committed manifest but rotated
  *    out of the last two (in-flight readers pin at most one swap
  *    behind). Never-referenced dirs are NOT touched: a concurrent
  *    committer's staged-but-uncommitted dirs are indistinguishable
  *    from crash residue by any age heuristic (staging a corpus-scale
  *    rewrite can outlast any grace while its mtime sits frozen), and
  *    deleting them hands the CAS winner a manifest of reaped paths.
  *  - [[vacuum]]: operator-invoked reclamation of NEVER-REFERENCED
  *    staging (runs that died before their CAS), age-guarded — the
  *    caller asserts no maintenance job older than `olderThanMs` is
  *    still staging against this root (the lakehouse VACUUM contract).
  */
object StateGc {
  /** Reaps state dirs referenced by a committed manifest but rotated
    * out of the newest two. `manifests` is every committed manifest's
    * dir names in version order (parse failures skipped by the
    * caller); `pattern` gates which entry names are state dirs at all
    * (never books/cents/commits or foreign files).
    */
  def reapSuperseded(root: String, manifests: Seq[Seq[String]],
      pattern: String => Boolean): Unit = {
    if (manifests.isEmpty) return
    val keep = manifests.takeRight(2).flatten.toSet
    val everReferenced = manifests.flatten.toSet
    Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty[java.io.File]).foreach { f =>
        val n = f.getName
        if (pattern(n) && everReferenced.contains(n) && !keep.contains(n))
          Scratch.reap(f.getPath)
      }
  }

  /** Reaps state dirs that match `pattern`, are older than
    * `olderThanMs`, and appear in NO committed manifest — crash
    * residue. `referenced` must include the LIVE manifest's dirs as
    * well as every committed one: on a built-but-never-maintained root
    * the log is empty and the live (legacy-layout) dirs are the whole
    * index — without them in the set, a routine vacuum past retention
    * would delete the live tables. Returns reaped names.
    */
  def vacuum(root: String, referenced: Set[String],
      pattern: String => Boolean, olderThanMs: Long): Seq[String] = {
    val now = System.currentTimeMillis()
    Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty[java.io.File]).toSeq
      .filter { f =>
        pattern(f.getName) && !referenced.contains(f.getName) &&
          now - f.lastModified() > olderThanMs
      }
      .map { f => Scratch.reap(f.getPath); f.getName }
  }
}
