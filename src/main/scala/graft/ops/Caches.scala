package graft.ops

import org.apache.spark.sql.Dataset

/** Registry for caches persisted *inside* operators whose lifetime must
  * extend to the consumer's materialization — the operator can't unpersist
  * them itself without recomputing its own output (e.g. the range-
  * partitioned cache backing BH q-values).
  *
  * Entry points that materialize query results (Verify, Bench, a
  * long-lived serving session) call [[drain]] after each query so caches
  * never accumulate across queries. Operators that CAN release eagerly
  * (cleanup thunks) still do — draining an already-unpersisted dataset is
  * a harmless no-op.
  */
object Caches {
  private val bag = scala.collection.mutable.ArrayBuffer.empty[() => Unit]

  def register[T <: Dataset[_]](ds: T): T =
    synchronized { bag += (() => ds.unpersist()); ds }

  /** Register a localCheckpoint'ed Dataset for release at [[drain]] —
    * for the FINAL iterate of a checkpointing loop, which the operator's
    * returned plan still references lazily (releasing it before the
    * consumer materializes would make the lineage-truncated RDD
    * unrecoverable; intermediate iterates are released inline instead).
    */
  def registerCheckpoint[T <: Dataset[_]](ds: T): T =
    synchronized { bag += (() => releaseLocalCheckpoint(ds)); ds }

  def drain(): Unit = synchronized {
    bag.foreach(f => scala.util.Try(f()))
    bag.clear()
  }

  /** DRAIN-IMMUNE handoff of a computed state to a lazily-read returned
    * plan: round-trips through a scratch parquet and — when the source
    * was localCheckpoint'ed — releases its blocks IMMEDIATELY (the
    * write has fully consumed it). This replaces [[registerCheckpoint]]
    * for final iterates handed to consumers: a registered checkpoint is
    * released by ANY caller's [[drain]], and once the lineage is
    * truncated the reader cannot recompute — it crashes with
    * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND under concurrent queries on one
    * session (ConcurrencySpec). A parquet read needs no cache entry at
    * all; the scratch generations are reaped with an age grace
    * (Scratch.subTagged), so the write leaks neither blocks nor tmpfs.
    * Intermediate iterates inside solver loops stay on the
    * eager-checkpoint + inline-release pattern — they are never visible
    * to drain.
    */
  def parquetHandoff(df: org.apache.spark.sql.DataFrame, tag: String,
      released: Boolean = true): org.apache.spark.sql.DataFrame = {
    val p = graft.io.Scratch.subTagged(tag)
    df.write.mode("overwrite").parquet(p)
    if (released) releaseLocalCheckpoint(df)
    df.sparkSession.read.parquet(p)
  }

  private val standingBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Materializes a derivation ONCE per JVM × (tag, key) as a stable
    * scratch parquet and returns its path — the standing-table memo
    * shared by the warehouse layer's state builders and the Hi-C
    * fixture views. Use when the derivation is an INPUT a production
    * deployment reads from disk (a contact map, a fragments file, a
    * maintained state table), not work the calling query claims: at
    * corpus scale the re-synthesis per query is exactly the redundant
    * pass a standing table exists to avoid.
    */
  def standingParquet(tag: String, key: String)(
      build: String => Unit): String =
    standingBuilt.computeIfAbsent(
      tag + "_" + key.replaceAll("[^a-zA-Z0-9.-]", "_"), { _ =>
        val p = graft.io.Scratch.stable(tag + "_" +
          Integer.toHexString(key.hashCode))
        build(p)
        p
      })

  /** Free the blocks behind a localCheckpoint'ed Dataset. A plain
    * `ds.unpersist()` is a no-op there: the persisted RDD is the internal
    * checkpoint RDD wrapped by the plan's `LogicalRDD` leaf, not a cache
    * entry on the Dataset itself — so iterative loops that checkpoint per
    * round (BPE, KR, connected components) would otherwise leak one table
    * per round until RDD GC.
    */
  def releaseLocalCheckpoint(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
