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
