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
  private val bag = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  def register[T <: Dataset[_]](ds: T): T = synchronized { bag += ds; ds }

  def drain(): Unit = synchronized {
    bag.foreach(_.unpersist())
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
