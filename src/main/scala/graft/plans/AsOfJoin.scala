package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{DataFrame, GraftColumnBridge}

/** Whole-operator custom plan: backward AS-OF join — for every left row,
  * the LAST right row of the same key with right-time ≤ left-time
  * (inclusive), or nulls when none exists. The one operator family Spark's
  * built-ins genuinely lack as an OPERATOR: the composed form (union +
  * keyed window, q_join_asof) answers the same question but pushes
  * 2×(probes+markers) rows through one sort and a running-state window;
  * this node keeps the sides separate — each is hash-partitioned on its
  * own key and sorted (key, time), then a single streaming merge pass per
  * partition emits probes as it consumes markers. No union blow-up, no
  * window state, and the merge is O(|L| + |R|) per partition with zero
  * allocation beyond the retained match row.
  *
  * Scale shape (100 TB): two shuffles (one per side, each on its join
  * key — exactly what a sort-merge equi-join would do), arbitrarily many
  * keys per partition, nothing driver-side, and AQE coalesces the two
  * exchanges together because they feed one stage. Contract: key and time
  * are LongType (callers lift timestamps via Cols.epochUs); null keys or
  * times never match (left row still emitted, null-extended); among
  * EQUAL (key, time) right rows the retained match is the last in
  * partition sort order, which the (key, time) sort leaves unspecified —
  * callers needing a deterministic payload must make time unique per key
  * or keep the payload order-insensitive (q_join_asof_native's payload
  * IS the time, so ties are value-identical).
  *
  * The full preference-(c) route from SURVEY §4: logical node → planner
  * Strategy → physical exec, registered per-session through
  * `experimental.extraStrategies` and globally through
  * `graft.functions.GraftExtensions` (spark.sql.extensions).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // each side clusters on its own key; EnsureRequirements co-partitions
  // the pair (same numPartitions) exactly as for a shuffled equi-join
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  // (key, time) ascending both sides — the merge's only precondition.
  // Sorts are planned by EnsureRequirements, so an already-sorted child
  // (e.g. a bucketed+sorted source) pays nothing.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    require(leftKey.dataType == LongType && rightKey.dataType == LongType &&
      leftTime.dataType == LongType && rightTime.dataType == LongType,
      "asof join: key and time must be LongType (lift timestamps first)")
    // primitive ordinal access on the hot path: after binding, a plain
    // column reference IS a BoundReference — read the long directly with
    // no Expression.eval boxing per row (the merge visits every row of
    // both sides exactly once)
    def ordinalOf(e: Expression, schema: Seq[Attribute]): Int =
      BindReferences.bindReference(e, schema) match {
        case b: org.apache.spark.sql.catalyst.expressions.BoundReference =>
          b.ordinal
        case other => sys.error(
          s"asof join: key/time must be plain columns, got $other")
      }
    val lkOrd = ordinalOf(leftKey, left.output)
    val ltOrd = ordinalOf(leftTime, left.output)
    val rkOrd = ordinalOf(rightKey, right.output)
    val rtOrd = ordinalOf(rightTime, right.output)
    val nRight = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIter.buffered
      new Iterator[InternalRow] {
        private var curKey = 0L
        private var inKey = false
        private var lastMatch: InternalRow = _
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          if (l.isNullAt(lkOrd) || l.isNullAt(ltOrd))
            return proj(joined(l, nullRight))
          val k = l.getLong(lkOrd); val t = l.getLong(ltOrd)
          if (!inKey || k != curKey) { curKey = k; inKey = true
            lastMatch = null }
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val h = rBuf.head
            if (h.isNullAt(rkOrd) || h.isNullAt(rtOrd)) rBuf.next()
            else {
              val rkv = h.getLong(rkOrd)
              if (rkv < k || (rkv == k && h.getLong(rtOrd) <= t)) {
                val r = rBuf.next()
                // iterator rows are reused buffers — retain a copy
                if (rkv == k) lastMatch = r.copy()
              } else advancing = false
            }
          }
          proj(joined(l, if (lastMatch != null) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Backward as-of join of `left` against `right` on long key + long
    * time columns (named, resolved against each side). Installs the
    * planner strategy on the session if absent.
    */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        sys.error(s"asof join: no column '$n' in ${p.output.map(_.name)}"))
    GraftColumnBridge.ofRows(spark, AsOfJoinPlan(lp, rp,
      attr(lp, leftKey), attr(rp, rightKey),
      attr(lp, leftTime), attr(rp, rightTime)))
  }
}
