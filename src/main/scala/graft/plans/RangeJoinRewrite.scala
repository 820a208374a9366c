package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, EqualTo, Explode, Expression, If, IsNotNull, LessThanOrEqual, Literal, PredicateHelper, Sequence, ShiftRight}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}

/** Band-join bin rewrite — the injected-OPTIMIZER-RULE leg of the custom
  * Catalyst surface (SURVEY §4 preference (c); the as-of node covers the
  * Strategy/Exec leg, BinomSf & co. the Expression leg).
  *
  * A join whose only condition is a range/band predicate
  * (`lo ≤ point ≤ hi` with `point` from one side and `lo`,`hi` from the
  * other) has no equi key, so Spark plans BroadcastNestedLoopJoin — or a
  * cartesian product when neither side fits a broadcast. At 100 TB both
  * are non-starters: BNLJ is O(|L|·|R|) comparisons and the cartesian
  * shuffles everything everywhere. The classic fix (public Databricks /
  * Flink interval-join design) is BINNING: pick a bin width W, key the
  * point side by `floor(point / W)`, replicate each interval row to every
  * bin overlapping `[lo, hi]`, and equi-join on the bin — each matching
  * pair meets in EXACTLY the point's bin, so re-applying the original
  * band predicate yields identical semantics with a plain shuffled
  * hash/sort-merge join: two partitioned exchanges instead of a
  * broadcast-everything loop, and interval rows fan out only
  * `span/W + 1 ≤ 2` times when W is chosen at or above the typical span.
  *
  * CONTRACT on W vs span (part of the opt-in): the rewrite replicates
  * an interval to `span/W + 1` bins via `Sequence`, which caps at
  * Spark's max array length — a tail row whose span exceeds ~2³¹·W
  * (an open-ended interval encoded as `hi = Long.MaxValue`, say) fails
  * the rewritten query with a runtime too-long-sequence error where
  * the un-rewritten join would have crawled through. There is no safe
  * per-row fallback (dropping the row loses matches; a different join
  * shape per row doesn't exist), so the marker caller owns the bound:
  * pick W so the LARGEST span fans out acceptably, and encode
  * open-ended intervals with a domain cap, not MaxValue. Both in-tree
  * call sites satisfy this by construction (session-bounded spans vs
  * a 2³¹ µs bin).
  *
  * Opt-in is per-join via a MARKER in the join condition
  * ([[RangeBinMarker]], built by [[RangeJoin.marker]]): a non-foldable
  * boolean conjunct that always evaluates true, referencing both sides so
  * no optimizer batch can push it out of the condition. A session without
  * the rule executes the marker as `true` — the query degrades to the
  * un-rewritten plan, never to a wrong answer. The rule itself rewrites
  *
  * {{{ Join(L, R, Inner, band ∧ marker(W, point, lo, hi)) }}}
  * into
  * {{{ Project(out, Join(L + bin(point), explode_bins(R), Inner,
  *                       binL = binR ∧ band)) }}}
  *
  * Contract (mirrors the as-of node): `point`, `lo`, `hi` are LongType
  * (lift timestamps via [[graft.ops.Cols.epochUs]]); W is a power of two
  * (the bin key is an exact arithmetic shift — no division expression,
  * no float rounding, negatives floor correctly); the marker's three
  * expressions must be the ones used by the band conjuncts themselves.
  * Null points/bounds and inverted intervals (`lo > hi`) produce no
  * matches on both the rewritten and degraded paths — same as the inner
  * band join they hint.
  */
object RangeJoinBinRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if cond.exists(_.isInstanceOf[RangeBinMarker]) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (markers, rest) = conjuncts.partition(_.isInstanceOf[RangeBinMarker])
      markers match {
        case Seq(RangeBinMarker(Literal(w: Long, LongType), point, lo, hi))
            if w > 0 && (w & (w - 1)) == 0 &&
              point.dataType == LongType && lo.dataType == LongType &&
              hi.dataType == LongType &&
              point.references.subsetOf(left.outputSet) &&
              lo.references.subsetOf(right.outputSet) &&
              hi.references.subsetOf(right.outputSet) &&
              rest.nonEmpty =>
          val shift = Literal(java.lang.Long.numberOfTrailingZeros(w))
          // left: one extra projected column, floor(point / W) by shift
          val lBin = Alias(ShiftRight(point, shift), "__graft_bin")()
          val lProj = Project(left.output :+ lBin, left)
          // right: replicate each interval to its overlapping bins.
          // Sequence throws on inverted bounds, so guard to a null array
          // (Generate inner-drops the row — an inverted interval matches
          // nothing in the original join either).
          val binLo = ShiftRight(lo, shift)
          val binHi = ShiftRight(hi, shift)
          // Sequence is TimeZoneAwareExpression — unresolved until the
          // zone is pinned, even over longs
          val seq = new Sequence(binLo, binHi, Literal(1L))
            .withTimeZone(conf.sessionLocalTimeZone)
          val guarded = If(
            And(And(IsNotNull(lo), IsNotNull(hi)),
              LessThanOrEqual(binLo, binHi)),
            seq, Literal.create(null, seq.dataType))
          val rBin = AttributeReference("__graft_bin_r", LongType,
            nullable = false)()
          val gen = Generate(Explode(guarded), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(rBin),
            child = right)
          // bin equality becomes the equi key ExtractEquiJoinKeys plans a
          // shuffled join on; the surviving band conjuncts stay as the
          // join's extra condition, restoring exact semantics
          val newCond = (EqualTo(lBin.toAttribute, rBin) +: rest)
            .reduce(And)
          Project(j.output, Join(lProj, gen, Inner, Some(newCond), hint))
        case _ => j // malformed marker: leave in place (it evals true)
      }
  }
}

/** Always-true join-condition marker carrying the bin hint. References
  * `point` (one side) and `lo`/`hi` (the other) so predicate pushdown
  * can never split it out of the join condition; non-foldable so constant
  * folding keeps it alive until [[RangeJoinBinRule]] consumes it.
  */
case class RangeBinMarker(binSize: Expression, point: Expression,
    lo: Expression, hi: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(binSize, point, lo, hi)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "graft_range_bin"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    true

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code = code"", isNull = FalseLiteral,
      value = JavaCode.literal("true", BooleanType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RangeBinMarker =
    copy(binSize = newChildren(0), point = newChildren(1),
      lo = newChildren(2), hi = newChildren(3))
}

object RangeJoin {
  /** Marker conjunct for a band-join condition: AND this onto the range
    * predicates to opt the join into the bin rewrite. `binSize` must be a
    * power of two in the point column's units, chosen at or above the
    * typical interval span (each interval fans out `span/binSize + 1`
    * ways).
    */
  def marker(binSize: Long, point: Column, lo: Column, hi: Column): Column =
    GraftColumnBridge.column(RangeBinMarker(Literal(binSize),
      GraftColumnBridge.expression(point),
      GraftColumnBridge.expression(lo),
      GraftColumnBridge.expression(hi)))

  /** Installs the rule on an existing session (idempotent) — the
    * imperative twin of `GraftExtensions`' `injectOptimizerRule`.
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RangeJoinBinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinBinRule
}
