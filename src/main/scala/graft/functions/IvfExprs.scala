package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Codegen'd kernels for the IVF similarity-search hot paths (see
  * `llm.Similarity.annIvfTop3`) — the corpus-sized cluster assignment
  * and the per-candidate cosine re-rank, previously Scala UDFs with
  * boxed Seq[Long] inputs. Same arithmetic, primitive arrays, inside
  * whole-stage codegen.
  */
case class NearestCluster(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("nearest_cluster(q ARRAY<BIGINT>)")
    }
  override def prettyName: String = "nearest_cluster"

  override protected def nullSafeEval(q: Any): Any =
    graft.llm.Similarity.nearestCluster(cents,
      q.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray())

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    defineCodeGen(ctx, ev, q =>
      s"graft.llm.Similarity$$.MODULE$$.nearestCluster($ref, " +
        s"$q.toLongArray())")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCluster = copy(child = newChild)

  override def equals(other: Any): Boolean = other match {
    case n: NearestCluster => child == n.child &&
      java.util.Arrays.deepEquals(
        cents.asInstanceOf[Array[AnyRef]], n.cents.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child,
    Integer.valueOf(java.util.Arrays.deepHashCode(
      cents.asInstanceOf[Array[AnyRef]])))
}

object NearestCluster {
  def apply(cents: Array[Array[Double]])(q: Column): Column =
    GraftColumnBridge.column(
      NearestCluster(GraftColumnBridge.expression(q), cents))
}

/** `cos(a, b) = Σ aᵢbᵢ / √(na·nb)` on the quantized-integer plane with
  * precomputed squared norms.
  */
case class CosineQuant(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), LongType,
          LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          "cosine_quant(a ARRAY<BIGINT>, b ARRAY<BIGINT>, na BIGINT, " +
            "nb BIGINT)")
    }
  override def prettyName: String = "cosine_quant"

  override protected def nullSafeEval(a: Any, b: Any, na: Any,
      nb: Any): Any =
    graft.llm.Similarity.cosKernel(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray(),
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray(),
      na.asInstanceOf[Long], nb.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, na, nb) =>
      s"graft.llm.Similarity$$.MODULE$$.cosKernel($a.toLongArray(), " +
        s"$b.toLongArray(), $na, $nb)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): CosineQuant =
    copy(newFirst, newSecond, newThird, newFourth)
}

object CosineQuant {
  def apply(a: Column, b: Column, na: Column, nb: Column): Column =
    GraftColumnBridge.column(CosineQuant(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b),
      GraftColumnBridge.expression(na), GraftColumnBridge.expression(nb)))
}
