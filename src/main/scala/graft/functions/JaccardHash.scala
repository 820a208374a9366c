package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for exact Jaccard similarity of two
  * hashed-shingle arrays — the verification leg of MinHash-LSH
  * (runs once per candidate pair). Same arithmetic as the old
  * Set-based UDF (`|a∩b| / (|distinct a| + |b| − |a∩b|)`), on
  * primitive long arrays inside whole-stage codegen.
  */
case class JaccardHash(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          "jaccard_hash(a ARRAY<BIGINT>, b ARRAY<BIGINT>)")
    }
  override def prettyName: String = "jaccard_hash"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.llm.Dedup.jaccardKernel(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray(),
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray())

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.llm.Dedup$$.MODULE$$.jaccardKernel($a.toLongArray(), " +
        s"$b.toLongArray())")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaccardHash =
    copy(left = newLeft, right = newRight)
}

object JaccardHash {
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaccardHash(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
