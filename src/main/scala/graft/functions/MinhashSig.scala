package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the per-document MinHash signature
  * (SURVEY.md — the MinHash-LSH near-dup flagship): for table t, the
  * min over the document's 64-bit shingle hashes of
  * `splitmix64(h ⊕ seed_t)` (or the unmixed `h ⊕ seed_t` family the
  * oracle twin drives). Same kernel bits as `llm.Dedup.sigKernel`.
  *
  * Unlike the previous Scala UDF this participates in whole-stage
  * codegen and reads the shingle-hash array as PRIMITIVE longs
  * (`ArrayData.toLongArray`) — no Seq boxing, no closure dispatch, in
  * the pass that touches every document of the corpus.
  */
case class MinhashSig(child: Expression, numTables: Int, seed: Long,
    mixed: Boolean) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("minhash_sig(hashes ARRAY<BIGINT>)")
    }
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(hs: Any): Any =
    new GenericArrayData(graft.llm.Dedup.sigKernel(
      hs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray(), numTables, seed, mixed))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, hs =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.llm.Dedup$$.MODULE$$.sigKernel($hs.toLongArray(), " +
        s"$numTables, ${seed}L, $mixed))")

  override protected def withNewChildInternal(
      newChild: Expression): MinhashSig = copy(child = newChild)
}

object MinhashSig {
  /** Column-DSL entry — drop-in for the old signature UDF. */
  def sig(numTables: Int, seed: Long, mixed: Boolean)(hs: Column): Column =
    GraftColumnBridge.column(
      MinhashSig(GraftColumnBridge.expression(hs), numTables, seed, mixed))
}
