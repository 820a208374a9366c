package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row n-gram MULTISET kernels — the map-side-complete reshape of the
  * corpus text statistics (SURVEY.md §2 LLM family).
  *
  * The previous plan shape for the bigram-LM / perplexity / DSIR / entropy
  * queries was `explode(per-char transform) → groupBy(doc_id, gram)`: a
  * corpus-text-sized row stream (one row per CHARACTER of the corpus)
  * pushed through a hash aggregate and, at scale, its shuffle. These
  * expressions fold that whole reduction into the scan stage: one row in
  * (the document), one bounded array out (`struct(gram, mult)` per
  * DISTINCT gram — ≤ |charset|ⁿ or ≤ doc length entries). Consumers
  * explode the already-reduced multiset, so the per-(doc, gram)
  * aggregation needs no exchange at all and the only corpus-sized pass
  * left is the parquet scan itself. Multiset contents are exactly the
  * old groupBy output (exact integer counts), so every downstream sum —
  * and the DuckDB oracles, which keep the per-occurrence formulation —
  * is unchanged.
  *
  * Both expressions implement `doGenCode` (the BinomSf pattern): the
  * kernel runs inside whole-stage codegen via a static call, no UDF
  * dispatch and no Row boxing in the pass that touches every document.
  */
object TextKernels {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Character-n-gram multiset of `t`: one (gram, mult) entry per DISTINCT
    * n-char substring (codepoint semantics — identical to
    * `substring(text, i, n)` over `i ∈ [1, len−n+1]`), gram-ascending
    * (byte order) for a deterministic row stream at any partitioning.
    * Fewer than n chars → empty.
    */
  def charNgramMultiset(t: UTF8String, n: Int): ArrayData = {
    val nChars = t.numChars()
    if (nChars < n) return new GenericArrayData(new Array[Any](0))
    val b = t.getBytes
    // codepoint start offsets (offs(i) = byte offset of char i; offs(nChars) = end)
    val offs = new Array[Int](nChars + 1)
    var i = 0
    var c = 0
    while (i < b.length) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(b(i))
      c += 1
    }
    offs(nChars) = b.length
    val m = new java.util.TreeMap[UTF8String, Array[Long]]()
    var k = 0
    val last = nChars - n
    while (k <= last) {
      val g = UTF8String.fromBytes(b, offs(k), offs(k + n) - offs(k))
      val cnt = m.get(g)
      if (cnt == null) m.put(g, Array(1L)) else cnt(0) += 1L
      k += 1
    }
    val out = new Array[Any](m.size)
    var j = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(
        Array[Any](e.getKey, e.getValue()(0)))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Hashed word-bigram bucket multiset of `t` (the DSIR feature map):
    * tokens = split on the literal space byte KEEPING empties (exactly
    * `split(text, ' ')`), feature k = md5("tok_k tok_{k+1}") → bucket =
    * first 12 digest bits mod `b` (the hex-digit base-16 fold of
    * `Selection.bucketCol`), one (hb, mult) entry per distinct bucket,
    * bucket-ascending. Fewer than 2 tokens → empty.
    */
  def wordBigramBuckets(t: UTF8String, b: Int): ArrayData = {
    val bytes = t.getBytes
    // token boundaries on the raw bytes: 0x20 never occurs inside a
    // multi-byte UTF-8 sequence, so byte-split == regex-split on ' '
    var spaces = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) spaces += 1
      i += 1
    }
    val nTok = spaces + 1
    if (nTok < 2) return new GenericArrayData(new Array[Any](0))
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var tok = 0
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) {
        ends(tok) = i
        tok += 1
        starts(tok) = i + 1
      }
      i += 1
    }
    ends(tok) = bytes.length
    val md = mdLocal.get()
    val m = new java.util.TreeMap[Integer, Array[Long]]()
    var k = 0
    while (k < nTok - 1) {
      md.reset()
      md.update(bytes, starts(k), ends(k) - starts(k))
      md.update(0x20.toByte)
      md.update(bytes, starts(k + 1), ends(k + 1) - starts(k + 1))
      val d = md.digest()
      val hb = (((d(0) & 0xff) << 4) | ((d(1) & 0xf0) >>> 4)) % b
      val key = Integer.valueOf(hb)
      val cnt = m.get(key)
      if (cnt == null) m.put(key, Array(1L)) else cnt(0) += 1L
      k += 1
    }
    val out = new Array[Any](m.size)
    var j = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(
        Array[Any](e.getKey.intValue(), e.getValue()(0)))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column DSL: array<struct<gram string, mult long>> of `text`'s
    * character n-grams.
    */
  def charNgrams(n: Int)(text: Column): Column =
    GraftColumnBridge.column(
      CharNgramMultiset(GraftColumnBridge.expression(text), n))

  /** Column DSL: array<struct<hb int, mult long>> of `text`'s hashed
    * word-bigram buckets.
    */
  def wordBigramBucketCol(b: Int)(text: Column): Column =
    GraftColumnBridge.column(
      WordBigramBuckets(GraftColumnBridge.expression(text), b))
}

case class CharNgramMultiset(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("gram", StringType, nullable = false),
    StructField("mult", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "char_ngram_multiset(text STRING)")
    }
  override def prettyName: String = "char_ngram_multiset"

  override protected def nullSafeEval(t: Any): Any =
    TextKernels.charNgramMultiset(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextKernels$$.MODULE$$.charNgramMultiset($t, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): CharNgramMultiset = copy(child = newChild)
}

case class WordBigramBuckets(child: Expression, b: Int)
    extends UnaryExpression {
  require(b >= 1, s"bucket count must be >= 1, got $b")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("hb", IntegerType, nullable = false),
    StructField("mult", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "word_bigram_buckets(text STRING)")
    }
  override def prettyName: String = "word_bigram_buckets"

  override protected def nullSafeEval(t: Any): Any =
    TextKernels.wordBigramBuckets(t.asInstanceOf[UTF8String], b)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextKernels$$.MODULE$$.wordBigramBuckets($t, $b)")

  override protected def withNewChildInternal(
      newChild: Expression): WordBigramBuckets = copy(child = newChild)
}
