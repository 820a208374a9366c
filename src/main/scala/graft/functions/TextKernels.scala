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

  /** Distinct word-n-gram shingle hashes of `t`, appearance order — the
    * fused form of `split → transform(slice, concat_ws) → array_distinct →
    * transform(hash)`. Because split keeps every empty token, joining n
    * consecutive tokens with single spaces reconstructs EXACTLY the
    * original byte window, so each shingle is hashed straight off the
    * text bytes — no per-shingle string allocation at all. Distinctness
    * is by the shingle's xxhash64 (the same 64-bit identity trade
    * `Dedup.ngramJaccardPairs` documents; the oracle gate pins the corpus
    * collision-free). Fewer than n tokens → ONE whole-text shingle (the
    * short-doc fallback of `Dedup.withShingles`).
    *
    * `family`: "xxh" emits the xxhash64 itself (seed 42, bit-identical to
    * the `xxhash64(s)` expression); "md5fold" emits the md5-ascii fold
    * Σ ascii(hex_i)·256^(8−i) over the first 8 hex chars — the
    * DuckDB-expressible family of the q_dedup_near_check twin.
    */
  def shingleHashes(t: UTF8String, n: Int, family: String): ArrayData = {
    val bytes = t.getBytes
    var spaces = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) spaces += 1
      i += 1
    }
    val nTok = spaces + 1
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
    val md5fold = family == "md5fold"
    val md = if (md5fold) mdLocal.get() else null
    def hashWindow(from: Int, until: Int): (Long, Long) = {
      val key = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(
          UTF8String.fromBytes(bytes, from, until - from), 42L)
      if (!md5fold) (key, key)
      else {
        md.reset()
        md.update(bytes, from, until - from)
        val d = md.digest()
        // ascii codes of the first 8 lowercase hex chars (nibbles of
        // d0..d3), folded base 256: ascii = nib < 10 ? 48+nib : 87+nib
        var v = 0L
        var k = 0
        while (k < 4) {
          val hi = (d(k) >> 4) & 0xf
          val lo = d(k) & 0xf
          v = (v << 8) | (if (hi < 10) 48 + hi else 87 + hi).toLong
          v = (v << 8) | (if (lo < 10) 48 + lo else 87 + lo).toLong
          k += 1
        }
        (key, v)
      }
    }
    if (nTok < n) {
      // whole-text fallback shingle
      return new GenericArrayData(
        Array[Any](hashWindow(0, bytes.length)._2))
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[java.lang.Long]()
    var w = 0
    val lastW = nTok - n
    while (w <= lastW) {
      val (key, v) = hashWindow(starts(w), ends(w + n - 1))
      if (seen.add(key)) out.add(v)
      w += 1
    }
    val arr = new Array[Any](out.size())
    i = 0
    while (i < arr.length) { arr(i) = out.get(i).longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  private val HEX = "0123456789abcdef".getBytes

  /** md5 hex key per W-token window position (the span-dedup window
    * device): element i = md5 of tokens i..i+W−1 joined by single
    * spaces — which IS the original byte window, so the digest runs
    * straight off the text bytes and the hex string is the ONLY
    * allocation. Fewer than W tokens → empty (callers' `size(toks) >= W`
    * filter becomes implicit). Bit-identical to
    * `md5(concat_ws(' ', slice(toks, i + 1, W)))`.
    */
  def spanWindowKeys(t: UTF8String, w: Int): ArrayData = {
    val bytes = t.getBytes
    var spaces = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) spaces += 1
      i += 1
    }
    val nTok = spaces + 1
    if (nTok < w) return new GenericArrayData(new Array[Any](0))
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
    val out = new Array[Any](nTok - w + 1)
    var p = 0
    while (p <= nTok - w) {
      md.reset()
      md.update(bytes, starts(p), ends(p + w - 1) - starts(p))
      val d = md.digest()
      val hex = new Array[Byte](32)
      var k = 0
      while (k < 16) {
        hex(2 * k) = HEX((d(k) >> 4) & 0xf)
        hex(2 * k + 1) = HEX(d(k) & 0xf)
        k += 1
      }
      out(p) = UTF8String.fromBytes(hex)
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Column DSL: array<string> of per-position W-token window md5 keys
    * (see [[spanWindowKeys]]).
    */
  def spanWindowCol(w: Int)(text: Column): Column =
    GraftColumnBridge.column(
      SpanWindowKeys(GraftColumnBridge.expression(text), w))

  /** Column DSL: array<long> of distinct shingle hashes (see
    * [[shingleHashes]]).
    */
  def shingleHashCol(n: Int, family: String)(text: Column): Column =
    GraftColumnBridge.column(
      ShingleHashes(GraftColumnBridge.expression(text), n, family))

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

case class SpanWindowKeys(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, s"window length must be >= 1, got $w")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "span_window_keys(text STRING)")
    }
  override def prettyName: String = "span_window_keys"

  override protected def nullSafeEval(t: Any): Any =
    TextKernels.spanWindowKeys(t.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextKernels$$.MODULE$$.spanWindowKeys($t, $w)")

  override protected def withNewChildInternal(
      newChild: Expression): SpanWindowKeys = copy(child = newChild)
}

case class ShingleHashes(child: Expression, n: Int, family: String)
    extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")
  require(family == "xxh" || family == "md5fold",
    s"unknown shingle hash family: $family")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "shingle_hashes(text STRING)")
    }
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(t: Any): Any =
    TextKernels.shingleHashes(t.asInstanceOf[UTF8String], n, family)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"""graft.functions.TextKernels$$.MODULE$$.shingleHashes($t, $n, "$family")""")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes = copy(child = newChild)
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
