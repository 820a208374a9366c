package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column helpers shared by the declared queries.
  *
  * The driver parquet stores timestamps with isAdjustedToUTC=false, which
  * Spark 4 reads as TIMESTAMP_NTZ. Literals must therefore be NTZ too —
  * comparing against a TIMESTAMP literal would wrap the column in a cast
  * and defeat parquet predicate pushdown.
  */
object Cols {
  /** NTZ timestamp literal, e.g. ts("1996-01-01"). */
  def ts(s: String): Column = lit(s).cast("timestamp_ntz")

  /** Epoch microseconds of an NTZ column interpreted as UTC — matches
    * DuckDB's `epoch_us(ts)` on the same naive timestamp.
    * Session TZ is pinned to UTC (build.sbt / Verify).
    */
  def epochUs(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Hash-stable rounding: floor(x·10^k + 0.5)/10^k — pure IEEE ops, so
    * Spark and DuckDB agree bit-for-bit when fed identical doubles. Spark's
    * own round(x, k>0) goes through the double's shortest decimal string
    * (BigDecimal HALF_UP) and can round *up* where DuckDB's binary-value
    * rounding goes *down* (e.g. 1222.74499999999989 → "1222.745" → 1222.75
    * vs 1222.74), so it must never be used on oracle-compared doubles.
    * SQL equivalent: FLOOR(x*1e6 + 0.5)/1e6 (see [[froundSql]]).
    */
  def fround(c: Column, k: Int): Column = {
    val p = math.pow(10, k)
    floor(c * p + 0.5) / p
  }

  /** JVM-side twin of [[fround]] for spec differentials — the same IEEE
    * op sequence (mul, add, floor, div) on a plain Double.
    */
  def froundDouble(x: Double, k: Int): Double = {
    val p = math.pow(10, k)
    math.floor(x * p + 0.5) / p
  }

  /** DuckDB-side twin of [[fround]]; splice around a SQL expression. */
  def froundSql(expr: String, k: Int): String = {
    val p = "1e" + k
    s"FLOOR(($expr)*$p + 0.5)/$p"
  }

  /** cents(x) ≡ CAST(ROUND(x*100, 0) AS BIGINT) — exact fixed-point lift
    * of a price double; identical IEEE ops on identical parquet bits in
    * Spark and DuckDB, so downstream BIGINT sums are order-independent
    * and hash-stable.
    */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** 16-bit min/max rescale of an integer key:
    * floor((k − mn)·65535 / max(mx − mn, 1)). The intermediate doubles
    * are exact (≤ ~1.3e10 ≪ 2^53), so Spark and DuckDB floor to the same
    * integer bit-for-bit.
    */
  def norm16(k: Column, mn: Column, mx: Column): Column =
    floor((k - mn).cast("double") * 65535.0 /
      greatest(mx - mn, lit(1)).cast("double")).cast("long")

  /** DuckDB twin of [[norm16]]; CAST of an exact-integer double. */
  def norm16Sql(k: String, mn: String, mx: String): String =
    s"CAST(FLOOR(CAST($k - $mn AS DOUBLE) * 65535.0 / " +
      s"CAST(GREATEST($mx - $mn, 1) AS DOUBLE)) AS BIGINT)"

  private val spreadSteps =
    Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L),
      (1, 0x55555555L))

  /** Spread the low 16 bits of `c` to the even bit positions (classic
    * shift-or-mask ladder). */
  def spread16(c: Column): Column =
    spreadSteps.foldLeft(c.bitwiseAND(lit(0xFFFFL))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** Morton (Z-order) interleave of two 16-bit values: `a` takes the
    * even bits, `b` the odd — the locality-preserving multi-dimension
    * sort key for clustered layouts. */
  def morton2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** DuckDB twin of the spread ladder as a CTE chain `s1..s4` over
    * columns `za`/`zb` of `src`, carrying every other column through
    * (`SELECT * REPLACE`). The final select reads
    * `za | (zb << 1)` from `s4`.
    */
  def mortonSpreadCtes(src: String): String =
    spreadSteps.zipWithIndex.map { case ((s, m), i) =>
      val prev = if (i == 0) src else "s" + i
      s"s${i + 1} AS (SELECT * REPLACE (((za | (za << $s)) & $m) AS za, " +
        s"((zb | (zb << $s)) & $m) AS zb) FROM $prev)"
    }.mkString(", ")
}
