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
}
