package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins (SURVEY.md §4.2 / task "salting for
  * skew"). AQE's skew-join splitting handles most cases at runtime; this
  * explicit salt is for the pathological producer-side skew AQE can't fix
  * (one hot key dominating a sort-merge join's single task).
  *
  * Pattern: the skewed (large, hot-keyed) side gets a deterministic salt
  * derived from its own row content; the other side is replicated
  * `saltFactor` ways so every (key, salt) bucket finds its match. Result
  * set is identical to the plain join; the shuffle spreads the hot key
  * over `saltFactor` tasks.
  */
object Skew {
  /** Inner equi-join `left ⋈ right` on `key`, salting `left`'s shuffle.
    * `saltCols` must be deterministic row content of `left` (any columns;
    * hashed to pick the bucket).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int, saltCols: Seq[Column]): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(saltCols: _*), lit(saltFactor.toLong)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
