package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The custom whole-operator as-of join (graft.plans.AsOfJoin): planted
  * edge semantics, a seeded-random differential against the composed
  * union+window twin, and partition-count invariance of the merge.
  */
class AsOfJoinSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private def asof(probes: DataFrame, markers: DataFrame): Map[Long, Option[Long]] =
    plans.AsOfJoin.join(probes, markers, "k", "mk", "t", "mt")
      .collect()
      .map(r => r.getLong(1) -> // probe id
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))) // matched mt
      .toMap

  test("planted semantics: inclusive tie, no-match, latest-wins, key isolation") {
    val probes = Seq(
      (1L, 10L, 100L), // key 1, t=100: markers at 90,100 → 100 (inclusive)
      (1L, 11L, 95L),  // key 1, t=95 → 90
      (1L, 12L, 80L),  // key 1, t=80: earliest marker is 90 → none
      (2L, 20L, 500L), // key 2 has no markers at all → none
      (3L, 30L, 55L)   // key 3: marker at 50 → 50 (other keys invisible)
    ).toDF("k", "id", "t")
    val markers = Seq((1L, 90L), (1L, 100L), (3L, 50L), (4L, 1L))
      .toDF("mk", "mt")
    asof(probes, markers) shouldBe Map(
      10L -> Some(100L), 11L -> Some(90L), 12L -> None,
      20L -> None, 30L -> Some(50L))
  }

  test("empty marker side null-extends every probe") {
    val probes = Seq((1L, 10L, 100L)).toDF("k", "id", "t")
    val markers = Seq.empty[(Long, Long)].toDF("mk", "mt")
    asof(probes, markers) shouldBe Map(10L -> None)
  }

  test("seeded random differential vs the composed union+window twin") {
    // 2000 probes, 500 markers over 37 keys — collisions, ties, and
    // marker-free keys all occur at this density
    val rnd = new scala.util.Random(42)
    val probes = Seq.tabulate(2000)(i =>
      (rnd.nextInt(37).toLong, i.toLong, rnd.nextInt(1000).toLong))
      .toDF("k", "id", "t")
    val markers = Seq.tabulate(500)(_ =>
      (rnd.nextInt(37).toLong, rnd.nextInt(1000).toLong))
      .toDF("mk", "mt")
    val got = asof(probes, markers)
    // composed twin: union marker/probe rows, keyed running last()
    val m = markers.select(col("mk").as("k"), col("mt").as("t"),
      lit(0).as("kind"), lit(null).cast("long").as("id"),
      col("mt").as("mt"))
    val p = probes.select(col("k"), col("t"), lit(1).as("kind"),
      col("id"), lit(null).cast("long").as("mt"))
    val w = Window.partitionBy("k").orderBy(col("t"), col("kind"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = m.unionByName(p)
      .withColumn("last_mt", last(col("mt"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .collect()
      .map(r => r.getLong(3) ->
        (if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .toMap
    got shouldBe want
  }

  test("merge output is invariant to input partitioning") {
    val probes = Seq.tabulate(300)(i => ((i % 7).toLong, i.toLong,
      (i * 13 % 101).toLong)).toDF("k", "id", "t")
    val markers = Seq.tabulate(60)(i => ((i % 7).toLong,
      (i * 17 % 101).toLong)).toDF("mk", "mt")
    val a = asof(probes.repartition(2), markers.repartition(16))
    val b = asof(probes.repartition(16), markers.repartition(2))
    a shouldBe b
  }
}
