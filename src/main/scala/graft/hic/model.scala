package graft.hic

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed domain model (SURVEY.md §1.2): case-class encoders for the five
  * concrete tables, for the parts of the kernel where compile-time schema
  * safety pays. The untyped DataFrame operators remain the primary
  * composition surface.
  */
object model {
  final case class Fragment(chr: String, extraField: Long, mid: Long,
      hitCount: Long, mappable: Int)
  final case class Contact(chr1: String, mid1: Long, chr2: String,
      mid2: Long, contactCount: Long)
  final case class Bias(chr: String, mid: Long, bias: Double)
  final case class SplineBin(binIdx: Int, avgDistance: Double,
      avgContactProb: Double, pairCount: Long)
  final case class Significance(chr1: String, mid1: Long, chr2: String,
      mid2: Long, contactCount: Long, p_value: Double, q_value: Double)

  def fragments(spark: SparkSession, path: String): Dataset[Fragment] = {
    import spark.implicits._
    graft.io.Tsv.readFragments(spark, path).as[Fragment]
  }

  def contacts(spark: SparkSession, path: String): Dataset[Contact] = {
    import spark.implicits._
    graft.io.Tsv.readContacts(spark, path).as[Contact]
  }

  def biases(spark: SparkSession, path: String): Dataset[Bias] = {
    import spark.implicits._
    graft.io.Tsv.readBiases(spark, path).as[Bias]
  }
}
