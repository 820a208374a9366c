package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** The reference's file surface (SURVEY.md §1.1, A1–A4): headerless
  * tab-separated, gzip-compressed tables. Schemas are explicit — no
  * inference — and gzip is handled by codec detection on read; writes pin
  * the column order and gzip codec.
  */
object Tsv {
  /** T1 fragments: chr, extraField (unused), mid, hitCount, mappable. */
  val fragmentSchema: StructType = StructType(Seq(
    StructField("chr", StringType, nullable = false),
    StructField("extraField", LongType, nullable = true),
    StructField("mid", LongType, nullable = false),
    StructField("hitCount", LongType, nullable = false),
    StructField("mappable", IntegerType, nullable = true)))

  /** T2 contacts: chr1, mid1, chr2, mid2, contactCount. */
  val contactSchema: StructType = StructType(Seq(
    StructField("chr1", StringType, nullable = false),
    StructField("mid1", LongType, nullable = false),
    StructField("chr2", StringType, nullable = false),
    StructField("mid2", LongType, nullable = false),
    StructField("contactCount", LongType, nullable = false)))

  /** A4 significances: the pass-numbered output table. */
  val significanceSchema: StructType = StructType(Seq(
    StructField("chr1", StringType, nullable = false),
    StructField("mid1", LongType, nullable = false),
    StructField("chr2", StringType, nullable = false),
    StructField("mid2", LongType, nullable = false),
    StructField("contactCount", LongType, nullable = false),
    StructField("p_value", DoubleType, nullable = false),
    StructField("q_value", DoubleType, nullable = false)))

  /** T3 biases: chr, mid, bias (−1 = excluded). */
  val biasSchema: StructType = StructType(Seq(
    StructField("chr", StringType, nullable = false),
    StructField("mid", LongType, nullable = false),
    StructField("bias", DoubleType, nullable = false)))

  private def read(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    // FAILFAST: the default PERMISSIVE mode turns a corrupt/truncated
    // line into silent nulls despite the declared non-nullable schema
    // (file sources don't enforce nullability), and a downstream agg
    // then miscounts instead of failing at the read
    spark.read.schema(schema).option("sep", "\t").option("header", "false")
      .option("mode", "FAILFAST")
      .csv(path)

  def readFragments(spark: SparkSession, path: String): DataFrame =
    read(spark, path, fragmentSchema)

  def readContacts(spark: SparkSession, path: String): DataFrame =
    read(spark, path, contactSchema)

  def readBiases(spark: SparkSession, path: String): DataFrame =
    read(spark, path, biasSchema)

  /** A4 sink: fixed column order, gzip TSV. */
  def write(df: DataFrame, path: String, columns: Seq[String]): Unit =
    df.select(columns.head, columns.tail: _*)
      .write.mode("overwrite")
      .option("sep", "\t").option("header", "false")
      .option("compression", "gzip")
      .csv(path)
}
