package graft.hic

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contact-side operators (SURVEY.md A2, A5–A11). */
object Contacts {
  /** A5–A8: derived distance + class tag.
    * Classes: intraInRange / intraOutOfRange / interAll.
    */
  def classify(contacts: DataFrame, low: Long, up: Long): DataFrame =
    contacts
      .withColumn("dist",
        when(col("chr1") === col("chr2"), abs(col("mid2") - col("mid1"))))
      .withColumn("cls",
        when(col("chr1") =!= col("chr2"), "interAll")
          .when(col("dist").between(low, up), "intraInRange")
          .otherwise("intraOutOfRange"))

  /** A9/A11: keep only contacts whose BOTH ends are in the (filtered,
    * small) fragment set — two broadcast left-semi joins.
    */
  def bothEndsMappable(contacts: DataFrame, frags: DataFrame): DataFrame = {
    val loci = broadcast(frags.select(col("chr"), col("mid")).distinct())
    contacts
      .join(loci.withColumnRenamed("chr", "chr1")
        .withColumnRenamed("mid", "mid1"), Seq("chr1", "mid1"), "left_semi")
      .join(loci.withColumnRenamed("chr", "chr2")
        .withColumnRenamed("mid", "mid2"), Seq("chr2", "mid2"), "left_semi")
  }

  /** A10: attach per-end bias factors (broadcast joins). Biases outside
    * [low, up] or marked −1 contribute factor 1 (excluded from scaling,
    * matching the reference's clamp-or-ignore behavior).
    */
  def withBiases(contacts: DataFrame, biases: DataFrame,
      low: Double, up: Double): DataFrame = {
    val b = broadcast(biases.select(col("chr"), col("mid"),
      when(col("bias") === -1.0 ||
        !col("bias").between(low, up), 1.0)
        .otherwise(col("bias")).as("biasF")))
    contacts
      .join(b.select(col("chr").as("chr1"), col("mid").as("mid1"),
        col("biasF").as("bias1")), Seq("chr1", "mid1"), "left")
      .join(b.select(col("chr").as("chr2"), col("mid").as("mid2"),
        col("biasF").as("bias2")), Seq("chr2", "mid2"), "left")
      .na.fill(1.0, Seq("bias1", "bias2"))
  }
}
