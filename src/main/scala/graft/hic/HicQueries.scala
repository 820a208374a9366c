package graft.hic

import org.apache.spark.sql.functions._

import graft.Q
import graft.ops.Cols

/** Declared Hi-C-shaped queries over the contacts view (SURVEY.md §2.B
  * q_hic_*). These exercise the statistical plumbing of the significance
  * pipeline (SURVEY A13–A20) in an oracle-checkable form.
  */
object HicQueries {
  def queries: Map[String, Q] = Map(
    "q_hic_bh" -> Q(
      (spark, dir) => {
        val c = ContactsView(spark, dir)
        Stats.bhQ(c, "pseudo_p", Seq("chr", "mid1", "mid2"), "q_value")
          .select(col("chr"), col("mid1"), col("mid2"), col("contactCount"),
            Cols.fround(col("pseudo_p"), 6).as("pseudo_p"),
            Cols.fround(col("q_value"), 6).as("q_value"))
          .orderBy("chr", "mid1", "mid2")
      },
      Some(ContactsView.cte + ", r AS (SELECT chr, mid1, mid2, contactCount, " +
        "pseudo_p, ROW_NUMBER() OVER (ORDER BY pseudo_p, chr, mid1, mid2) AS rk, " +
        "(SELECT COUNT(*) FROM c) AS m FROM c), " +
        "s AS (SELECT *, MIN(pseudo_p * m / rk) OVER (ORDER BY rk DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sm FROM r) " +
        "SELECT chr, mid1, mid2, contactCount, " +
        Cols.froundSql("pseudo_p", 6) + " AS pseudo_p, " +
        Cols.froundSql("LEAST(sm, 1.0)", 6) + " AS q_value " +
        "FROM s ORDER BY chr, mid1, mid2")))
}
