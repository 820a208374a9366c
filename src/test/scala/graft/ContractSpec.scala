package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Driver-contract consistency gates (no Spark session needed).
  * Registry.all merges the module maps with `++`, so a duplicate query
  * name across modules would SILENTLY overwrite one query with another —
  * the overwritten query's oracle would then grade a different program.
  */
class ContractSpec extends AnyFunSuite with Matchers {
  private val modules: Seq[(String, Map[String, Q])] = Seq(
    "ops.Relational" -> ops.Relational.queries,
    "ops.Aggregates" -> ops.Aggregates.queries,
    "ops.Joins" -> ops.Joins.queries,
    "ops.Windows" -> ops.Windows.queries,
    "ops.SetsSorts" -> ops.SetsSorts.queries,
    "ops.Functions" -> ops.Functions.queries,
    "ops.Subqueries" -> ops.Subqueries.queries,
    "ops.EventAnalytics" -> ops.EventAnalytics.queries,
    "ops.Graph" -> ops.Graph.queries,
    "ops.Warehouse" -> ops.Warehouse.queries,
    "ops.Tpch" -> ops.Tpch.queries,
    "hic.HicQueries" -> hic.HicQueries.queries,
    "hic.Matrix" -> hic.Matrix.queries,
    "llm.LlmQueries" -> llm.LlmQueries.queries,
    "llm.EmbedQueries" -> llm.EmbedQueries.queries,
    "llm.CorpusStats" -> llm.CorpusStats.queries,
    "llm.SpanDedup" -> llm.SpanDedup.queries,
    "llm.Selection" -> llm.Selection.queries,
    "stream.StreamQueries" -> stream.StreamQueries.queries)

  test("query names are globally unique across modules") {
    val perModule = modules.map(_._2.size).sum
    val dups = modules.flatMap { case (m, qs) => qs.keys.map(_ -> m) }
      .groupBy(_._1).filter(_._2.size > 1)
      .map { case (k, ms) => s"$k in ${ms.map(_._2).mkString(", ")}" }
    withClue(s"duplicated: ${dups.mkString("; ")}: ") {
      Registry.all.size shouldBe perModule
    }
  }

  test("names follow the q_ convention; declared oracles are non-empty") {
    Registry.all.keys.foreach(_ should startWith("q_"))
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      withClue(s"$k: ") { sql.trim should not be empty }
    }
  }

  test("bench final line stays inside the driver's stdout tail window") {
    // the driver keeps only the LAST 2000 chars of stdout; sbt's trailing
    // banner can eat ~75 more. Render the line for the FULL current
    // registry at worst-case value widths (hundreds of seconds) so query
    // additions that would overflow the window fail here, not in a
    // driver round with parsed:null.
    val worst = Registry.all.keys.map(_ -> 999.999).toMap
    val line = Bench.renderLine(worst, runs = 3,
      sfDir = "/root/testdata/sf0.1", loadStart = 99.999, loadEnd = 99.999,
      anchorStart = 999.999, anchorEnd = 999.999)
    line.length should be < 1900
    // and it must be one self-contained JSON object on a single line
    line should startWith("{\"metric\":\"total\"")
    line should not include "\n"
  }

  test("no duplicate declaration sites, even within one module") {
    // A name declared twice inside ONE module's Map literal is deduped by
    // Scala before any runtime check can see it (the first body is lost
    // silently) — so this gate scans the SOURCE for `"q_…" ->`
    // declaration sites instead. The pattern (quote + arrow) only occurs
    // at Map-entry positions, never in comments or oracle SQL.
    import scala.jdk.CollectionConverters._
    val decl = """"(q_[a-z0-9_]+)"\s*->""".r
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val sites = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val src = java.nio.file.Files.readString(p)
        decl.findAllMatchIn(src).map(m => m.group(1) -> p.toString)
      }.toSeq
    val dups = sites.groupBy(_._1).filter(_._2.size > 1)
      .map { case (k, ss) => s"$k at ${ss.map(_._2).distinct.mkString(", ")}" }
    withClue(s"duplicate declaration sites: ${dups.mkString("; ")}: ") {
      sites.size shouldBe Registry.all.size
    }
    sites.map(_._1).toSet shouldBe Registry.all.keySet
  }
}
