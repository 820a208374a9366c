package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: the Spark program plus (when SQL-expressible) the
  * equivalent DuckDB oracle SQL. Hash-matching discipline (SURVEY.md §0):
  * total ORDER BY, deterministic doubles (exact-int or identical IEEE
  * expression shape on both sides), identical column aliases.
  */
final case class Q(fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def all: Map[String, Q] =
    ops.Relational.queries ++
      ops.Aggregates.queries ++
      ops.Joins.queries ++
      ops.Windows.queries ++
      ops.SetsSorts.queries ++
      ops.Functions.queries ++
      ops.Subqueries.queries ++
      ops.EventAnalytics.queries ++
      ops.Graph.queries ++
      ops.Warehouse.queries ++
      ops.Tpch.queries ++
      hic.HicQueries.queries ++
      hic.Matrix.queries ++
      llm.LlmQueries.queries ++
      llm.EmbedQueries.queries ++
      llm.CorpusStats.queries ++
      llm.SpanDedup.queries ++
      llm.Selection.queries ++
      stream.StreamQueries.queries
}
