package graft.llm

import graft.Q

/** LLM-training-data pipeline queries: dedup, similarity search, text
  * analysis, multimodal (SURVEY.md §2.B, driver north star).
  */
object LlmQueries {
  def queries: Map[String, Q] = Map()
}
