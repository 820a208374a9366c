package graft.stream

import graft.Q

/** Batch-equivalent forms of the streaming queries (SURVEY.md §2.10);
  * the same column logic is reused by the Structured Streaming jobs in
  * [[Events]].
  */
object StreamQueries {
  def queries: Map[String, Q] = Map()
}
