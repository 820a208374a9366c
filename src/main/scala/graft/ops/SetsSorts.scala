package graft.ops

import graft.Q

/** Set-operation, sort, and top-k queries (SURVEY.md §2.B). */
object SetsSorts {
  def queries: Map[String, Q] = Map()
}
