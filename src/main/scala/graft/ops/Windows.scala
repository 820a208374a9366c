package graft.ops

import graft.Q

/** Window-function queries (SURVEY.md §2.B q_win_*). */
object Windows {
  def queries: Map[String, Q] = Map()
}
