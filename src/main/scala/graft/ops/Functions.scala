package graft.ops

import graft.Q

/** Scalar-function queries: string/date/math/json/array/map (q_fn_*). */
object Functions {
  def queries: Map[String, Q] = Map()
}
