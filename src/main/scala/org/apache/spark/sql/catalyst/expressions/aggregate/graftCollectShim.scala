package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** In-package bridge to Catalyst's bounded-heap top-k collect —
  * `CollectTopK` is package-restricted, and re-implementing a
  * TypedImperativeAggregate (generic buffer serialization included)
  * just to change its visibility would be copy-not-reuse. Same pattern
  * as [[org.apache.spark.sql.graft.shim]], one package deeper; the
  * public face is `graft.functions.gf.collect_top_k`. */
object graftCollectShim {
  /** Per group the `num` largest (smallest with `reverse = true`)
    * values of `e` under its natural ordering, as an array; the buffer
    * is num-bounded on both the map-side partial and the merge. */
  def collectTopK(e: Expression, num: Int, reverse: Boolean): Expression =
    CollectTopK(e, num, reverse).toAggregateExpression()
}
