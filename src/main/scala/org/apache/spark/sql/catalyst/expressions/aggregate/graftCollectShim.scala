package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** In-package bridge to Catalyst's bounded-heap top-k collect —
  * `CollectTopK` is package-restricted, and re-implementing a
  * TypedImperativeAggregate (generic buffer serialization included)
  * just to change its visibility would be copy-not-reuse. Same pattern
  * as [[org.apache.spark.sql.graft.shim]], one package deeper; the
  * public face is `graft.functions.gf.collect_top_k`.
  *
  * SPARK-VERSION COUPLING (built against Spark 4.1.2): CollectTopK's
  * constructor signature and the direction of its `reverse` flag are
  * Catalyst internals — an upgrade could shift either, and a silent
  * flip of `reverse` would invert q135/boundedUserHistory's recency
  * without a compile error. The upgrade canaries are RankOpsSpec's
  * window-equality test (boundedUserHistory == the row_number window
  * twin on a skewed fixture) and its `partial_collect_top_k` plan
  * assert — both fail loudly if the shim's semantics move; keep them
  * when touching this file or bumping Spark. */
object graftCollectShim {
  /** Per group the `num` largest (smallest with `reverse = true`)
    * values of `e` under its natural ordering, as an array; the buffer
    * is num-bounded on both the map-side partial and the merge. */
  def collectTopK(e: Expression, num: Int, reverse: Boolean): Expression =
    CollectTopK(e, num, reverse).toAggregateExpression()
}
