package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made these conversions
  * `private[sql]` (Connect refactor), so the library exposes them through
  * this in-package shim — the standard pattern for Catalyst-extending
  * libraries. */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Catalyst's bounded-heap top-k collect aggregate (`CollectTopK`,
    * package-restricted — bridged one package deeper): per group the
    * `num` largest (smallest with `reverse = true`) values of `e`,
    * buffer k-bounded on both the map-side partial and the merge. */
  def collectTopK(e: Expression, num: Int, reverse: Boolean): Expression =
    org.apache.spark.sql.catalyst.expressions.aggregate
      .graftCollectShim.collectTopK(e, num, reverse)
}
