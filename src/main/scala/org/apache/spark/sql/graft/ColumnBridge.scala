package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. `classic.ExpressionUtils` is
  * `private[sql]`, so this one-liner lives in the spark.sql namespace —
  * the standard extension-point pattern for libraries that add native
  * Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Spark's internal bounded top-k aggregate (`private[sql]`, used by
    * the pandas-on-Spark nlargest path): a `TypedImperativeAggregate`
    * whose partial buffer is a `BoundedPriorityQueue` capped at `k`
    * elements — per-task aggregation state is O(k) per group no matter
    * how many input rows flow through, and map-side partials already
    * carry at most k rows per (task, group) into the exchange. With
    * `reverse = false` it keeps the k LARGEST values of `e` (struct
    * ordering is lexicographic over fields) and evals them in
    * descending order.
    */
  def collectTopK(e: Column, k: Int): Column =
    column(new CollectTopK(expression(e), k, false, 0, 0)
      .toAggregateExpression())
}
