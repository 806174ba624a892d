package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Two-way Column ⇄ catalyst Expression bridge. Spark 4 removed the
  * public `Column.expr` / `new Column(expr)` surface;
  * `classic.ExpressionUtils` (sql/core columnNodeSupport.scala) is the
  * internal replacement but is `private[sql]`, so this shim lives in
  * the org.apache.spark.sql package. Needed for graft's custom
  * Catalyst expressions (exact int64 division, simhash, ...).
  */
object GraftBridge {
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
