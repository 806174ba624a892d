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

  /** Parsed-but-unresolved LogicalPlan → DataFrame (analysis runs in
    * the given session, so temp views and injected functions resolve).
    * `classic.Dataset.ofRows` is `private[sql]`; needed by the SQL DML
    * statement path, which captures the MERGE source plan at parse
    * time and materializes it at execution time.
    */
  def dataFrame(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
