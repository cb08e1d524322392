package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` classic Column↔Expression converters, for
  * wiring native Catalyst expressions (graft.functions.CosineSimilarity)
  * into the public Column API. Lives under org.apache.spark.sql solely to
  * satisfy the access qualifier; no Spark internals are modified.
  */
object ColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Decompose a possibly-`.asc`/`.desc`-wrapped Column into (the bare
    * column, ascending?). Public-API sort Columns wrap an
    * `internal.SortOrder` COLUMN NODE (not a catalyst SortOrder — the
    * conversion is lazy), so this must pattern-match at the node level.
    */
  def sortSpec(c: Column): (Column, Boolean) = c.node match {
    case so: internal.SortOrder =>
      (Column(so.child), so.sortDirection == internal.SortOrder.Ascending)
    case _ => (c, true)
  }
}

/** Bridge to the `private[sql]` Dataset/LogicalPlan constructors, for
  * planting custom logical nodes (graft.plans.RunningSumPlan) into a
  * DataFrame. Same access-qualifier-only rationale as [[ColumnShim]].
  */
object PlanShim {
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  def logical(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
