package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal access bridge into Spark's `private[sql]` surface — the
  * standard library technique (Delta, Iceberg, Sedona all ship one) for
  * the few APIs a SQL extension genuinely needs that have no public
  * equivalent. Kept to ONE function so the private-API exposure is
  * auditable at a glance: turning a LogicalPlan captured at parse time
  * (graft's MERGE INTO command holds its source query as a plan) back
  * into a DataFrame at execution time, which runs the full
  * analyze/optimize pipeline on it. */
object Bridge {
  def ofRows(session: org.apache.spark.sql.SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      session.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Wrap a parsed Catalyst expression as a Column (graft's SQL
    * DELETE/UPDATE lowering carries the parsed WHERE/SET expressions
    * to the store's programmatic verbs, which take Columns). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
