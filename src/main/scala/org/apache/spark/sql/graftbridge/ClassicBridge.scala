package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The two `private[sql]` seams the DML commands need, re-exported
  * from a subpackage of `org.apache.spark.sql` (the standard connector
  * idiom — Delta, Iceberg, and XSQL all ship exactly this bridge):
  * building a `DataFrame` from an analyzed `LogicalPlan` (the MERGE
  * source arrives as a plan, not a table name) and wrapping a resolved
  * Catalyst `Expression` into a public `Column`. Nothing else from the
  * internal surface leaks through here. */
object ClassicBridge {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** The reverse seam: the (possibly unresolved) Catalyst expression a
    * `Column` wraps — what `Column.expr` was before the Connect split.
    * Used by the WHERE-verb pruning-hint extractor. */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
