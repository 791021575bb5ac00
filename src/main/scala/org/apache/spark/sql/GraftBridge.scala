package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/**
 * Column ↔ Catalyst Expression bridge.
 *
 * Spark 4's Column is backed by the connect-agnostic ColumnNode API, and
 * the classic converters (`classic.ExpressionUtils`) are `private[sql]` —
 * so a library that defines its own native Expressions needs this one-file
 * shim inside the `org.apache.spark.sql` package to lift them into
 * user-facing Columns. Standard practice for Spark extension libraries.
 */
object GraftBridge {
  /** Wrap a Catalyst Expression as a Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst Expression (classic sessions). */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `types.AbstractDataType` is `private[sql]` in Spark 4 — re-export it
   *  so graft expressions can declare `ExpectsInputTypes.inputTypes`. */
  type AbstractType = types.AbstractDataType

  /** Accept any of the given types (re-export of `types.TypeCollection`). */
  def oneOf(ts: types.DataType*): AbstractType = types.TypeCollection(ts: _*)

  /** Analyzed logical plan of a (classic) Dataset — for custom LogicalPlan
   *  nodes that need resolved child attributes. */
  def analyzed(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Wrap a LogicalPlan back into a DataFrame (classic sessions). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
