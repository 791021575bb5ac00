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

  /**
   * Force-compile every codegen unit of a physical plan on the driver,
   * THROWING on janino failure instead of Spark's silent
   * interpreted-evaluation fallback — the PlanSpec pin that a plan's
   * generated code actually compiles (the r13 verdict found five
   * `Code grows beyond 64 KB` failures hiding behind the fallback).
   * Returns (wholeStageCodegenStages, fencedProjections) compiled.
   */
  def compileCodegenStages(plan: execution.SparkPlan): (Int, Int) = {
    var stages = 0
    var fenced = 0
    plan.foreach {
      case w: execution.WholeStageCodegenExec =>
        catalyst.expressions.codegen.CodeGenerator.compile(w.doCodeGen()._2)
        stages += 1
      case f: graft.plans.FencedProjectExec =>
        // no-fallback row-mode generation: what FencedProjectExec runs
        catalyst.expressions.codegen.GenerateUnsafeProjection.generate(
          catalyst.expressions.BindReferences.bindReferences(
            f.projectList, catalyst.expressions.AttributeSeq(f.child.output)))
        fenced += 1
      case _ =>
    }
    (stages, fenced)
  }
}

/** Parser factories for graft's native dateutil-chain expression —
  * built HERE because `TimestampFormatter`'s apply overloads are
  * `private[sql]`: each returned function is exactly what
  * `try_to_timestamp(col, lit(pattern))` evaluates under the default
  * CORRECTED parser policy (UTC session zone, US locale), so the
  * native chain and the Column chain are behavior-identical. */
object GraftTimeBridge {
  import java.time.ZoneOffset
  import org.apache.spark.sql.catalyst.util.{DateTimeUtils, TimestampFormatter}
  import org.apache.spark.unsafe.types.UTF8String

  /** micros since epoch, or null on mismatch — `to_timestamp(s, fmt)`. */
  def patternParser(pattern: String): String => java.lang.Long = {
    val f = TimestampFormatter(pattern, ZoneOffset.UTC, isParsing = true)
    (s: String) =>
      try java.lang.Long.valueOf(f.parse(s))
      catch { case _: Exception => null }
  }

  /** micros since epoch, or null — the formatless `CAST(s AS TIMESTAMP)`
    * string grammar. */
  def castParse(s: String): java.lang.Long =
    DateTimeUtils.stringToTimestamp(UTF8String.fromString(s), ZoneOffset.UTC)
      .map(java.lang.Long.valueOf(_)).orNull
}
