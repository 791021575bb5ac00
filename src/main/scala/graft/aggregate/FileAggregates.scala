package graft.aggregate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Per-file aggregations (SURVEY §2.4, reference
 * cvp_bucket_event_lambda_handler.py:110-153 and
 * bucket_event_lambda_handler.py:105-198).
 *
 * Input: a validated record DataFrame with `file` and `validations`
 * (array<struct<field_path,valid,details>>) columns. All aggregates are
 * hash aggregates with map-side partial aggregation — one shuffle on the
 * file key, reusable across A1-A4.
 */
object FileAggregates {

  /** failed-check count per record. */
  def failedCount: Column =
    size(filter(col("validations"), v => !v.getField("valid")))

  /** A1-A4 (cvp...py:115-138,153): per-file totals —
   *  num_messages_total, num_validations, num_errors, num_error_messages
   *  (records with ≥1 failure), num_valid. */
  def fileTotals(validated: DataFrame): DataFrame =
    validated
      .withColumn("__failed", failedCount)
      .groupBy(col("file"))
      .agg(
        count(lit(1)).as("num_messages_total"),
        sum(size(col("validations"))).as("num_validations"),
        sum(col("__failed")).as("num_errors"),
        sum(when(col("__failed") > 0, 1L).otherwise(0L)).as("num_error_messages"))
      .withColumn("num_valid", col("num_messages_total") - col("num_error_messages"))

  /** A3 (cvp...py:122-135,143-145): distinct failure detail → occurrence
   *  count, per file. */
  def errorHistogram(validated: DataFrame): DataFrame =
    validated
      .select(col("file"), explode(col("validations")).as("v"))
      .filter(!col("v.valid"))
      .groupBy(col("file"), col("v.details").as("details"))
      .agg(count(lit(1)).as("occurrences"))

  /** A5 (bucket_event_lambda_handler.py:105-198): dimensional counters —
   *  counts grouped by up to two dimension columns (State×TrafficType,
   *  DataProvider×DataType). The reference emits per-file increments to
   *  CloudWatch; here they're per-batch aggregates. */
  def dimensionalCounts(meta: DataFrame, dims: Seq[String]): DataFrame =
    meta.groupBy(dims.map(col): _*)
      .agg(
        count(lit(1)).as("file_count"),
        sum(coalesce(col("MessageCount"), lit(0L))).as("message_count"))

  /** Per-file verdict line (cvp...py:141-151): PASSED iff zero failures. */
  def fileVerdicts(totals: DataFrame): DataFrame =
    totals.withColumn("verdict",
      when(col("num_errors") === 0, lit("PASSED")).otherwise(lit("FAILED")))
}
