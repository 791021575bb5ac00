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
 *
 * Scope note (reference fidelity): the reference's aggregation loop
 * (cvp...py:123-138) iterates validate_queue's FULL result list, which
 * includes the one extra sequential RecordValidationResult appended per
 * file (validator.py:408-415) — so that synthetic record adds 1 to
 * num_messages_total, its failure count to num_errors, etc. Use
 * [[fileTotalsWithSequential]] for that exact semantic;
 * [[fileTotals]] alone covers the field-validation records.
 */
object FileAggregates {

  /** failed-check count per record. */
  def failedCount: Column =
    size(filter(col("validations"), v => !v.getField("valid")))

  /** A1-A4 (cvp...py:115-138,153): per-file totals over the per-record
   *  field validations — num_messages_total, num_validations (Σ checks),
   *  num_errors (Σ failed checks), num_error_messages (records with ≥1
   *  failure), num_valid. */
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

  /** A1-A4 with the sequential result row folded in, exactly like the
   *  reference loop: per file, the sequential RecordValidationResult counts
   *  as ONE extra record whose validations are the per-file sequential
   *  verdict rows (failures, or the single passing sentinel).
   *  @param sequential output of SequentialChecks: (file, field_path,
   *                    valid, details, serial_number). */
  def fileTotalsWithSequential(validated: DataFrame, sequential: DataFrame): DataFrame = {
    val base = fileTotals(validated)
    val seq = sequential.groupBy(col("file")).agg(
      count(lit(1)).as("seq_validations"),
      sum(when(!col("valid"), 1L).otherwise(0L)).as("seq_errors"))
    base.join(seq, Seq("file"), "left")
      .select(
        col("file"),
        (col("num_messages_total") + when(col("seq_validations").isNotNull, 1L).otherwise(0L))
          .as("num_messages_total"),
        (col("num_validations") + coalesce(col("seq_validations"), lit(0L)))
          .as("num_validations"),
        (col("num_errors") + coalesce(col("seq_errors"), lit(0L))).as("num_errors"),
        (col("num_error_messages") +
          when(coalesce(col("seq_errors"), lit(0L)) > 0, 1L).otherwise(0L))
          .as("num_error_messages"))
      .withColumn("num_valid", col("num_messages_total") - col("num_error_messages"))
  }

  /** Reference error-histogram key (cvp...py:131): Python renders a null
   *  field_path as 'None'. */
  def errorMessage(fieldPath: Column, details: Column): Column =
    concat(lit("Invalid field '"), coalesce(fieldPath, lit("None")),
      lit("' due to "), details)

  /** A3 (cvp...py:122-135,143-145): distinct failure message → occurrence
   *  count, per file; message format "Invalid field '<path>' due to
   *  <details>" exactly as the reference's error_dict keys. */
  def errorHistogram(validated: DataFrame): DataFrame =
    validated
      .select(col("file"), explode(col("validations")).as("v"))
      .filter(!col("v.valid"))
      .groupBy(col("file"),
        errorMessage(col("v.field_path"), col("v.details")).as("error_message"))
      .agg(count(lit(1)).as("occurrences"))

  /** A3 with sequential failures folded in — the reference loop iterates
   *  the full result list including the sequential record (cvp...py:123-135;
   *  its None field_path renders as 'None'). */
  def errorHistogramWithSequential(validated: DataFrame, sequential: DataFrame): DataFrame = {
    val fieldMsgs = validated
      .select(col("file"), explode(col("validations")).as("v"))
      .filter(!col("v.valid"))
      .select(col("file"), errorMessage(col("v.field_path"), col("v.details")).as("error_message"))
    val seqMsgs = sequential
      .filter(!col("valid"))
      .select(col("file"), errorMessage(col("field_path"), col("details")).as("error_message"))
    fieldMsgs.unionByName(seqMsgs)
      .groupBy(col("file"), col("error_message"))
      .agg(count(lit(1)).as("occurrences"))
  }

  /** A5 (bucket_event_lambda_handler.py:105-198): dimensional counters —
   *  counts grouped by up to two dimension columns (State×TrafficType,
   *  DataProvider×DataType). The reference emits per-file increments to
   *  CloudWatch; here they're per-batch aggregates. */
  def dimensionalCounts(meta: DataFrame, dims: Seq[String]): DataFrame =
    meta.groupBy(dims.map(col): _*)
      .agg(
        count(lit(1)).as("file_count"),
        sum(coalesce(col("MessageCount"), lit(0L))).as("message_count"))

  /** A5 in the reference's exact metric-family shape: one long-format row
   *  per (namespace, metric, dims) with the same namespaces, dimension
   *  names, and per-file values the CloudWatch calls emit — including the
   *  zero-byte sentinel (ContentLength == 166,
   *  bucket_event_lambda_handler.py:129) and the hardcoded Value=10 quirk
   *  of the generic cv branch (bucket_event_lambda_handler.py:168).
   *
   *  @param meta file-metadata rows with Dataset / State / TrafficType /
   *              TableName / DataProvider / DataType / ContentLength and,
   *              for the CVP families, num_valid + num_error_messages.
   */
  def metricDatums(meta: DataFrame): DataFrame = {
    def family(nameSpace: String, metric: String, filterCond: Column,
               dim1: (String, Column), dim2: (String, Column), value: Column): DataFrame =
      meta.filter(filterCond)
        .groupBy(dim1._2.as("dim1_value"), dim2._2.as("dim2_value"))
        .agg(sum(value).as("value"), count(lit(1)).as("file_count"))
        .select(
          lit(nameSpace).as("namespace"), lit(metric).as("metric_name"),
          lit(dim1._1).as("dim1_name"), col("dim1_value"),
          lit(dim2._1).as("dim2_name"), col("dim2_value"),
          col("value"), col("file_count"))

    val waze = family("dot-sdc-waze-submissions-bucket-metric",
      "Counts by state and traffic type", col("Dataset") === "waze",
      "State" -> col("State"), "TrafficType" -> col("TrafficType"), lit(1L))
    val wazeZero = family("dot-sdc-waze-zero-byte-submissions-metric",
      "Zero Byte Submissions by State and traffic type",
      col("Dataset") === "waze" && col("ContentLength") === 166,
      "State" -> col("State"), "TrafficType" -> col("TrafficType"), lit(1L))
    val cv = family("dot-sdc-cv-submissions-bucket-metric",
      "Counts by provider and datatype", col("Dataset") === "cv",
      "DataProvider" -> col("DataProvider"), "DataType" -> col("DataType"), lit(10L))
    val curated = family("dot-sdc-waze-curated-bucket-metric",
      "Counts by state and table name", col("Dataset") =!= "manifest",
      "State" -> col("State"), "TableName" -> col("TableName"), lit(1L))

    waze.unionByName(wazeZero).unionByName(cv).unionByName(curated)
  }

  /** A5 CVP variant (cvp...py:155-227): per (DataProvider, DataType) —
   *  submission count, valid / invalid message sums, file count. Input is
   *  the per-file metadata joined with A2 totals. */
  def cvpMetricDatums(metaWithTotals: DataFrame): DataFrame =
    metaWithTotals
      .groupBy(col("DataProvider"), col("DataType"))
      .agg(
        count(lit(1)).as("submission_count"),
        sum(coalesce(col("num_valid"), lit(0L))).as("valid_messages"),
        sum(coalesce(col("num_error_messages"), lit(0L))).as("invalid_messages"),
        count(lit(1)).as("data_file_count"))

  /** Per-file verdict line (cvp...py:141-151): PASSED iff zero failures. */
  def fileVerdicts(totals: DataFrame): DataFrame =
    totals.withColumn("verdict",
      when(col("num_errors") === 0, lit("PASSED")).otherwise(lit("FAILED")))
}
