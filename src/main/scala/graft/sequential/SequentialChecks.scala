package graft.sequential

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Cross-record sequential validation (reference: odevalidator/sequential.py)
 * re-expressed as window functions — per-file, shuffle-once:
 *
 *  - W1 bundle segmentation: after sorting the file's records by
 *    serialNumber, maximal runs of equal bundleId (consecutive runs, NOT a
 *    global group-by — a recurring bundleId forms two bundles;
 *    sequential.py:89-110) — classic gaps-and-islands via lag + running sum;
 *  - W2 recordId increment within bundle when bundleSize>1 (sequential.py:42-43);
 *  - W3 serialNumber increment within bundle (sequential.py:44-45; pairs
 *    spanning bundle boundaries are never compared);
 *  - W4 chronology: recordGeneratedAt / odeReceivedAt non-decreasing,
 *    second-truncated (sequential.py:32-33,46-49);
 *  - W5 bundle-size consistency with the reference's consecutive-dedup on
 *    emitted failures (sequential.py:61-86);
 *  - W6 zero-failure sentinel: one passing "SequentialCheck" row per file
 *    (sequential.py:22-25);
 *  - W7 skip-set gating: a skip flag raised by ANY record in a file
 *    suppresses that path's checks for the WHOLE file (validator.py:110-112
 *    mutates a suite-global set read after all records) — reproduced as
 *    per-file max() over the per-record flags, no mutable state.
 *
 * At 100 TB scale: everything partitions by file — one exchange on the file
 * key, then all windows and the bundle aggregate reuse that partitioning.
 * Files are independent, so parallelism = number of files and no global
 * sort ever materializes.
 */
object SequentialChecks {

  /** Expected input column names (prepare with [[withStandardColumns]]). */
  val FileCol = "file"
  val SerialNumber = "serial_number"
  val BundleId = "bundle_id"
  val RecordId = "record_id"
  val BundleSize = "bundle_size"
  val GeneratedAt = "generated_at"
  val ReceivedAt = "received_at"
  val LogFileName = "log_file_name"

  val SequentialCheck = "SequentialCheck"

  /** Paths whose skip flags gate specific checks (config_2.ini:74-98,9). */
  object SkipPaths {
    val RecordIdPath = "metadata.serialId.recordId"
    val SerialNumberPath = "metadata.serialId.serialNumber"
    val GeneratedAtPath = "metadata.recordGeneratedAt"
    val ReceivedAtPath = "metadata.odeReceivedAt"
    val BundleSizePath = "metadata.serialId.bundleSize"
  }

  /** Project an ODE-shaped DataFrame (metadata struct per FIXTURES.md §1)
   *  to the standard sequential input columns, plus any `extra` columns
   *  that must ride along (e.g. per-record skip flags). */
  def withStandardColumns(df: DataFrame, fileCol: Column,
                          extra: Seq[Column] = Nil): DataFrame =
    df.select(Seq(
      fileCol.as(FileCol),
      col("metadata.serialId.serialNumber").try_cast("long").as(SerialNumber),
      col("metadata.serialId.bundleId").try_cast("long").as(BundleId),
      col("metadata.serialId.recordId").try_cast("long").as(RecordId),
      col("metadata.serialId.bundleSize").try_cast("long").as(BundleSize),
      date_trunc("second", try_to_timestamp(col("metadata.recordGeneratedAt"))).as(GeneratedAt),
      date_trunc("second", try_to_timestamp(col("metadata.odeReceivedAt"))).as(ReceivedAt),
      col("metadata.logFileName").as(LogFileName)) ++ extra: _*)

  /**
   * Run all sequential checks.
   *
   * @param records standard-column DataFrame (see [[withStandardColumns]]);
   *                may carry extra columns (e.g. per-record skip flags).
   * @param skips   per-record boolean skip-flag Column per gated path
   *                (missing path = never skipped).
   * @return (file, field_path, valid, details, serial_number) — failures
   *         plus one passing SequentialCheck sentinel per failure-free file.
   */
  def apply(records: DataFrame, skips: Map[String, Column] = Map.empty): DataFrame = {
    import SkipPaths._
    // SINGLE-PASS plan: every window below partitions by `file` (or by
    // (file, bundle_run), which hashpartitioning(file) already satisfies),
    // so the whole computation — pair checks, bundle-size checks, the W6
    // sentinel — is ONE exchange + sorts + one explode. The naive
    // formulation (union of three branches derived from the same input)
    // re-scans and re-shuffles the input once per branch: AQE does NOT
    // reuse those exchanges (verified on the final adaptive plan), which
    // at 100 TB would mean 4× the scan+shuffle work.
    val fileW = Window.partitionBy(FileCol)
    def fileSkip(path: String): Column =
      skips.get(path).map(c => coalesce(max(c).over(fileW), lit(false))).getOrElse(lit(false))

    val w = Window.partitionBy(FileCol).orderBy(SerialNumber)
    // null-SAFE run segmentation: the reference compares raw bundleIds
    // with Python == (None == None → same bundle, sequential.py:96-104);
    // a null-unsafe =!= would nullify the comparison and silently make
    // every null-bundleId record its own singleton bundle, disabling all
    // pair checks for the file
    val runStart = when(
      !(col(BundleId) <=> lag(col(BundleId), 1).over(w)), 1
    ).otherwise(0)

    val seg = records
      .withColumn("bundle_run", sum(runStart).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("skip_record_id", fileSkip(RecordIdPath))
      .withColumn("skip_serial", fileSkip(SerialNumberPath))
      .withColumn("skip_gen", fileSkip(GeneratedAtPath))
      .withColumn("skip_rcv", fileSkip(ReceivedAtPath))
      .withColumn("skip_bundle_size", fileSkip(BundleSizePath))

    val w2 = Window.partitionBy(col(FileCol), col("bundle_run")).orderBy(SerialNumber)
    val bw = Window.partitionBy(col(FileCol), col("bundle_run"))
    val wholeBundle = w2.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    def longStr(c: Column): Column = c.cast("long").cast("string")
    // Python str(tz-aware datetime), second-truncated (sequential.py:32-33):
    // "2019-05-14 19:05:02+00:00" — session is UTC.
    def tsStr(c: Column): Column = concat(date_format(c, "yyyy-MM-dd HH:mm:ss"), lit("+00:00"))

    val annotated = seg
      // pair context (W2-W4, sequential.py:36-49)
      .withColumn("prev_record_id", lag(col(RecordId), 1).over(w2))
      .withColumn("prev_serial", lag(col(SerialNumber), 1).over(w2))
      .withColumn("prev_gen", lag(col(GeneratedAt), 1).over(w2))
      .withColumn("prev_rcv", lag(col(ReceivedAt), 1).over(w2))
      // bundle context (W5, sequential.py:61-86)
      .withColumn("first_record_id", first(col(RecordId)).over(w2))
      .withColumn("first_bundle_size", first(col(BundleSize)).over(w2))
      .withColumn("last_record_id", last(col(RecordId)).over(wholeBundle))
      .withColumn("last_serial", max(col(SerialNumber)).over(bw))
      .withColumn("bundle_count", count(lit(1)).over(bw))

    val isFull = col("first_record_id") === 0 &&
      col("last_record_id") === col("first_bundle_size") - 1

    // W5 emission per record; consecutive emissions with equal bundleSize
    // collapse (prev_bundle_size only updates on emission) — the "previous
    // emitted size" is a null-skipping last() over earlier rows.
    val emit = !col("skip_bundle_size") && (
      when(col("first_record_id") === 0,
        isFull && col(LogFileName).isNotNull && col("bundle_count") =!= col(BundleSize))
        .otherwise(col("last_record_id") =!= col(BundleSize) - 1))

    val withEmit = annotated
      .withColumn("emit", emit)
      .withColumn("prev_emitted_size",
        last(when(col("emit"), col(BundleSize)), ignoreNulls = true)
          .over(w2.rowsBetween(Window.unboundedPreceding, -1)))

    def failRow(details: Column, serial: Column): Column = struct(
      lit(null).cast("string").as("field_path"), lit(false).as("valid"),
      details.as("details"), serial.cast("long").as("serial_number"))

    val pairChecks = array(
      when(col("prev_serial").isNotNull && !col("skip_record_id") && col(BundleSize) > 1 &&
           col(RecordId) =!= col("prev_record_id") + 1,
        failRow(concat(lit("Detected incorrectly incremented recordId. Expected recordId '"),
          longStr(col("prev_record_id") + 1), lit("' but got '"), longStr(col(RecordId)), lit("'")),
          col(SerialNumber))),
      when(col("prev_serial").isNotNull && !col("skip_serial") &&
           col(SerialNumber) =!= col("prev_serial") + 1,
        failRow(concat(lit("Detected incorrectly incremented serialNumber. Expected serialNumber '"),
          longStr(col("prev_serial") + 1), lit("' but got '"), longStr(col(SerialNumber)), lit("'")),
          col(SerialNumber))),
      when(col("prev_serial").isNotNull && !col("skip_gen") && col(GeneratedAt) < col("prev_gen"),
        failRow(concat(lit("Detected non-chronological recordGeneratedAt. Previous timestamp was '"),
          tsStr(col("prev_gen")), lit("' but current timestamp is '"),
          tsStr(col(GeneratedAt)), lit("'")), col(SerialNumber))),
      when(col("prev_serial").isNotNull && !col("skip_rcv") && col(ReceivedAt) < col("prev_rcv"),
        failRow(concat(lit("Detected non-chronological odeReceivedAt. Previous timestamp was '"),
          tsStr(col("prev_rcv")), lit("' but current timestamp is '"),
          tsStr(col(ReceivedAt)), lit("'")), col(SerialNumber))),
      when(col("emit") &&
           (col("prev_emitted_size").isNull || col("prev_emitted_size") =!= col(BundleSize)),
        failRow(
          when(col("first_record_id") === 0,
            concat(lit("bundleSize doesn't match number of records. Number of records: '"),
              longStr(col("bundle_count")), lit("' != bundlSize: '"), longStr(col(BundleSize)), lit("'")))
            .otherwise(
              concat(lit("bundleSize doesn't match last recordId. Last recordId: '"),
                longStr(col("last_record_id")), lit("' != (bundleSize-1: '"),
                longStr(col(BundleSize) - 1), lit("')"))),
          col("last_serial"))))

    val sentinel = struct(
      lit(SequentialCheck).as("field_path"), lit(true).as("valid"),
      lit("").as("details"), lit(null).cast("long").as("serial_number"))

    val perRecord = withEmit
      .withColumn("fails", filter(pairChecks, _.isNotNull))
      // W6: zero failures in the file ⇒ one sentinel row, attached to the
      // file's first record (row_number avoids a second pass over the input)
      .withColumn("file_fail_count", sum(size(col("fails"))).over(fileW))
      .withColumn("rn", row_number().over(w))

    perRecord
      .select(col(FileCol),
        explode(when(col("file_fail_count") === 0,
          when(col("rn") === 1, array(sentinel)).otherwise(array().cast(ArrayType(sentinelType))))
          .otherwise(col("fails"))).as("r"))
      .select(col(FileCol), col("r.field_path").as("field_path"), col("r.valid").as("valid"),
        col("r.details").as("details"), col("r.serial_number").as("serial_number"))
  }

  private val sentinelType = StructType(Seq(
    StructField("field_path", StringType),
    StructField("valid", BooleanType, nullable = false),
    StructField("details", StringType),
    StructField("serial_number", LongType)))
}
