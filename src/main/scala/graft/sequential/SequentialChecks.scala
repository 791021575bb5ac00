package graft.sequential

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
   *  to the standard sequential input columns. */
  def withStandardColumns(df: DataFrame, fileCol: Column): DataFrame =
    df.select(
      fileCol.as(FileCol),
      col("metadata.serialId.serialNumber").try_cast("long").as(SerialNumber),
      col("metadata.serialId.bundleId").try_cast("long").as(BundleId),
      col("metadata.serialId.recordId").try_cast("long").as(RecordId),
      col("metadata.serialId.bundleSize").try_cast("long").as(BundleSize),
      date_trunc("second", try_to_timestamp(col("metadata.recordGeneratedAt"))).as(GeneratedAt),
      date_trunc("second", try_to_timestamp(col("metadata.odeReceivedAt"))).as(ReceivedAt),
      col("metadata.logFileName").as(LogFileName))

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
    val fileW = Window.partitionBy(FileCol)
    def fileSkip(path: String): Column =
      skips.get(path).map(c => coalesce(max(c).over(fileW), lit(false))).getOrElse(lit(false))

    val w = Window.partitionBy(FileCol).orderBy(SerialNumber)
    val runStart = when(
      lag(col(BundleId), 1).over(w).isNull || col(BundleId) =!= lag(col(BundleId), 1).over(w), 1
    ).otherwise(0)

    val seg = records
      .withColumn("bundle_run", sum(runStart).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("skip_record_id", fileSkip(RecordIdPath))
      .withColumn("skip_serial", fileSkip(SerialNumberPath))
      .withColumn("skip_gen", fileSkip(GeneratedAtPath))
      .withColumn("skip_rcv", fileSkip(ReceivedAtPath))
      .withColumn("skip_bundle_size", fileSkip(BundleSizePath))

    val w2 = Window.partitionBy(col(FileCol), col("bundle_run")).orderBy(SerialNumber)
    val paired = seg
      .withColumn("prev_record_id", lag(col(RecordId), 1).over(w2))
      .withColumn("prev_serial", lag(col(SerialNumber), 1).over(w2))
      .withColumn("prev_gen", lag(col(GeneratedAt), 1).over(w2))
      .withColumn("prev_rcv", lag(col(ReceivedAt), 1).over(w2))

    def longStr(c: Column): Column = c.cast("long").cast("string")
    // Python str(tz-aware datetime), second-truncated (sequential.py:32-33):
    // "2019-05-14 19:05:02+00:00" — session is UTC.
    def tsStr(c: Column): Column = concat(date_format(c, "yyyy-MM-dd HH:mm:ss"), lit("+00:00"))

    val pairFailures = paired
      .filter(col("prev_serial").isNotNull) // non-first record of its bundle
      .select(col(FileCol), col(SerialNumber), struct(
        when(!col("skip_record_id") && col(BundleSize) > 1 &&
             col(RecordId) =!= col("prev_record_id") + 1,
          concat(lit("Detected incorrectly incremented recordId. Expected recordId '"),
            longStr(col("prev_record_id") + 1), lit("' but got '"), longStr(col(RecordId)), lit("'")))
          .as("record_id_fail"),
        when(!col("skip_serial") && col(SerialNumber) =!= col("prev_serial") + 1,
          concat(lit("Detected incorrectly incremented serialNumber. Expected serialNumber '"),
            longStr(col("prev_serial") + 1), lit("' but got '"), longStr(col(SerialNumber)), lit("'")))
          .as("serial_fail"),
        when(!col("skip_gen") && col(GeneratedAt) < col("prev_gen"),
          concat(lit("Detected non-chronological recordGeneratedAt. Previous timestamp was '"),
            tsStr(col("prev_gen")), lit("' but current timestamp is '"),
            tsStr(col(GeneratedAt)), lit("'")))
          .as("gen_fail"),
        when(!col("skip_rcv") && col(ReceivedAt) < col("prev_rcv"),
          concat(lit("Detected non-chronological odeReceivedAt. Previous timestamp was '"),
            tsStr(col("prev_rcv")), lit("' but current timestamp is '"),
            tsStr(col(ReceivedAt)), lit("'")))
          .as("rcv_fail")).as("fails"))
      .select(col(FileCol), col(SerialNumber),
        explode(filter(array(col("fails.record_id_fail"), col("fails.serial_fail"),
          col("fails.gen_fail"), col("fails.rcv_fail")), _.isNotNull)).as("details"))
      .select(col(FileCol), lit(null).cast("string").as("field_path"), lit(false).as("valid"),
        col("details"), col(SerialNumber).as("serial_number"))

    val bundleFailures = bundleSizeFailures(seg)

    val allFailures = pairFailures.unionByName(bundleFailures)

    // W6: files with zero failures get one passing sentinel row.
    val passFiles = records.select(col(FileCol)).distinct()
      .join(allFailures.select(col(FileCol)).distinct(), Seq(FileCol), "left_anti")
      .select(col(FileCol), lit(SequentialCheck).as("field_path"), lit(true).as("valid"),
        lit("").as("details"), lit(null).cast("long").as("serial_number"))

    allFailures.unionByName(passFiles)
  }

  /** W5 (sequential.py:61-86). Branch on the bundle's FIRST record:
   *  full list  = firstRecordId==0 && lastRecordId==first.bundleSize-1 ⇒
   *    emit per record where logFileName present && count != bundleSize;
   *  tail list  = firstRecordId!=0 ⇒ emit per record where
   *    lastRecordId != bundleSize-1;
   *  in both branches consecutive emissions with equal bundleSize collapse
   *  to one (prev_bundle_size only updates on emission). serial_id on the
   *  failure is the bundle's LAST record. */
  private def bundleSizeFailures(seg: DataFrame): DataFrame = {
    val bw = Window.partitionBy(col(FileCol), col("bundle_run"))
    val annotated = seg
      .withColumn("first_record_id", first(col(RecordId)).over(bw.orderBy(SerialNumber)))
      .withColumn("first_bundle_size", first(col(BundleSize)).over(bw.orderBy(SerialNumber)))
      .withColumn("last_record_id", last(col(RecordId)).over(
        bw.orderBy(SerialNumber).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("last_serial", max(col(SerialNumber)).over(bw))
      .withColumn("bundle_count", count(lit(1)).over(bw))
      .filter(!col("skip_bundle_size"))

    val isFull = col("first_record_id") === 0 &&
      col("last_record_id") === col("first_bundle_size") - 1

    val emits = annotated.withColumn("emit",
      when(col("first_record_id") === 0,
        isFull && col(LogFileName).isNotNull && col("bundle_count") =!= col(BundleSize))
        .otherwise(col("last_record_id") =!= col(BundleSize) - 1))
      .filter(col("emit"))

    // consecutive-dedup on the emitted subsequence by bundleSize value
    val ew = Window.partitionBy(col(FileCol), col("bundle_run")).orderBy(SerialNumber)
    val deduped = emits
      .withColumn("prev_emitted_size", lag(col(BundleSize), 1).over(ew))
      .filter(col("prev_emitted_size").isNull || col("prev_emitted_size") =!= col(BundleSize))

    def longStr(c: Column): Column = c.cast("long").cast("string")
    deduped.select(
      col(FileCol),
      lit(null).cast("string").as("field_path"),
      lit(false).as("valid"),
      when(col("first_record_id") === 0,
        concat(lit("bundleSize doesn't match number of records. Number of records: '"),
          longStr(col("bundle_count")), lit("' != bundlSize: '"), longStr(col(BundleSize)), lit("'")))
        .otherwise(
          concat(lit("bundleSize doesn't match last recordId. Last recordId: '"),
            longStr(col("last_record_id")), lit("' != (bundleSize-1: '"),
            longStr(col(BundleSize) - 1), lit("')")))
        .as("details"),
      col("last_serial").as("serial_number"))
  }
}
