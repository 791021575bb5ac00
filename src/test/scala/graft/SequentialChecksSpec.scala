package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sequential.SequentialChecks

/** Window-check goldens pinned to odevalidator/sequential.py. */
class SequentialChecksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(sec: Int): Timestamp = Timestamp.valueOf(f"2019-05-14 19:05:$sec%02d")

  /** (file, serial, bundle, record, size, genSec, rcvSec, logFile) */
  private def std(rows: (String, Long, Long, Long, Long, Int, Int, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (f, s, b, r, sz, g, rc, lf) =>
      (f, s, b, r, sz, ts(g), ts(rc), Option(lf))
    }.toDF(SequentialChecks.FileCol, SequentialChecks.SerialNumber,
      SequentialChecks.BundleId, SequentialChecks.RecordId,
      SequentialChecks.BundleSize, SequentialChecks.GeneratedAt,
      SequentialChecks.ReceivedAt, SequentialChecks.LogFileName)
  }

  private def results(df: DataFrame, skips: Map[String, org.apache.spark.sql.Column] = Map.empty) =
    SequentialChecks(df, skips)
      .select("file", "field_path", "valid", "details", "serial_number")
      .collect().toSeq
      .map(r => (r.getString(0), Option(r.getString(1)), r.getBoolean(2),
        r.getString(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))

  test("clean full bundle yields only the passing sentinel (W6)") {
    val df = std(
      ("f", 100, 7, 0, 3, 1, 1, "log"),
      ("f", 101, 7, 1, 3, 2, 2, "log"),
      ("f", 102, 7, 2, 3, 3, 3, "log"))
    assert(results(df) == Seq(("f", Some("SequentialCheck"), true, "", None)))
  }

  test("recordId gap detail (W2, sequential.py:42-43)") {
    val df = std(
      ("f", 100, 7, 0, 3, 1, 1, "log"),
      ("f", 101, 7, 2, 3, 2, 2, "log"),
      ("f", 102, 7, 3, 3, 3, 3, "log"))
    val fails = results(df).filter(!_._3)
    assert(fails.map(_._4).contains(
      "Detected incorrectly incremented recordId. Expected recordId '1' but got '2'"))
    assert(fails.forall(_._5.contains(101L)) || fails.size > 1)
  }

  test("bundleSize == 1 disables the recordId check (sequential.py:42)") {
    val df = std(
      ("f", 100, 7, 5, 1, 1, 1, "log"),
      ("f", 101, 7, 9, 1, 2, 2, "log"))
    // recordId jumps 5→9 but size==1; serial is fine; bundle-size check:
    // first_rid=5 != 0 → tail branch → last_rid 9 != size-1 (0) → one failure
    val fails = results(df).filter(!_._3)
    assert(!fails.exists(_._4.contains("recordId. Expected")))
  }

  test("null bundleIds group as ONE bundle (Python None == None), pair checks run") {
    import spark.implicits._
    // the reference compares raw bundleIds with ==, so records whose
    // bundleId is None form one bundle and a serial gap inside them MUST
    // fail; a null-unsafe comparison would split them into singleton
    // bundles and emit a clean sentinel instead
    val df = Seq(
      ("f", 100L, Option.empty[Long], 0L, 3L, 1, 1, Option("log")),
      ("f", 105L, Option.empty[Long], 1L, 3L, 2, 2, Option("log")),
      ("f", 106L, Option.empty[Long], 2L, 3L, 3, 3, Option("log")))
      .map { case (f, s, b, r, sz, g, rc, lf) => (f, s, b, r, sz, ts(g), ts(rc), lf) }
      .toDF(SequentialChecks.FileCol, SequentialChecks.SerialNumber,
        SequentialChecks.BundleId, SequentialChecks.RecordId,
        SequentialChecks.BundleSize, SequentialChecks.GeneratedAt,
        SequentialChecks.ReceivedAt, SequentialChecks.LogFileName)
    val fails = results(df).filter(!_._3)
    assert(fails.map(_._4).contains(
      "Detected incorrectly incremented serialNumber. Expected serialNumber '101' but got '105'"))
  }

  test("serial gap inside a bundle fails; across islands it does not (W1/W3)") {
    val df = std(
      ("f", 100, 1, 0, 2, 1, 1, "log"),
      ("f", 101, 1, 1, 2, 2, 2, "log"),
      // bundle changes; serial jumps 101 → 200: NOT compared (bundle boundary)
      ("f", 200, 2, 0, 2, 3, 3, "log"),
      ("f", 202, 2, 1, 2, 4, 4, "log")) // gap inside bundle 2: 200 → 202
    val fails = results(df).filter(!_._3).map(_._4)
    assert(fails.count(_.startsWith("Detected incorrectly incremented serialNumber")) == 1)
    assert(fails.exists(_.contains("Expected serialNumber '201' but got '202'")))
  }

  test("a recurring bundleId forms two islands, not one group (W1)") {
    val df = std(
      ("f", 100, 1, 0, 2, 1, 1, "log"),
      ("f", 101, 1, 1, 2, 2, 2, "log"),
      ("f", 102, 2, 0, 1, 3, 3, "log"),
      // bundleId 1 AGAIN — must start a fresh island whose recordId
      // restarts at 0 without comparing against serial 101's record 1
      ("f", 103, 1, 0, 2, 4, 4, "log"),
      ("f", 104, 1, 1, 2, 5, 5, "log"))
    val fails = results(df).filter(!_._3)
    assert(fails.isEmpty, s"expected clean islands, got $fails")
  }

  test("chronology regress is strict and second-truncated (W4)") {
    val df = std(
      ("f", 100, 7, 0, 2, 5, 5, "log"),
      ("f", 101, 7, 1, 2, 4, 5, "log")) // generatedAt regresses, receivedAt equal
    val fails = results(df).filter(!_._3).map(_._4)
    assert(fails == Seq(
      "Detected non-chronological recordGeneratedAt. Previous timestamp was " +
        "'2019-05-14 19:05:05+00:00' but current timestamp is '2019-05-14 19:05:04+00:00'"))
  }

  test("full-bundle size mismatch emits once per bundle (W5 dedup)") {
    val df = std( // first=0, last=3(=size-1=3)... size declared 4 but 3 records
      ("f", 100, 7, 0, 4, 1, 1, "log"),
      ("f", 101, 7, 1, 4, 2, 2, "log"),
      ("f", 103, 7, 3, 4, 3, 3, "log")) // recordId 1→3 also a W2 failure
    val fails = results(df).filter(!_._3).map(_._4)
    assert(fails.count(_.startsWith("bundleSize doesn't match number of records")) == 1)
    assert(fails.exists(_ ==
      "bundleSize doesn't match number of records. Number of records: '3' != bundlSize: '4'"))
  }

  test("tail-of-partial bundle checks lastRecordId vs size-1 (W5)") {
    val df = std(
      ("f", 100, 7, 2, 5, 1, 1, "log"),
      ("f", 101, 7, 3, 5, 2, 2, "log")) // first=2≠0, last=3 ≠ 4 → tail failure
    val fails = results(df).filter(!_._3).map(_._4)
    assert(fails == Seq(
      "bundleSize doesn't match last recordId. Last recordId: '3' != (bundleSize-1: '4')"))
  }

  test("head-of-partial (first=0, last<size-1) emits nothing (sequential.py:69-77)") {
    val df = std(
      ("f", 100, 7, 0, 5, 1, 1, "log"),
      ("f", 101, 7, 1, 5, 2, 2, "log"))
    assert(results(df) == Seq(("f", Some("SequentialCheck"), true, "", None)))
  }

  test("missing logFileName suppresses the full-bundle size failure (W5)") {
    val df = std(
      ("f", 100, 7, 0, 4, 1, 1, null),
      ("f", 101, 7, 1, 4, 2, 2, null),
      ("f", 103, 7, 3, 4, 3, 3, null))
    val fails = results(df).filter(!_._3).map(_._4)
    assert(!fails.exists(_.startsWith("bundleSize doesn't match number of records")))
  }

  test("a skip flag raised by ANY record suppresses the whole file (W7)") {
    import SequentialChecks.SkipPaths._
    val df = std(
      ("f", 100, 7, 0, 3, 1, 1, "log"),
      ("f", 101, 7, 2, 3, 2, 2, "log"), // recordId gap — would fail
      ("f", 102, 7, 3, 3, 3, 3, "log"))
      .withColumn("skipflag", col(SequentialChecks.SerialNumber) === 102)
    val res = results(df, Map(RecordIdPath -> col("skipflag")))
    assert(!res.exists(r => !r._3 && r._4.contains("recordId. Expected")))
  }

  test("skip gating is per-file: an unflagged file still fails (W7)") {
    import SequentialChecks.SkipPaths._
    val df = std(
      ("f1", 100, 7, 0, 3, 1, 1, "log"),
      ("f1", 101, 7, 2, 3, 2, 2, "log"),
      ("f2", 200, 8, 0, 3, 1, 1, "log"),
      ("f2", 201, 8, 2, 3, 2, 2, "log"))
      .withColumn("skipflag", col(SequentialChecks.FileCol) === "f1")
    val res = results(df, Map(RecordIdPath -> col("skipflag")))
    val byFile = res.filter(r => !r._3 && r._4.contains("recordId")).groupBy(_._1)
    assert(!byFile.contains("f1") && byFile.contains("f2"))
  }
}
