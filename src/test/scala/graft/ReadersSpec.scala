package graft

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{Metadata, Readers}

/** S4/S5 source behaviors: gzip auto-decompress, blank-line drop, file
  * metadata columns, key derivation. */
class ReadersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("CRLF header line matches every column (Python strip() semantics, S8)") {
    val dir = Files.createTempDirectory("graft-crlf").toFile
    val f = new java.io.File(dir, "data.csv")
    Files.writeString(f.toPath, "alpha,beta,gamma\r\n1,2,3\r\n")
    val suite = graft.config.SuiteLoader.fromString(
      "[_settings]\nDataType = csv\nSequential = False\nHasHeader = True\n\n" +
        "[alpha]\nType = string\n\n[beta]\nType = string\n\n[gamma]\nType = string\n")
    val checks = Readers.checkCsvHeaders(spark, f.getAbsolutePath, suite)
      .select("cell", "matches").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // the last cell arrives as "gamma\r" — str.strip() equivalence must
    // still match it (trim() alone leaves the \r and fails the column)
    assert(checks.values.forall(identity), s"header mismatches: $checks")
    assert(checks.size == 3)
  }

  test("gz files auto-decompress with blank lines dropped (S4/S5/F13)") {
    val dir = Files.createTempDirectory("graft-gz").toFile
    val gz = new java.io.File(dir, "part.json.gz")
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(new FileOutputStream(gz)), "UTF-8"))
    w.write("{\"a\":1}\n\n   \n{\"a\":2}\n")
    w.close()
    val plain = new java.io.File(dir, "plain.json")
    Files.writeString(plain.toPath, "{\"a\":3}\n")

    val rows = Readers.lines(spark, dir.getAbsolutePath + "/*")
      .select(element_at(split(col("file"), "/"), -1).as("f"), col("value"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(rows == Seq(
      ("part.json.gz", "{\"a\":1}"),
      ("part.json.gz", "{\"a\":2}"),
      ("plain.json", "{\"a\":3}")))
  }

  test("file metadata columns surface size and mtime (S2)") {
    val dir = Files.createTempDirectory("graft-meta").toFile
    val f = new java.io.File(dir, "x.txt")
    Files.writeString(f.toPath, "hello\nworld\n")
    val row = Readers.lines(spark, f.getAbsolutePath)
      .select(col("file_size"), col("file_modification_time")).head()
    assert(row.getLong(0) == 12L)
    assert(!row.isNullAt(1))
  }

  test("corrupt NDJSON rows survive as data, not parse-time losses (S6)") {
    val dir = Files.createTempDirectory("graft-corrupt").toFile
    Files.writeString(new java.io.File(dir, "m.json").toPath,
      "{\"metadata\":{\"recordType\":\"bsmTx\"}}\nTHIS IS NOT JSON\n")
    val rows = graft.ingest.Readers
      .ndjson(spark, dir.getAbsolutePath + "/m.json", graft.pipeline.OdeSchema.record)
      .select(col("_corrupt_record"), col("metadata.recordType"))
      .collect()
    assert(rows.length == 2)
    val (bad, good) = rows.partition(r => !r.isNullAt(0))
    assert(bad.head.getString(0) == "THIS IS NOT JSON") // raw text retained
    assert(good.head.getString(1) == "bsmTx")
    // NB the reference CRASHES the whole file here (json.loads uncaught,
    // validator.py:395) — surfacing the row is the engine upgrade.
  }

  test("positionalCsv keeps comma-only rows, skips whitespace-only lines, survives count()") {
    val dir = Files.createTempDirectory("graft-csvskip").toFile
    Files.writeString(new java.io.File(dir, "c.csv").toPath,
      "DeviceID,utc,local,note,vslmph,status\n" +
        "1,2019-05-14T19:05:47.123Z,2019-05-14 19:05:47,n,5,on\n" +
        ",,,,,\n" +          // comma-only: validated per-field, NOT skipped
        "   \n" +            // whitespace-only: skipped (F13)
        "2,2019-05-14T19:05:48.123Z,2019-05-14 19:05:48,\"a,b\",7,off\n")
    val suite = graft.config.SuiteLoader.fromFile("/root/repo/fixtures/csv/suite.ini")
    val df = Readers.positionalCsv(spark, dir.getAbsolutePath + "/c.csv", suite)
    // count() prunes to the filter columns — the corrupt-only-column trap
    assert(df.count() == 3)
    val rows = df.orderBy("deviceid").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("", "1", "2"))
    // quotes are plain characters (naive ',' split): note cell is `"a`
    val r2 = rows.find(_.getString(0) == "2").get
    assert(r2.getString(3) == "\"a")
    assert(r2.getString(4) == "b\"")
  }

  test("sniffedLines decodes extension-less gzip by magic bytes (S4)") {
    // c2 is gzip with no extension; lines() would read raw gzip bytes
    val sniffed = Readers.sniffedLines(spark, "/root/repo/fixtures/sniff/c2")
      .select("value").collect().map(_.getString(0))
    assert(sniffed.length == 3)
    assert(sniffed.forall(_.startsWith("{"))) // real JSON text, not mojibake
    // extension-ed control file: sniffedLines agrees with the text source
    val viaText = Readers.lines(spark, "/root/repo/fixtures/sniff/c3.json.gz")
      .select("value").collect().map(_.getString(0)).toSeq
    val viaSniff = Readers.sniffedLines(spark, "/root/repo/fixtures/sniff/c3.json.gz")
      .select("value").collect().map(_.getString(0)).toSeq
    assert(viaSniff == viaText)
  }

  test("corrupt gzip yields zero rows, not a crashed job (S4)") {
    val dir = Files.createTempDirectory("graft-badgz").toFile
    // gzip magic followed by garbage: sniffed as gzip, fails to inflate
    Files.write(new java.io.File(dir, "bad").toPath,
      Array[Byte](0x1f, 0x8b.toByte, 9, 9, 9, 9, 9, 9))
    val rows = Readers.sniffedLines(spark, dir.getAbsolutePath + "/bad").collect()
    assert(rows.isEmpty)
  }

  test("bucket-relative key strips the root and the file scheme (P1)") {
    val dir = Files.createTempDirectory("graft-key").toFile
    val sub = new java.io.File(dir, "cv/prov/bsm/2020"); sub.mkdirs()
    Files.writeString(new java.io.File(sub, "f.json").toPath, "{}\n")
    val key = Readers.lines(spark, dir.getAbsolutePath + "/cv/*/*/*/*.json")
      .select(Metadata.keyColumn(col("file"), dir.getAbsolutePath).as("k"))
      .head().getString(0)
    assert(key == "cv/prov/bsm/2020/f.json")
  }
}
