package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 line source: content-sniffed gzip, per-file line
  * numbers, and pruning pushed into the scan. */
class LineFileSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-dsv2")
    Files.write(d.resolve("plain.txt"),
      "alpha\nbeta\n\ngamma\n".getBytes("UTF-8"))
    // gzipped WITHOUT a .gz extension — only the magic bytes say so
    val gz = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.GZIPOutputStream(gz)
    out.write("one\ntwo\n".getBytes("UTF-8")); out.close()
    Files.write(d.resolve("sneaky"), gz.toByteArray)
    d.toString
  }

  private def read() =
    spark.read.format("graft.sources.LineFileSource").load(s"$dir/*")

  test("reads plain and extension-less gzip files with 1-based line numbers") {
    val rows = read().collect()
      .map(r => (r.getString(1).split('/').last, r.getLong(3), r.getString(0)))
      .toSet
    assert(rows == Set(
      ("plain.txt", 1L, "alpha"), ("plain.txt", 2L, "beta"),
      ("plain.txt", 3L, ""), ("plain.txt", 4L, "gamma"),
      ("sneaky", 1L, "one"), ("sneaky", 2L, "two")))
  }

  test("file_size is the on-disk (compressed) length, one partition per file") {
    val sizes = read().select("file", "file_size").distinct().collect()
      .map(r => r.getString(0).split('/').last -> r.getLong(1)).toMap
    assert(sizes("plain.txt") == 18L)
    assert(sizes("sneaky") > 0L && sizes("sneaky") != 8L) // compressed length
    assert(read().rdd.getNumPartitions == 2)
  }

  test("column pruning reaches the scan: select(value) reads a 1-column schema") {
    val leaf = read().select("value").queryExecution.executedPlan
      .collectLeaves().head
    assert(leaf.output.map(_.name) == Seq("value"))
    assert(leaf.toString.contains("value") && !leaf.toString.contains("line_no"))
  }

  test("agrees with the sniffing reader on the committed sniff fixtures") {
    val viaSource = read()
    assert(viaSource.count() == 6)
    val fix = spark.read.format("graft.sources.LineFileSource")
      .load("/root/repo/fixtures/sniff/*")
      .filter(length(trim(col("value"))) > 0)
      .groupBy(col("file")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0).split('/').last -> r.getLong(1)).toMap
    val expected = graft.ingest.Readers.sniffedLines(spark, "/root/repo/fixtures/sniff/*")
      .groupBy(col("file")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0).split('/').last -> r.getLong(1)).toMap
    assert(fix == expected && fix.nonEmpty)
  }
}
