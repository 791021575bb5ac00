package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.SuiteLoader
import graft.pipeline.ValidationPipeline
import graft.streaming.StreamingPipeline

/** §2.8: the AvailableNow streaming run must produce the same per-file
  * outputs as the batch pipeline over the same files. */
class StreamingPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming AvailableNow equals batch (totals + sequential + histogram)") {
    val suite = SuiteLoader.fromFile("/root/repo/fixtures/odejson/suite.ini")
    val glob = "/root/repo/fixtures/odejson/data/*.json*"
    val tmp = Files.createTempDirectory("graft-stream").toFile.getAbsolutePath

    StreamingPipeline.runAvailableNow(spark, glob, suite,
      s"$tmp/out", s"$tmp/ckpt")

    val batch = ValidationPipeline.runJson(spark, glob, suite)
    def norm(df: org.apache.spark.sql.DataFrame, cols: String*) =
      df.select(element_at(split(col("file"), "/"), -1).as("f"),
        struct(cols.map(col): _*).as("r"))
        .collect().map(r => r.toString).sorted.toSeq

    val streamTotals = spark.read.parquet(s"$tmp/out/file_totals")
    assert(norm(streamTotals, "num_messages_total", "num_validations", "num_errors",
      "num_error_messages", "num_valid") ==
      norm(batch.fileTotals, "num_messages_total", "num_validations", "num_errors",
        "num_error_messages", "num_valid"))

    val streamSeq = spark.read.parquet(s"$tmp/out/sequential")
    assert(norm(streamSeq, "field_path", "valid", "details") ==
      norm(batch.sequential, "field_path", "valid", "details"))

    val streamHist = spark.read.parquet(s"$tmp/out/error_histogram")
    assert(norm(streamHist, "error_message", "occurrences") ==
      norm(batch.errorHistogram, "error_message", "occurrences"))
  }

  test("restart with an existing checkpoint reprocesses nothing") {
    val suite = SuiteLoader.fromFile("/root/repo/fixtures/odejson/suite.ini")
    val glob = "/root/repo/fixtures/odejson/data/*.json*"
    val tmp = Files.createTempDirectory("graft-stream2").toFile.getAbsolutePath

    StreamingPipeline.runAvailableNow(spark, glob, suite, s"$tmp/out", s"$tmp/ckpt")
    val n1 = spark.read.parquet(s"$tmp/out/file_totals").count()
    // second run: checkpoint already covers every input file
    StreamingPipeline.runAvailableNow(spark, glob, suite, s"$tmp/out", s"$tmp/ckpt")
    val n2 = spark.read.parquet(s"$tmp/out/file_totals").count()
    assert(n1 == 4 && n2 == 4)
  }
}
