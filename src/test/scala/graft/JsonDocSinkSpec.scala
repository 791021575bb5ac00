package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * DSV2 write path ([[graft.sources.JsonDocSink]]): round-trip fidelity
 * and the two-phase commit contract — a failed job must leave NO
 * partial output.
 */
class JsonDocSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fmt = "graft.sources.JsonDocSink"

  test("rows round-trip as one JSON document per line, with _SUCCESS") {
    val dir = Files.createTempDirectory("graft-jsondoc").toString
    val df = Seq(
      (1L, "plain", 1.5, true),
      (2L, "quote\" and \\ and\nnewline", -0.25, false),
      (3L, null.asInstanceOf[String], 0.0, true))
      .toDF("id", "name", "score", "flag")
    df.write.format(fmt).option("path", dir).mode("overwrite").save()

    assert(new java.io.File(dir, "_SUCCESS").exists())
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".jsonl"))
    assert(files.nonEmpty && files.forall(_.getName.startsWith("part-")))
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith("_staged")))

    val back = spark.read.json(files.map(_.getPath): _*)
      .select("id", "name", "score", "flag")
      .collect().map(_.toString).sorted.toSeq
    val expected = df.collect().map(_.toString).sorted.toSeq
    assert(back == expected)
  }

  test("a poisoned job aborts atomically: no partial or staged output remains") {
    val dir = Files.createTempDirectory("graft-jsondoc-abort").toString
    val poison = udf((i: Long) =>
      if (i == 7L) throw new RuntimeException("poison row") else i)
    val df = spark.range(0, 10, 1, 2)
      .select(poison(col("id")).as("id"), lit("x").as("name"))
    intercept[Exception] {
      df.write.format(fmt).option("path", dir).mode("overwrite").save()
    }
    val leftover = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    assert(!leftover.exists(_.getName.endsWith(".jsonl")),
      s"committed files after failed job: ${leftover.map(_.getName).mkString(",")}")
    assert(!leftover.exists(_.getName == "_SUCCESS"))
    assert(!leftover.exists(_.getName.startsWith("_staged")),
      s"staged leftovers: ${leftover.map(_.getName).mkString(",")}")
  }

  test("the metadata-document pipeline writes through the sink end-to-end") {
    val dir = Files.createTempDirectory("graft-jsondoc-meta").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .limit(20)
    docs.write.format(fmt).option("path", dir).mode("overwrite").save()
    val back = spark.read.json(
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".jsonl"))
        .map(_.getPath): _*)
    assert(back.count() == 20)
    assert(back.columns.sorted.toSeq == Seq("doc_id", "lang", "n_chars", "source"))
  }
}
