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

  test("overwrite truly truncates: a fewer-partition rewrite leaves no stale parts") {
    val dir = Files.createTempDirectory("graft-jsondoc-trunc").toString
    spark.range(0, 40, 1, 8).select(col("id"), lit("old").as("tag"))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".jsonl")) == 8)
    // rewrite with 2 partitions: part-00002..part-00007 from the first
    // write must be GONE, not silently mixed into the new output
    spark.range(100, 104, 1, 2).select(col("id"), lit("new").as("tag"))
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".jsonl"))
    assert(files.length == 2, s"stale parts survived: ${files.map(_.getName).sorted.mkString(",")}")
    val back = spark.read.json(files.map(_.getPath): _*)
    assert(back.select("id").as[Long].collect().toSet == Set(100L, 101L, 102L, 103L))
    assert(back.select("tag").as[String].collect().toSet == Set("new"))
  }

  test("non-finite doubles serialize as JSON null, keeping every line parseable") {
    val dir = Files.createTempDirectory("graft-jsondoc-nan").toString
    Seq((1L, 1.5), (2L, Double.NaN), (3L, Double.PositiveInfinity),
        (4L, Double.NegativeInfinity))
      .toDF("id", "score")
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".jsonl"))
    val lines = files.flatMap(f =>
      scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq)
    assert(lines.length == 4)
    assert(!lines.exists(l => l.contains("NaN") || l.contains("Infinity")),
      s"bare non-finite tokens in: ${lines.mkString(" | ")}")
    // strict-mode JSON reader (FAILFAST) must accept every line
    val back = spark.read.option("mode", "FAILFAST").json(files.map(_.getPath): _*)
    assert(back.filter(col("score").isNull).count() == 3)
    assert(back.filter(col("score") === 1.5).count() == 1)
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

  test("foreachBatch + per-batch directories: a stream restart never double-writes") {
    // The streaming face of the sink: each micro-batch commits atomically
    // into its own batchId-keyed directory, so a replayed batch (restart
    // after checkpoint, before sink durability) OVERWRITES its own output
    // instead of appending a duplicate - idempotence from (atomic commit
    // x deterministic directory naming).
    import org.apache.spark.sql.streaming.Trigger
    val src = Files.createTempDirectory("graft-jd-src")
    val out = Files.createTempDirectory("graft-jd-out").toString
    val ckpt = Files.createTempDirectory("graft-jd-ckpt").toString
    spark.range(0, 5).select(col("id"), lit("a").as("tag"))
      .write.parquet(src.resolve("b0").toString)
    val schema = spark.read.parquet(src.resolve("b0").toString).schema

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(s"$src/*")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          batch.write.format(fmt).option("path", s"$out/batch=$batchId")
            .mode("overwrite").save()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    // restart with NEW data: old batch must not be rewritten or duplicated
    spark.range(100, 103).select(col("id"), lit("b").as("tag"))
      .write.parquet(src.resolve("b1").toString)
    runOnce()

    val all = spark.read.json(s"$out/batch=*/part-*.jsonl")
    assert(all.count() == 8)
    assert(all.select("id").as[Long].collect().toSet ==
      (0L until 5L).toSet ++ Set(100L, 101L, 102L))
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
