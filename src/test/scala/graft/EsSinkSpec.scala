package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.config.SuiteLoader
import graft.ingest.{Metadata, Readers}
import graft.pipeline.{OdeSchema, ValidationPipeline}
import graft.sinks.ElasticsearchSink

/** K1/K2 final hop: the Elasticsearch-shaped HTTP bulk sink, exercised
  * end-to-end against an in-process HTTP stub (reference
  * `bucket_event_lambda_handler.py:91-103` indexes one metadata doc per
  * file event; the sink upgrades it with deterministic `_id`s so replays
  * overwrite instead of duplicate). */
class EsSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** In-process ES `_bulk` stub: records every (id → doc) it receives. */
  private final class Stub {
    val docs = new java.util.concurrent.ConcurrentHashMap[String, java.util.List[String]]()
    @volatile var requests = 0
    val authHeaders = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    private val server =
      com.sun.net.httpserver.HttpServer.create(new java.net.InetSocketAddress(0), 0)
    server.createContext("/_bulk", (exchange: com.sun.net.httpserver.HttpExchange) => {
      val body = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
      requests += 1
      Option(exchange.getRequestHeaders.getFirst("Authorization"))
        .foreach(authHeaders.add)
      body.split("\n").filter(_.nonEmpty).grouped(2).foreach { pair =>
        val Array(action, doc) = pair
        val id = "\"_id\":\"([^\"]*)\"".r.findFirstMatchIn(action)
          .getOrElse(fail(s"action line without _id: $action")).group(1)
        docs.computeIfAbsent(id,
          _ => java.util.Collections.synchronizedList(new java.util.ArrayList[String]()))
          .add(doc)
        assert(action.contains("\"_index\":\""), s"malformed action: $action")
      }
      val resp = "{\"errors\":false}".getBytes("UTF-8")
      exchange.getResponseHeaders.add("Content-Type", "application/json")
      exchange.sendResponseHeaders(200, resp.length.toLong)
      exchange.getResponseBody.write(resp)
      exchange.close()
    })
    server.start()
    def endpoint: String = s"http://localhost:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("metadata docs bulk-index with deterministic path ids and full doc shape (K1)") {
    val stub = new Stub
    try {
      val records = Readers.lines(spark, "/root/repo/fixtures/route/*/*/*/*/*.json")
      val meta = Metadata.fileMetadata(records, "/root/repo/fixtures/route", "test-env")
      ElasticsearchSink.writeBulk(meta, stub.endpoint, "metadata", "graft-bucket", "key")

      val expectedKeys = meta.select("key").collect().map(_.getString(0)).toSet
      assert(stub.docs.keySet().size == expectedKeys.size)
      import scala.jdk.CollectionConverters._
      assert(stub.docs.keySet().asScala == expectedKeys)
      // doc bodies carry the reference metadata fields
      val aDoc = stub.docs.values().asScala.head.get(0)
      for (field <- Seq("key", "ContentLength", "SizeMiB", "LastModified",
          "ETag", "Environment", "MessageCount"))
        assert(aDoc.contains(s""""$field":"""), s"doc missing $field: $aDoc")
    } finally stub.stop()
  }

  test("SigV4 signer installs on the bulk hop: every request carries the signed headers (K1)") {
    val stub = new Stub
    try {
      val records = Readers.lines(spark, "/root/repo/fixtures/route/*/*/*/*/*.json")
      val meta = Metadata.fileMetadata(records, "/root/repo/fixtures/route", "test-env")
      val sign = graft.sinks.SigV4Signer(
        "AKIDEXAMPLE", "secret", "us-east-1", "es",
        clock = () => java.time.Instant.parse("2019-05-14T19:05:47Z"))
      ElasticsearchSink.writeBulk(meta, stub.endpoint, "metadata", "graft-bucket",
        "key", sign = sign)
      import scala.jdk.CollectionConverters._
      val auths = stub.authHeaders.asScala.toSeq
      assert(auths.nonEmpty && auths.size == stub.requests,
        s"${auths.size} Authorization headers for ${stub.requests} requests")
      val re = ("^AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20190514/us-east-1/es/aws4_request, " +
        "SignedHeaders=content-type;host;x-amz-date, Signature=[0-9a-f]{64}$").r
      auths.foreach(a => assert(re.findFirstIn(a).isDefined, s"unexpected Authorization: $a"))
    } finally stub.stop()
  }

  test("re-indexing the same batch reuses the same ids — replays overwrite, not duplicate") {
    val stub = new Stub
    try {
      val records = Readers.lines(spark, "/root/repo/fixtures/route/*/*/*/*/*.json")
      val meta = Metadata.fileMetadata(records, "/root/repo/fixtures/route", "test-env")
      ElasticsearchSink.writeBulk(meta, stub.endpoint, "metadata", "graft-bucket", "key")
      val idsAfterFirst = new java.util.HashSet(stub.docs.keySet())
      ElasticsearchSink.writeBulk(meta, stub.endpoint, "metadata", "graft-bucket", "key")
      // same id set: in a real ES the second pass overwrites doc-for-doc
      assert(stub.docs.keySet() == idsAfterFirst)
      import scala.jdk.CollectionConverters._
      stub.docs.asScala.foreach { case (id, bodies) =>
        assert(bodies.size == 2, s"id $id indexed ${bodies.size}x")
        assert(bodies.get(0) == bodies.get(1), s"replay changed doc $id")
      }
    } finally stub.stop()
  }

  test("kill-and-restart mid-stream: idempotent sink keys give exactly-once file_totals") {
    val stub = new Stub
    val suite = SuiteLoader.fromFile("/root/repo/fixtures/odejson/suite.ini")
    val glob = "/root/repo/fixtures/odejson/data/*.json*"
    val tmp = Files.createTempDirectory("graft-es-eo").toFile.getAbsolutePath
    try {
      def startStream() = {
        val lines = spark.readStream
          .option("maxFilesPerTrigger", "1") // many small batches → a stop lands mid-stream
          .text(glob)
          .select(col("value"), col("_metadata.file_path").as("file"),
            col("_metadata.file_size").as("file_size"),
            col("_metadata.file_modification_time").as("file_modification_time"))
          .filter(length(trim(col("value"))) > 0)
        Readers.parseNdjsonLines(lines, OdeSchema.record).writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$tmp/ckpt")
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            val result = ValidationPipeline.run(
              ValidationPipeline.validateRecords(batch, suite), suite)
            ElasticsearchSink.writeBulk(result.fileTotals, stub.endpoint,
              "file_totals", "totals", "file")
          }
          .start()
      }
      // first run: kill as soon as at least one micro-batch committed
      val q1 = startStream()
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (q1.recentProgress.isEmpty && q1.isActive && System.nanoTime() < deadline)
        Thread.sleep(50)
      q1.stop()
      q1.awaitTermination()
      // second run: same checkpoint, runs the backlog to completion
      val q2 = startStream()
      q2.awaitTermination()

      import scala.jdk.CollectionConverters._
      // file-source URIs render as file:/… in batch and file:///… in
      // streaming _metadata — normalize before comparing key sets
      def norm(s: String): String = s.replaceFirst("^file:/*", "/")
      val expectedFiles = Readers.lines(spark, glob)
        .select("file").distinct().collect().map(r => norm(r.getString(0))).toSet
      // exactly one LOGICAL doc per file, whatever got replayed physically:
      // every replay reused the same _id with the same body
      assert(stub.docs.keySet().asScala.map(norm) == expectedFiles)
      stub.docs.asScala.foreach { case (id, bodies) =>
        assert(bodies.asScala.toSet.size == 1, s"replay changed doc $id")
      }
    } finally stub.stop()
  }
}
