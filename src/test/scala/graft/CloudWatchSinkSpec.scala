package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.aggregate.FileAggregates
import graft.ingest.{Metadata, Readers}
import graft.sinks.CloudWatchSink

/** K2 final hop: the CloudWatch-shaped PutMetricData emitter against an
  * in-process HTTP stub. The datum VALUES are already oracle-checked by
  * q_metric_datums; this pins the wire shape, batching, and determinism
  * of the hop itself. */
class CloudWatchSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private final class Stub {
    val bodies = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val authHeaders = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    private val server =
      com.sun.net.httpserver.HttpServer.create(new java.net.InetSocketAddress(0), 0)
    server.createContext("/", (exchange: com.sun.net.httpserver.HttpExchange) => {
      bodies.add(new String(exchange.getRequestBody.readAllBytes(), "UTF-8"))
      Option(exchange.getRequestHeaders.getFirst("Authorization"))
        .foreach(authHeaders.add)
      val resp = "{}".getBytes("UTF-8")
      exchange.sendResponseHeaders(200, resp.length.toLong)
      exchange.getResponseBody.write(resp)
      exchange.close()
    })
    server.start()
    def endpoint: String = s"http://localhost:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  private def datums = {
    val records = Readers.lines(spark, "/root/repo/fixtures/route/*/*/*/*/*.json")
    FileAggregates.metricDatums(
      Metadata.fileMetadata(records, "/root/repo/fixtures/route", "test-env"))
  }

  test("datums POST in PutMetricData shape with the reference namespaces (K2)") {
    val stub = new Stub
    try {
      CloudWatchSink.putMetricData(datums, stub.endpoint)
      import scala.jdk.CollectionConverters._
      val bodies = stub.bodies.asScala.toSeq
      assert(bodies.nonEmpty)
      bodies.foreach { b =>
        assert(b.startsWith("""{"Namespace":"""), s"malformed body: $b")
        assert(b.contains(""""MetricData":["""), s"malformed body: $b")
        assert(b.contains(""""MetricName":"""), s"empty MetricData: $b")
      }
      val all = bodies.mkString("\n")
      // the reference's three families that the route fixtures exercise
      // (no 166-byte file -> no zero-byte namespace)
      for (ns <- Seq("dot-sdc-waze-submissions-bucket-metric",
          "dot-sdc-cv-submissions-bucket-metric",
          "dot-sdc-waze-curated-bucket-metric"))
        assert(all.contains(s""""Namespace":"$ns""""), s"missing namespace $ns")
      assert(!all.contains("zero-byte"), "no 166-byte fixture should emit the sentinel family")
      // the waze family datum carries the path-derived dimensions
      assert(all.contains(""""Name":"State","Value":"CO""""))
      assert(all.contains(""""Name":"TrafficType","Value":"alerts""""))
      // the cv family carries the reference's hardcoded Value=10 quirk
      assert(all.contains(""""Value":10,"Unit":"Count""""))
    } finally stub.stop()
  }

  test("SigV4 signer installs on PutMetricData posts: signed headers on every request") {
    val stub = new Stub
    try {
      val sign = graft.sinks.SigV4Signer(
        "AKIDEXAMPLE", "secret", "us-east-1", "monitoring",
        clock = () => java.time.Instant.parse("2019-05-14T19:05:47Z"))
      CloudWatchSink.putMetricData(datums, stub.endpoint, sign = sign)
      import scala.jdk.CollectionConverters._
      val auths = stub.authHeaders.asScala.toSeq
      assert(auths.nonEmpty && auths.size == stub.bodies.size,
        s"${auths.size} Authorization headers for ${stub.bodies.size} requests")
      val re = ("^AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20190514/us-east-1/monitoring/aws4_request, " +
        "SignedHeaders=content-type;host;x-amz-date, Signature=[0-9a-f]{64}$").r
      auths.foreach(a => assert(re.findFirstIn(a).isDefined, s"unexpected Authorization: $a"))
    } finally stub.stop()
  }

  /** Sum the endpoint's effective datum view per (namespace, metric,
    * dims) — CloudWatch's own additive aggregation. */
  private def endpointTotals(bodies: Seq[String]): Map[String, Double] = {
    if (bodies.isEmpty) return Map.empty
    import org.apache.spark.sql.functions._
    val df = spark.createDataset(bodies)(org.apache.spark.sql.Encoders.STRING)
    spark.read.json(df)
      .select(col("Namespace").as("ns"), explode(col("MetricData")).as("d"))
      .select(concat_ws("|", col("ns"), col("d.MetricName"),
          col("d.Dimensions")(0)("Name"), col("d.Dimensions")(0)("Value"),
          col("d.Dimensions")(1)("Name"), col("d.Dimensions")(1)("Value")).as("k"),
        col("d.Value").cast("double").as("v"))
      .groupBy("k").agg(sum("v").as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("idempotent sink: a fully-posted batch (ledger marker) replays to ZERO requests") {
    val capture = new graft.sinks.HttpCapture
    val ledger = java.nio.file.Files.createTempDirectory("graft-cw-ledger-")
    try {
      CloudWatchSink.putMetricDataIdempotent(datums, "42", capture.endpoint, ledger.toString)
      val after1 = capture.bodies.size
      assert(after1 > 0, "vacuous: first post sent nothing")
      CloudWatchSink.putMetricDataIdempotent(datums, "42", capture.endpoint, ledger.toString)
      assert(capture.bodies.size == after1,
        "a batch whose ledger marker exists must not re-POST")
      // a DIFFERENT batch key posts normally
      CloudWatchSink.putMetricDataIdempotent(datums, "43", capture.endpoint, ledger.toString)
      assert(capture.bodies.size == 2 * after1)
    } finally { capture.stop(); graft.util.Fs.deleteRecursively(ledger) }
  }

  test("idempotent sink: an UNLEDGERED replay (crash between POST and marker) " +
      "is absorbed by BatchKey dedup — effective totals equal one-shot") {
    val capture = new graft.sinks.HttpCapture
    val ledger = java.nio.file.Files.createTempDirectory("graft-cw-ledger-")
    try {
      CloudWatchSink.putMetricDataIdempotent(datums, "7", capture.endpoint, ledger.toString)
      val oneShot = endpointTotals(capture.effectiveBodies)
      val rawAfter1 = capture.bodies.size
      // simulate the crash window: marker gone, checkpoint not committed
      java.nio.file.Files.delete(ledger.resolve("posted-7"))
      CloudWatchSink.putMetricDataIdempotent(datums, "7", capture.endpoint, ledger.toString)
      assert(capture.bodies.size == 2 * rawAfter1,
        "vacuous: the replay should have actually re-POSTed")
      assert(endpointTotals(capture.effectiveBodies) == oneShot,
        "BatchKey dedup must collapse the replay to one-shot totals")
    } finally { capture.stop(); graft.util.Fs.deleteRecursively(ledger) }
  }

  test("KILL-AND-RESTART replay: a streamed batch re-delivered from the " +
      "checkpoint does not double-count endpoint totals (r14 verdict item 1)") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft-cw-restart-")
    val capture = new graft.sinks.HttpCapture
    try {
      val meta = spark.range(0, 300).select(
        when(pmod(col("id"), lit(3)) === 0, lit("waze"))
          .when(pmod(col("id"), lit(3)) === 1, lit("cv"))
          .otherwise(lit("manifest")).as("Dataset"),
        concat(lit("S"), pmod(col("id"), lit(4))).as("State"),
        when(pmod(col("id"), lit(2)) === 0, lit("alerts")).otherwise(lit("jams")).as("TrafficType"),
        lit("t1").as("TableName"),
        concat(lit("p"), pmod(col("id"), lit(2))).as("DataProvider"),
        lit("bsm").as("DataType"),
        when(pmod(col("id"), lit(5)) === 0, lit(166L)).otherwise(lit(500L)).as("ContentLength"),
        pmod(col("id"), lit(10)).as("MessageCount"))
      val oneShot = {
        val cap = new graft.sinks.HttpCapture
        try {
          CloudWatchSink.putMetricData(FileAggregates.metricDatums(meta), cap.endpoint)
          endpointTotals(cap.effectiveBodies)
        } finally cap.stop()
      }
      val chunkDir = s"$root/chunks"
      meta.repartition(3).write.parquet(chunkDir)
      val ledger = s"$root/ledger"
      def runStream(): Unit = {
        val q = spark.readStream.schema(meta.schema)
          .option("maxFilesPerTrigger", 1).parquet(chunkDir)
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            CloudWatchSink.putMetricDataIdempotent(
              FileAggregates.metricDatums(batch), batchId.toString,
              capture.endpoint, ledger)
          }
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      runStream()
      val rawAfterFirst = capture.bodies.size
      assert(endpointTotals(capture.effectiveBodies) == oneShot,
        "pre-replay sanity: streamed totals must already equal one-shot")
      // kill-and-restart simulation: the crash happened AFTER the last
      // batch's POSTs but BEFORE (a) its ledger marker rename and
      // (b) the checkpoint commit — the worst at-least-once window.
      // Delete the highest commit file so restart re-delivers the batch,
      // and its ledger marker so the sink actually re-POSTs.
      val commits = new java.io.File(s"$root/ckpt/commits")
        .listFiles().filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
      assert(commits.length >= 3, s"expected >=3 committed batches, got ${commits.length}")
      val lastBatch = commits.last.getName.toLong
      assert(commits.last.delete())
      // the local ChecksumFs leaves a .N.crc sidecar that would block
      // the re-commit's rename — a test-FS artifact, not a sink concern
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$root/ckpt/commits/.$lastBatch.crc"))
      java.nio.file.Files.delete(java.nio.file.Paths.get(ledger, s"posted-$lastBatch"))
      runStream()
      assert(capture.bodies.size > rawAfterFirst,
        "vacuous: the restart should have replayed and re-POSTed the last batch")
      assert(endpointTotals(capture.effectiveBodies) == oneShot,
        "replayed batch must not double-count: effective endpoint totals " +
          "must still equal the one-shot oracle")
    } finally { capture.stop(); graft.util.Fs.deleteRecursively(root) }
  }

  test("replays send byte-identical bodies; chunkSize bounds datums per request") {
    val stub = new Stub
    try {
      CloudWatchSink.putMetricData(datums, stub.endpoint, chunkSize = 1)
      import scala.jdk.CollectionConverters._
      val first = stub.bodies.asScala.toSeq.sorted
      // chunkSize=1: exactly one datum per request
      first.foreach(b => assert("\"MetricName\"".r.findAllIn(b).length == 1))
      assert(first.size == datums.count())
      stub.bodies.clear()
      CloudWatchSink.putMetricData(datums, stub.endpoint, chunkSize = 1)
      val second = stub.bodies.asScala.toSeq.sorted
      assert(first == second, "replay must be deterministic")
    } finally stub.stop()
  }
}
