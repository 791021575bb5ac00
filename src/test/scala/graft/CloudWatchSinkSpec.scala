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
