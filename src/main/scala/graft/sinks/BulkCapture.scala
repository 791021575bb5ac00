package graft.sinks

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/**
 * In-process Elasticsearch-shaped `_bulk` CAPTURE endpoint — the
 * local stand-in for the remote ES cluster in gate queries and specs
 * (this sandbox has zero egress, and the reference's own tests stub
 * the ES client the same way). Everything up to the wire is the REAL
 * production path: [[ElasticsearchSink.writeBulk]] builds codegen'd
 * doc JSON, chunks per partition, POSTs NDJSON `_bulk` bodies over
 * HTTP (optionally SigV4-signed) — only the server answering the
 * socket is this capture.
 *
 * Captured state is (doc `_id` → last doc body), i.e. exactly the
 * effectively-once semantics a real ES index gives deterministic ids:
 * replays/retries overwrite. Bounded driver state: one entry per doc
 * id (per-file metadata docs — file-count-sized, never row-sized).
 */
final class BulkCapture {
  private val lastDoc = new ConcurrentHashMap[String, String]()
  @volatile private var nRequests = 0

  // explicit IPv4 loopback on BOTH ends (r16): binding the wildcard and
  // advertising "localhost" let the client resolve ::1 first, and a
  // blackholed IPv6 loopback turns one POST into a full 10 s connect
  // timeout - the intermittent +10 s stall the streaming-ES bench row
  // showed (spread 14.5 s across otherwise-identical runs)
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/_bulk", (exchange: HttpExchange) => {
    val body = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
    nRequests += 1
    body.split("\n").filter(_.nonEmpty).grouped(2).foreach {
      case Array(action, doc) =>
        "\"_id\":\"([^\"]*)\"".r.findFirstMatchIn(action)
          .foreach(m => lastDoc.put(m.group(1), doc))
      case _ =>
    }
    val resp = "{\"errors\":false}".getBytes("UTF-8")
    exchange.getResponseHeaders.add("Content-Type", "application/json")
    exchange.sendResponseHeaders(200, resp.length.toLong)
    exchange.getResponseBody.write(resp)
    exchange.close()
  })
  server.start()

  def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def requests: Int = nRequests
  /** Snapshot of (doc id → last indexed doc body). */
  def docs: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    lastDoc.asScala.toMap
  }
  def stop(): Unit = server.stop(0)
}

/**
 * Raw-body HTTP capture — the CloudWatch-side analogue of
 * [[BulkCapture]]: records every POSTed request body verbatim (the
 * PutMetricData-shaped JSON of [[CloudWatchSink.putMetricData]]), so a
 * gate query can assert on WHAT THE METRICS ENDPOINT RECEIVED. Datums
 * are additive per (namespace, metric, dims) — exactly CloudWatch's own
 * aggregation semantics — so capture order is irrelevant. Bounded: one
 * string per HTTP request (≤ ceil(datums/chunk) per batch).
 */
final class HttpCapture {
  private val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val lastByKey = new ConcurrentHashMap[String, String]()
  private val keyRe = "\"BatchKey\":\"([^\"]*)\"".r
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (exchange: HttpExchange) => {
    val body = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
    received.add(body)
    keyRe.findFirstMatchIn(body).foreach(m => lastByKey.put(m.group(1), body))
    val resp = "{}".getBytes("UTF-8")
    exchange.getResponseHeaders.add("Content-Type", "application/json")
    exchange.sendResponseHeaders(200, resp.length.toLong)
    exchange.getResponseBody.write(resp)
    exchange.close()
  })
  server.start()

  def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  /** Every body as POSTed, replays included (raw wire view). */
  def bodies: Seq[String] = {
    import scala.jdk.CollectionConverters._
    received.iterator().asScala.toSeq
  }
  /** The idempotent receiver's view: bodies carrying a `BatchKey`
    * idempotency token ([[CloudWatchSink.putMetricDataIdempotent]])
    * dedup last-write-wins per key — a replayed batch's byte-identical
    * re-sends collapse, exactly as a keyed proxy/agent in front of
    * CloudWatch would treat them. Unkeyed bodies pass through verbatim. */
  def effectiveBodies: Seq[String] = {
    import scala.jdk.CollectionConverters._
    bodies.filterNot(b => keyRe.findFirstIn(b).isDefined) ++
      lastByKey.values.asScala.toSeq
  }
  def stop(): Unit = server.stop(0)
}
