package graft.sinks

import java.net.URL
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/**
 * AWS Signature Version 4 request signing (the public, documented
 * algorithm: canonical request → string-to-sign → HMAC-SHA256 key chain),
 * pure JDK crypto — the production [[Http.HeaderProvider]] completing K1
 * parity with the reference's SigV4-authed Elasticsearch client
 * (common/elasticsearch_client.py:10-32, which delegates to
 * aws_requests_auth's identical computation).
 *
 * Produces `x-amz-date`, optional `x-amz-security-token`, and the
 * `Authorization` header
 * `AWS4-HMAC-SHA256 Credential=<key>/<scope>, SignedHeaders=…, Signature=…`
 * over the signed headers (content-type;host;x-amz-date[;token]).
 *
 * `clock` is injectable so tests pin the timestamp and the whole
 * signature is deterministic. Serializable: ships to executors inside
 * the sinks' foreachPartition closures.
 *
 * @param service e.g. "es" for Elasticsearch, "monitoring" for CloudWatch
 */
final case class SigV4Signer(
    accessKey: String,
    secretKey: String,
    region: String,
    service: String,
    sessionToken: Option[String] = None,
    clock: () => Instant = () => Instant.now())
  extends ((String, String, String) => Map[String, String]) with Serializable {

  def apply(method: String, url: String, body: String): Map[String, String] = {
    import SigV4Signer.amzFmt
    val u = new URL(url)
    val host =
      if (u.getPort == -1 || u.getPort == u.getDefaultPort) u.getHost
      else s"${u.getHost}:${u.getPort}"
    val amzDate = amzFmt.format(clock())
    val date = amzDate.take(8)
    val path = if (u.getPath.isEmpty) "/" else u.getPath
    val query = canonicalQuery(Option(u.getQuery))

    // the content type must match what Http.post actually sends; the
    // sinks pass ndjson/json bodies — signed as part of the headers
    val contentType =
      if (path.endsWith("/_bulk")) "application/x-ndjson" else "application/json"
    val baseHeaders = Seq(
      "content-type" -> contentType,
      "host" -> host,
      "x-amz-date" -> amzDate) ++
      sessionToken.map("x-amz-security-token" -> _)
    val sortedHeaders = baseHeaders.sortBy(_._1)
    val signedHeaderNames = sortedHeaders.map(_._1).mkString(";")

    val canonicalRequest = Seq(
      method.toUpperCase,
      uriEncodePath(path),
      query,
      sortedHeaders.map { case (k, v) => s"$k:${v.trim}\n" }.mkString,
      signedHeaderNames,
      hexSha256(body.getBytes(UTF_8))).mkString("\n")

    val scope = s"$date/$region/$service/aws4_request"
    val stringToSign = Seq(
      "AWS4-HMAC-SHA256", amzDate, scope,
      hexSha256(canonicalRequest.getBytes(UTF_8))).mkString("\n")

    val kSigning =
      hmac(hmac(hmac(hmac(s"AWS4$secretKey".getBytes(UTF_8),
        date), region), service), "aws4_request")
    val signature = hex(hmac(kSigning, stringToSign))

    Map(
      "x-amz-date" -> amzDate,
      "Authorization" ->
        (s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
          s"SignedHeaders=$signedHeaderNames, Signature=$signature")) ++
      sessionToken.map("x-amz-security-token" -> _)
  }

  /** Query params sorted by name then value, RFC-3986 encoded. */
  private def canonicalQuery(q: Option[String]): String =
    q.filter(_.nonEmpty).fold("") { qs =>
      qs.split('&').toSeq
        .map { kv =>
          val i = kv.indexOf('=')
          if (i == -1) (kv, "") else (kv.take(i), kv.drop(i + 1))
        }
        .map { case (k, v) => (uriEncode(k), uriEncode(v)) }
        .sorted
        .map { case (k, v) => s"$k=$v" }
        .mkString("&")
    }

  /** RFC 3986 unreserved-set percent-encoding (SigV4's rule). */
  private def uriEncode(s: String): String =
    s.getBytes(UTF_8).flatMap { b =>
      val c = b.toChar
      if (b >= 0 && (c.isLetterOrDigit || "-._~".contains(c))) c.toString
      else f"%%${b & 0xff}%02X"
    }.mkString

  /** Path segments encoded, '/' separators preserved. */
  private def uriEncodePath(p: String): String =
    p.split("/", -1).map(uriEncode).mkString("/")

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  private def hexSha256(bytes: Array[Byte]): String =
    hex(MessageDigest.getInstance("SHA-256").digest(bytes))

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString
}

object SigV4Signer {
  // object-held: DateTimeFormatter is not Serializable, and the signer
  // ships to executors inside foreachPartition closures
  private val amzFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(ZoneOffset.UTC)
}
