package graft

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.SigV4Signer

/** K1 parity: the SigV4 header provider (reference
  * common/elasticsearch_client.py:10-32 signs via aws_requests_auth).
  * Pinned clock ⇒ the whole signature is deterministic. */
class SigV4SignerSpec extends AnyFunSuite {

  private val clock = () => Instant.parse("2019-05-14T19:05:47Z")
  private def signer = SigV4Signer(
    "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG/bPxRfiCY", "us-east-1", "es",
    clock = clock)

  test("Authorization header has the SigV4 shape with correct scope and signed headers") {
    val h = signer("POST", "http://search.example.com/_bulk", "{\"a\":1}\n")
    assert(h("x-amz-date") == "20190514T190547Z")
    val auth = h("Authorization")
    val re = ("^AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20190514/us-east-1/es/aws4_request, " +
      "SignedHeaders=content-type;host;x-amz-date, Signature=[0-9a-f]{64}$").r
    assert(re.findFirstIn(auth).isDefined, s"unexpected Authorization: $auth")
  }

  test("signature is deterministic and sensitive to body, secret, and region") {
    val url = "http://search.example.com:9200/_bulk"
    def sig(h: Map[String, String]) = h("Authorization").split("Signature=").last
    val a = sig(signer("POST", url, "body-1"))
    assert(a == sig(signer("POST", url, "body-1")), "same inputs must re-sign identically")
    assert(a != sig(signer("POST", url, "body-2")), "body must be signed")
    assert(a != sig(signer.copy(secretKey = "other")("POST", url, "body-1")))
    assert(a != sig(signer.copy(region = "us-west-2")("POST", url, "body-1")))
  }

  test("session token joins the signed headers and is emitted") {
    val h = signer.copy(sessionToken = Some("TOKEN123"))(
      "POST", "http://search.example.com/metrics", "{}")
    assert(h("x-amz-security-token") == "TOKEN123")
    assert(h("Authorization").contains(
      "SignedHeaders=content-type;host;x-amz-date;x-amz-security-token"))
  }
}
