package graft.sinks

import java.nio.charset.StandardCharsets

/** Minimal executor-side HTTP POST used by the sink final hops. Throws on
  * non-2xx so the Spark task fails and retries — safe because every sink
  * built on this uses idempotent keys / deterministic bodies. */
private[sinks] object Http {
  def post(url: String, body: String,
           contentType: String = "application/json"): Unit = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", contentType)
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      conn.setFixedLengthStreamingMode(bytes.length)
      val os = conn.getOutputStream
      try os.write(bytes) finally os.close()
      val code = conn.getResponseCode
      if (code < 200 || code >= 300)
        throw new java.io.IOException(s"POST $url failed: HTTP $code")
      val is = conn.getInputStream
      try { while (is.read() != -1) () } finally is.close()
    } finally conn.disconnect()
  }
}
