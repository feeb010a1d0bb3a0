package graft.sources

/** Minimal HTTP GET + the reference's error-classification loop
  * (`/root/reference/etl/fetch_utils.py:235-258` `handle_api_error`,
  * `:45-104` retry loop): HTTP 429 (rate limit) retries up to `maxRetries`
  * with a delay, 404 skips the request immediately and permanently (a
  * missing symbol is data, not an outage), and any other failure — non-200
  * status, connect/read error, malformed body — retries like 429 and then
  * gives up. JDK `HttpURLConnection` only; the sleep is injectable so tests
  * exercise the classifier without wall-clock delays.
  */
object HttpFetch {

  /** One GET: (status, body). Throws IOException on connect/read failure. */
  def get(url: String, timeoutMs: Int = 10000): (Int, String) = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    conn.setRequestMethod("GET")
    try {
      val status = conn.getResponseCode
      val is = if (status >= 400) conn.getErrorStream else conn.getInputStream
      val body =
        if (is == null) ""
        else try scala.io.Source.fromInputStream(is, "UTF-8").mkString
        finally is.close()
      (status, body)
    } finally conn.disconnect()
  }

  sealed trait FetchResult[+T]
  /** 200 and the body parsed cleanly. */
  case class Fetched[T](value: T) extends FetchResult[T]
  /** 404 — skip, never retry (reference: "Symbol not found. Skipping"). */
  case object NotFound extends FetchResult[Nothing]
  /** Retries exhausted (rate limit or persistent error). */
  case class Failed(reason: String) extends FetchResult[Nothing]

  /** GET + parse under the reference classifier. `parse` failures count as
    * retryable errors (the reference raises ValueError on malformed
    * payloads and routes it through the same handler).
    */
  def fetchParsedWithRetry[T](
      url: String,
      parse: String => T,
      maxRetries: Int = 3,
      retryDelayMs: Long = 60000L,
      sleep: Long => Unit = Thread.sleep): FetchResult[T] = {
    var attempt = 0
    var lastError = ""
    while (attempt <= maxRetries) {
      try {
        val (status, body) = get(url)
        if (status == 200) return Fetched(parse(body))
        else if (status == 404) return NotFound
        else lastError = s"HTTP $status"
      } catch {
        // interrupts (task kill/cancellation) must propagate, not become a
        // retryable "error" that keeps the dead task sleeping in the loop
        case e: InterruptedException => throw e
        case scala.util.control.NonFatal(e) =>
          lastError = s"${e.getClass.getSimpleName}: ${e.getMessage}"
      }
      attempt += 1
      if (attempt <= maxRetries) sleep(retryDelayMs)
    }
    Failed(s"$lastError after $maxRetries retries")
  }
}
