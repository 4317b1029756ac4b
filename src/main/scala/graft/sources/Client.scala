package graft.sources

/** Rate-limited Alpha-Vantage-shaped HTTP client (SURVEY.md S1/S2/O4).
  *
  * Behavior derived from the reference: `TIME_SERIES_INTRADAY` with
  * interval=60min & outputsize=compact and a 30 s timeout
  * (reference/scripts/fetch_stock_data.py:16-27), the free-tier budget
  * of 5 requests/min with a documented 12 s inter-request delay
  * (reference/README.md:375-379), and a `GLOBAL_QUOTE` health probe
  * (reference/Makefile:122-134).
  *
  * The transport is pluggable so the pipeline is fully testable
  * offline (fixtures inject canned payloads); the default transport
  * uses java.net.http. Fetching stays on the driver by design: the
  * rate budget makes distributed fetch pointless (SURVEY.md §3.1) —
  * the cluster's parallelism belongs to parse/merge/query, not to a
  * 5-req/min source.
  */
class AlphaVantageClient(
    apiKey: String,
    transport: String => String = AlphaVantageClient.httpTransport,
    interRequestDelayMs: Long = 12000L,
    sleeper: Long => Unit = Thread.sleep) {

  private var lastRequestAt = 0L

  private def throttle(): Unit = synchronized {
    val now = System.currentTimeMillis()
    val wait = lastRequestAt + interRequestDelayMs - now
    if (wait > 0) sleeper(wait)
    lastRequestAt = System.currentTimeMillis()
  }

  /** GET the intraday series for a symbol; None on transport error.
    * (Payload-level errors — 'Error Message' / rate-limit 'Note' — are
    * handled downstream by AlphaVantage.parseBars, matching the coded
    * skip-symbol semantics.) */
  def fetchIntraday(symbol: String): Option[String] = {
    throttle()
    val url = "https://www.alphavantage.co/query?function=TIME_SERIES_INTRADAY" +
      s"&symbol=$symbol&interval=60min&outputsize=compact&apikey=$apiKey"
    try Some(transport(url))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Health probe: GLOBAL_QUOTE for AAPL must contain the quote key. */
  def healthCheck(): Boolean = {
    throttle()
    val url = "https://www.alphavantage.co/query?function=GLOBAL_QUOTE" +
      s"&symbol=AAPL&apikey=$apiKey"
    try transport(url).contains("Global Quote")
    catch { case scala.util.control.NonFatal(_) => false }
  }
}

object AlphaVantageClient {
  /** Default transport: blocking GET with the reference's 30 s timeout. */
  val httpTransport: String => String = { url =>
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30)).build()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(30)).GET().build()
    client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString()).body()
  }
}
