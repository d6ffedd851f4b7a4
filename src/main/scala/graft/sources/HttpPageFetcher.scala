package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

import graft.sources.PagedCatalogSource.{PageFetcher, PageRequest,
  PageResult}

/** Production [[PagedCatalogSource.PageFetcher]] over `java.net.http`
  * — the network half of the S3–S5 scans that the zero-egress
  * container could only gate through fakes until now.
  *
  * Request shape is the reference's CMR search verbatim
  * (`eodatadownICESAT2sensor.py:528-552`): GET `baseUrl` with
  * `short_name`, `version`, `temporal=<startZ>,<endZ>`, `page_size`,
  * `page_num`, and `bounding_box=W,S,E,N` (the lower-left/upper-right
  * render of `EDDGeoBBox.getBBOXLLURStr`). The watermark pushdown is
  * already in [[PageRequest.temporalStart]]; this class only renders
  * it.
  *
  * Retry posture is the reference's downloader contract
  * (`eodatadownutils.py:1688` — wget `-t 10 -T 60`): up to `tries`
  * attempts, each with a `timeoutSec` request timeout, linear backoff
  * (attempt × `retryDelayMs`, capped at 10 × `retryDelayMs`).
  * RETRYABLE: connect/IO failures, HTTP 5xx and 429 (the transient
  * family). NOT retryable: other 4xx — a malformed request never gets
  * better, and 10 retries against CMR would only burn its rate limit;
  * those fail loudly on the first response.
  *
  * Response contract: `CMR-Hits` header → [[PageResult.totalHits]]
  * (what unlocks the partition-per-page fan-out), body
  * `feed.entry[*]` re-serialized verbatim as one raw JSON document
  * per granule (the shape [[PagedCatalogSource.parseGranules]]
  * expects). A body without `feed.entry` is an empty page, matching
  * the reference's `doesPathExist → break` loop exit
  * (`eodatadownICESAT2sensor.py:563-565`).
  *
  * Serializable BY DESIGN: the fan-out executes `fetch` inside tasks,
  * so instances ship to executors. Only the configuration serializes;
  * the [[HttpClient]] (sockets, thread pool) is `@transient lazy` and
  * each executor JVM builds its own on first use.
  */
final class HttpPageFetcher(
    baseUrl: String,
    tries: Int = 10,
    timeoutSec: Long = 60,
    retryDelayMs: Long = 1000,
    headers: Map[String, String] = Map.empty) extends PageFetcher {

  require(tries >= 1, s"tries must be >= 1, got $tries")

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(timeoutSec))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, UTF_8)

  private def isoZ(ts: java.sql.Timestamp): String =
    java.time.Instant.ofEpochMilli(ts.getTime).toString
      .replaceAll("\\.\\d+Z$", "Z") // whole-second render like the ref

  /** The full request URL for one page — exposed for specs: the param
    * set IS the reference contract, so it gets pinned directly.
    */
  def requestUrl(req: PageRequest): String = {
    val params = Seq(
      "short_name" -> req.product,
      "version" -> req.version) ++
      req.temporalStart.map(s =>
        "temporal" -> s"${isoZ(s)},${isoZ(req.temporalEnd)}") ++
      Seq(
        "page_size" -> req.pageSize.toString,
        "page_num" -> req.pageNum.toString) ++
      req.bbox.map { case (w, s, e, n) =>
        "bounding_box" -> s"$w,$s,$e,$n" }
    baseUrl + "?" + params
      .map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")
  }

  override def fetch(req: PageRequest): PageResult = {
    val url = requestUrl(req)
    var attempt = 0
    var last: Throwable = null
    while (attempt < tries) {
      attempt += 1
      try {
        val b = HttpRequest.newBuilder(URI.create(url))
          .timeout(Duration.ofSeconds(timeoutSec)).GET()
        headers.foreach { case (k, v) => b.header(k, v) }
        val resp = client.send(b.build(),
          HttpResponse.BodyHandlers.ofString(UTF_8))
        resp.statusCode() match {
          case ok if ok >= 200 && ok < 300 =>
            return parse(resp)
          case retryable if retryable >= 500 || retryable == 429 =>
            last = new java.io.IOException(
              s"HTTP ${resp.statusCode()} from $url (attempt " +
                s"$attempt/$tries)")
          case fatal =>
            throw new IllegalStateException(
              s"HttpPageFetcher: HTTP $fatal from $url — " +
                s"non-transient, not retrying (body: " +
                s"${resp.body().take(200)})")
        }
      } catch {
        case e: java.io.IOException => last = e
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); throw e
      }
      if (attempt < tries)
        Thread.sleep(math.min(attempt, 10) * retryDelayMs)
    }
    throw new java.io.IOException(
      s"HttpPageFetcher: $tries attempts failed for $url", last)
  }

  private def parse(resp: HttpResponse[String]): PageResult = {
    val hits = resp.headers().firstValue("CMR-Hits")
    val root = mapper.readTree(resp.body())
    val entry = root.path("feed").path("entry")
    val entries =
      if (!entry.isArray) Seq.empty[String]
      else {
        import scala.jdk.CollectionConverters._
        entry.elements().asScala.map(_.toString).toSeq
      }
    PageResult(entries,
      if (hits.isPresent) Some(hits.get().toLong) else None)
  }
}
