package graft.sources

import java.net.InetSocketAddress
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec
import graft.sources.PagedCatalogSource._

/** Integration spec for [[HttpPageFetcher]] over REAL sockets: a
  * local `com.sun.net.httpserver` fixture plays CMR (zero-egress —
  * loopback only), serving [[FakePagedServer]]'s granule corpus with
  * the CMR-Hits header, so the whole chain — URL construction, retry
  * loop, header/body parse, executor-side fan-out through
  * [[PagedCatalogSource.discover]] — runs the production code path.
  */
class HttpPageFetcherSpec extends SparkSpec {

  /** Start a loopback server; returns (base url, shutdown). `handler`
    * maps the parsed query params to (status, headers, body).
    */
  private def withServer[T](
      handler: Map[String, String] => (Int, Map[String, String], String))
      (body: String => T): T = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/search/granules", (ex: HttpExchange) => {
      val params = Option(ex.getRequestURI.getRawQuery)
        .getOrElse("").split("&").filter(_.nonEmpty).map { kv =>
          val Array(k, v) = kv.split("=", 2)
          k -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
      val (status, hdrs, respBody) = handler(params)
      hdrs.foreach { case (k, v) =>
        ex.getResponseHeaders.add(k, v) }
      val bytes = respBody.getBytes("UTF-8")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try body(
      s"http://127.0.0.1:${server.getAddress.getPort}/search/granules")
    finally server.stop(0)
  }

  private def feed(ids: Seq[Int]): String =
    s"""{"feed":{"entry":[${ids.map(FakePagedServer.granuleJson)
      .mkString(",")}]}}"""

  /** The fixture CMR: pages FakePagedServer ids by the request's own
    * page_num/page_size, honours the temporal watermark, reports
    * CMR-Hits.
    */
  private def cmrHandler(total: Int)(params: Map[String, String])
      : (Int, Map[String, String], String) = {
    val since = params.get("temporal").map(_.split(",")(0))
      .map(s => new Timestamp(java.time.Instant.parse(s).toEpochMilli))
    val eligible = FakePagedServer.ids(params("short_name"), total, since)
    val ps = params("page_size").toInt
    val pn = params("page_num").toInt
    val page = eligible.slice((pn - 1) * ps, pn * ps)
    (200, Map("CMR-Hits" -> eligible.size.toString), feed(page))
  }

  test("request URL carries the reference's exact CMR param set: " +
    "short_name, version, temporal start,end, page_size, page_num, " +
    "bounding_box W,S,E,N") {
    val f = new HttpPageFetcher("http://x/search/granules")
    val url = f.requestUrl(PageRequest("ATL03", "005",
      Some(Timestamp.valueOf("2024-01-05 00:00:00")),
      Timestamp.valueOf("2024-03-01 23:59:59"),
      Some((-80.0, -25.0, -60.0, -15.0)), pageNum = 3, pageSize = 100))
    assert(url.contains("short_name=ATL03"))
    assert(url.contains("version=005"))
    assert(url.contains("temporal=" + java.net.URLEncoder.encode(
      "2024-01-05T00:00:00Z,2024-03-01T23:59:59Z", "UTF-8")))
    assert(url.contains("page_size=100"))
    assert(url.contains("page_num=3"))
    assert(url.contains("bounding_box=" + java.net.URLEncoder.encode(
      "-80.0,-25.0,-60.0,-15.0", "UTF-8")))
  }

  test("end-to-end over real sockets: CMR-Hits fan-out through " +
    "discover(), watermark pushed into the temporal param, granules " +
    "parse reference-exact") {
    withServer(cmrHandler(total = 380)) { base =>
      val fetcher = new HttpPageFetcher(base, tries = 3,
        timeoutSec = 10, retryDelayMs = 10)
      val until = new Timestamp(
        FakePagedServer.baseMs + 400L * 3600000L)
      val df = PagedCatalogSource.discover(spark, fetcher,
        Seq(("ATL03", "005"), ("ATL08", "005")), Map.empty, until,
        pageSize = 50)
      val n = df.count()
      // 380 granules minus the no-geometry ones (i % 14 == 0)
      assert(n === (0 until 380).count(_ % 14 != 0))
      // watermark pushdown: a since-map shrinks what the SERVICE
      // returns (the fixture honours temporal like CMR does)
      val wm = new Timestamp(FakePagedServer.startMs(200))
      val df2 = PagedCatalogSource.discover(spark, fetcher,
        Seq(("ATL03", "005")), Map("ATL03" -> wm), until,
        pageSize = 50)
      val expect = FakePagedServer.ids("ATL03", 380, Some(wm))
        .count(_ % 14 != 0)
      assert(df2.count() === expect)
    }
  }

  test("retry posture: transient 503s are retried with backoff and " +
    "the fetch succeeds; a 4xx fails immediately without retries; " +
    "exhausted tries surface the last failure") {
    val calls = new AtomicInteger()
    // two 503s then success
    withServer { params =>
      if (calls.incrementAndGet() <= 2) (503, Map.empty, "oops")
      else cmrHandler(60)(params)
    } { base =>
      val f = new HttpPageFetcher(base, tries = 5, timeoutSec = 5,
        retryDelayMs = 1)
      val r = f.fetch(PageRequest("ATL03", "005", None,
        Timestamp.valueOf("2024-03-01 00:00:00"), None, 1, 50))
      assert(calls.get() === 3)
      assert(r.totalHits.contains(
        FakePagedServer.ids("ATL03", 60, None).size.toLong))
      assert(r.entries.nonEmpty)
    }
    // 404: loud, exactly one request
    val calls4 = new AtomicInteger()
    withServer { _ =>
      calls4.incrementAndGet(); (404, Map.empty, "no such collection")
    } { base =>
      val f = new HttpPageFetcher(base, tries = 5, timeoutSec = 5,
        retryDelayMs = 1)
      val e = intercept[IllegalStateException] {
        f.fetch(PageRequest("NOPE", "001", None,
          Timestamp.valueOf("2024-03-01 00:00:00"), None, 1, 50))
      }
      assert(e.getMessage.contains("404"))
      assert(calls4.get() === 1)
    }
    // all attempts 500: IOException carrying the try count
    val calls5 = new AtomicInteger()
    withServer { _ =>
      calls5.incrementAndGet(); (500, Map.empty, "down")
    } { base =>
      val f = new HttpPageFetcher(base, tries = 3, timeoutSec = 5,
        retryDelayMs = 1)
      val e = intercept[java.io.IOException] {
        f.fetch(PageRequest("ATL03", "005", None,
          Timestamp.valueOf("2024-03-01 00:00:00"), None, 1, 50))
      }
      assert(e.getMessage.contains("3 attempts"))
      assert(calls5.get() === 3)
    }
  }

  test("partial/empty pages: a body without feed.entry is an empty " +
    "page (the reference's loop-exit contract), a short page carries " +
    "exactly what the service sent") {
    withServer { params =>
      params("page_num").toInt match {
        case 1 => (200, Map.empty, feed(Seq(1, 3, 5))) // short page
        case _ => (200, Map.empty, """{"feed":{}}""")   // no entry node
      }
    } { base =>
      val f = new HttpPageFetcher(base, tries = 2, timeoutSec = 5,
        retryDelayMs = 1)
      val p1 = f.fetch(PageRequest("ATL03", "005", None,
        Timestamp.valueOf("2024-03-01 00:00:00"), None, 1, 50))
      assert(p1.entries.size === 3 && p1.totalHits.isEmpty)
      val p2 = f.fetch(PageRequest("ATL03", "005", None,
        Timestamp.valueOf("2024-03-01 00:00:00"), None, 2, 50))
      assert(p2.entries.isEmpty)
    }
  }
}
