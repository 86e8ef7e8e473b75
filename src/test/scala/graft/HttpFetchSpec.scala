package graft

import java.io.OutputStream
import java.net.InetSocketAddress
import java.net.URLDecoder
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2._

/** The live HTTP leg of the API source: [[HttpTransactionsEndpoint]]'s
  * since-cursor pagination and [[HttpTokenExchanger]]'s refresh grant,
  * driven against a local JDK HttpServer that implements the reference
  * endpoints' semantics (bearer auth, limit/since/before params, expanded
  * merchant objects, 401 on a stale token, invalid_grant on an evicted
  * refresh token). No Spark session needed — the endpoint yields
  * InternalRows directly.
  */
class HttpFetchSpec extends AnyFunSuite {

  /** One deterministic day of transactions: `n` rows on 2024-03-01,
    * spaced a minute apart starting 00:01 (never midnight-exact: the
    * initial `since` bound is the day start and the server contract is
    * strictly-after). Every third row carries an expanded merchant.
    */
  private val Day = "2024-03-01"
  private def txJson(i: Int): String = {
    val created = f"${Day}T00:${1 + i / 60}%02d:${i % 60}%02d.000Z"
    val merchant =
      if (i % 3 == 0) s""","merchant":{"id":"merch_$i","name":"m$i"}"""
      else ""
    s"""{"id":"tx_$i","created":"$created","amount":${-100 - i},
        "currency":"GBP","category":"groceries"$merchant}"""
  }
  private def createdOf(i: Int): String =
    f"${Day}T00:${1 + i / 60}%02d:${i % 60}%02d.000Z"

  /** Local server: GET /transactions pages `total` rows by (since,
    * before, limit]; POST /oauth2/token grants a{n}/r{n}. `validToken`
    * decides 401s; `requests` records every transactions query string.
    */
  private class FakeApi(total: Int) {
    @volatile var validToken = "a0"
    @volatile var grants = 0
    val requests = new java.util.concurrent.CopyOnWriteArrayList[String]()
    @volatile var evictRefresh = false
    @volatile var rejectNextTransactions = 0

    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    private def respond(x: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      x.sendResponseHeaders(code, b.length)
      val os: OutputStream = x.getResponseBody
      os.write(b); os.close()
    }

    private def param(query: String, name: String): Option[String] =
      query.split("&").iterator
        .map(_.split("=", 2))
        .collectFirst {
          case Array(k, v) if URLDecoder.decode(k, "UTF-8") == name =>
            URLDecoder.decode(v, "UTF-8")
        }

    server.createContext("/transactions", (x: HttpExchange) => {
      val q = Option(x.getRequestURI.getRawQuery).getOrElse("")
      requests.add(q)
      val auth = Option(x.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      if (rejectNextTransactions > 0) {
        rejectNextTransactions -= 1
        respond(x, 401, """{"error":"unauthorized"}""")
      } else if (auth != s"Bearer $validToken")
        respond(x, 401, """{"error":"unauthorized"}""")
      else {
        val since = param(q, "since").get
        val before = param(q, "before").get
        val limit = param(q, "limit").get.toInt
        val rows = (0 until total)
          .filter(i => createdOf(i) > since && createdOf(i) < before) // strictly-after cursor
          .take(limit)
        respond(x, 200,
          rows.map(txJson).mkString("""{"transactions":[""", ",", "]}"))
      }
    })

    server.createContext("/oauth2/token", (x: HttpExchange) => {
      val form = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      if (evictRefresh)
        respond(x, 400, """{"error":"invalid_grant"}""")
      else if (!form.contains("grant_type=refresh_token"))
        respond(x, 400, """{"error":"unsupported_grant_type"}""")
      else {
        grants += 1
        validToken = s"a$grants"
        respond(x, 200,
          s"""{"access_token":"a$grants","refresh_token":"r$grants","expires_in":3600}""")
      }
    })

    server.start()
    val base: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  private val epochDay = java.time.LocalDate.parse(Day).toEpochDay

  test("pages through a day with the since cursor until a short page") {
    val api = new FakeApi(total = 25)
    try {
      val ep = new HttpTransactionsEndpoint(api.base, "acc_1", pageLimit = 10)
      val rows = ep("a0", epochDay, 100).toVector
      assert(rows.size === 25)
      // 3 pages: 10 + 10 + 5 (the short page stops the loop)
      assert(api.requests.size === 3)
      // every request carried the reference's query surface
      api.requests.forEach { q =>
        assert(q.contains("account_id=acc_1") && q.contains("expand%5B%5D=merchant"))
      }
      // rows parse to the DSv2 schema: id, created micros, amount,
      // currency, category, merchant id or null
      val r0 = rows.head
      assert(r0.getUTF8String(0).toString === "tx_0")
      assert(r0.getLong(1) ===
        java.time.Instant.parse(createdOf(0)).toEpochMilli * 1000L)
      assert(r0.getLong(2) === -100L)
      assert(r0.getUTF8String(3).toString === "GBP")
      assert(r0.getUTF8String(5).toString === "merch_0") // i%3==0: expanded
      assert(rows(1).isNullAt(5)) // no merchant key at all
      assert(rows.map(_.getUTF8String(0).toString).distinct.size === 25)
    } finally api.stop()
  }

  test("rowsPerDay caps the fetch below the server's row count") {
    val api = new FakeApi(total = 25)
    try {
      val ep = new HttpTransactionsEndpoint(api.base, "acc_1", pageLimit = 10)
      assert(ep("a0", epochDay, 12).size === 12)
      // 10 + 2: the second page asked for exactly the remaining budget
      assert(api.requests.size === 2)
      assert(api.requests.get(1).contains("limit=2"))
    } finally api.stop()
  }

  test("AuthedFetcher + HttpTokenExchanger: 401 triggers one refresh-retry") {
    val api = new FakeApi(total = 8)
    try {
      api.validToken = "a1" // the stored a0 is stale: first GET 401s
      val store = new InMemoryTokenStore(Some(Tokens("a0", "r0", 0L)))
      val exch = new HttpTokenExchanger(s"${api.base}/oauth2/token", "cid", "sec")
      val provider = new RefreshAlwaysTokenProvider(store, exch)
      // refresh-always: provider.token() grants a1 (matching validToken)
      val fetcher = new AuthedFetcher(provider,
        new HttpTransactionsEndpoint(api.base, "acc_1", pageLimit = 5))
      val rows = fetcher.fetchDay(epochDay, 100).toVector
      assert(rows.size === 8)
      assert(api.grants === 1)
      assert(store.load().get.refreshToken === "r1") // rotated by the grant

      // mid-flight eviction: the server rejects the next GET no matter the
      // token (a concurrent login evicted it between refresh and use) —
      // AuthedFetcher's single retry re-grants and succeeds
      api.rejectNextTransactions = 1
      val rows2 = fetcher.fetchDay(epochDay, 3).toVector
      assert(rows2.size === 3)
      assert(api.grants === 3) // the failed attempt's grant + the retry's
    } finally api.stop()
  }

  test("evicted refresh token is terminal ReauthRequired, not a retry") {
    val api = new FakeApi(total = 5)
    try {
      api.evictRefresh = true
      val exch = new HttpTokenExchanger(s"${api.base}/oauth2/token", "cid", "sec")
      intercept[ReauthRequiredException] { exch.refresh("r0") }
    } finally api.stop()
  }
}
