package graft.sources.v2

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.{Instant, LocalDate}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Live HTTP implementations of the API-source seams that were interfaces
  * only through round 6: the transactions page fetch behind
  * [[AuthedFetcher]] and the refresh-token grant behind [[TokenExchanger]].
  *
  * Semantics mirror the reference client, re-shaped for executor-side use:
  *
  *  - `GET {base}/transactions?account_id=…&limit=…&expand[]=merchant`
  *    with `since`/`before` ISO-8601 bounds and a bearer header
  *    (/root/reference/src/utils/api/api_client.py:157-201). The reference
  *    fetches ONE page on the driver; here each day-slice partition pages
  *    through its own `[day, day+1)` window with a `since` cursor (last
  *    row's `created`, server contract: strictly-after) until a short
  *    page — the loop the reference's single call implies at any real
  *    volume.
  *  - `POST {tokenUrl}` form grant `grant_type=refresh_token`
  *    (/root/reference/src/utils/api/token_manager.py:64-120): 200 →
  *    fresh tokens (missing `refresh_token` key = keep the old one,
  *    handled by [[RefreshAlwaysTokenProvider]]); 401/403, or a 400 whose
  *    body carries `invalid_grant` (the evicted-refresh-token response),
  *    → [[ReauthRequiredException]] — a human must redo initial auth.
  *
  * A 401 from the DATA endpoint throws [[UnauthorizedException]], which
  * [[AuthedFetcher]] converts into exactly one refresh-and-retry.
  *
  * Merchant arrives expanded (`expand[]=merchant` → `merchant` object,
  * whose `id` this reader projects) or flat (`merchant_id`) — both are
  * accepted, like the reference's `_extract_merchant_info`.
  *
  * The `HttpClient` is per-JVM lazy transient state: instances of these
  * classes ship inside DSv2 [[DaySlice]] partitions, and the client (its
  * socket pools, executor threads) must be built on the receiving
  * executor, never serialized from the driver.
  */
object HttpFetch {

  private[v2] lazy val mapper = new ObjectMapper()

  private[v2] def client: HttpClient = Holder.client

  private object Holder {
    lazy val client: HttpClient = HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(20))
      .build()
  }

  private[v2] def enc(s: String): String =
    URLEncoder.encode(s, StandardCharsets.UTF_8)

  private[v2] def isoMicros(iso: String): Long = {
    val inst = Instant.parse(iso)
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }
}

/** The paged day fetch: plugs into [[AuthedFetcher]] as its `endpoint`
  * function. `rowsPerDay` caps the total rows taken from the window
  * (the DSv2 limit pushdown's per-day budget); `pageLimit` is the
  * reference's `limit` page-size parameter.
  */
final class HttpTransactionsEndpoint(
    baseUrl: String, accountId: String, pageLimit: Int = 200)
    extends ((String, Long, Int) => Iterator[InternalRow]) with Serializable {

  override def apply(
      token: String, epochDay: Long, rowsPerDay: Int): Iterator[InternalRow] = {
    val dayStart = LocalDate.ofEpochDay(epochDay).atStartOfDay().toInstant(java.time.ZoneOffset.UTC)
    val dayEnd = LocalDate.ofEpochDay(epochDay + 1).atStartOfDay().toInstant(java.time.ZoneOffset.UTC)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var since = dayStart.toString
    var more = true
    while (more && out.length < rowsPerDay) {
      val page = fetchPage(token, since, dayEnd.toString,
        math.min(pageLimit, rowsPerDay - out.length))
      page.foreach { case (row, created) => out += row; since = created }
      // a short page means the window is drained; a full one may have more
      more = page.length >= math.min(pageLimit, rowsPerDay - out.length) &&
        page.nonEmpty
    }
    out.iterator
  }

  /** One `GET /transactions` page; returns (row, created-ISO) pairs in
    * server order so the caller can advance its cursor.
    */
  private def fetchPage(
      token: String, since: String, before: String,
      limit: Int): Seq[(InternalRow, String)] = {
    import HttpFetch._
    // the expand[] param name is percent-encoded: java.net.URI rejects
    // raw square brackets in a query string
    val uri = URI.create(
      s"$baseUrl/transactions?account_id=${enc(accountId)}&limit=$limit" +
        s"&${enc("expand[]")}=merchant&since=${enc(since)}&before=${enc(before)}")
    val req = HttpRequest.newBuilder(uri)
      .header("Authorization", s"Bearer $token")
      .GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 200 => parseTransactions(resp.body())
      case 401 => throw new UnauthorizedException(
        s"transactions endpoint rejected the bearer token (401): ${resp.body()}")
      case other => throw new RuntimeException(
        s"transactions endpoint returned HTTP $other: ${resp.body()}")
    }
  }

  private def parseTransactions(body: String): Seq[(InternalRow, String)] = {
    import HttpFetch._
    val root = mapper.readTree(body)
    val txs = root.path("transactions")
    val out = scala.collection.mutable.ArrayBuffer.empty[(InternalRow, String)]
    txs.forEach { tx: JsonNode =>
      val created = tx.path("created").asText()
      val merchant: AnyRef =
        if (tx.hasNonNull("merchant") && tx.path("merchant").isObject)
          UTF8String.fromString(tx.path("merchant").path("id").asText())
        else if (tx.hasNonNull("merchant_id"))
          UTF8String.fromString(tx.path("merchant_id").asText())
        else null
      out += ((new GenericInternalRow(Array[Any](
        UTF8String.fromString(tx.path("id").asText()),
        isoMicros(created),
        tx.path("amount").asLong(),
        UTF8String.fromString(tx.path("currency").asText()),
        UTF8String.fromString(tx.path("category").asText()),
        merchant)), created))
    }
    out.toSeq
  }
}

/** The refresh-token grant over HTTP — [[TokenExchanger]] for a real
  * OAuth2 token endpoint.
  */
final class HttpTokenExchanger(
    tokenUrl: String, clientId: String, clientSecret: String)
    extends TokenExchanger {

  override def refresh(refreshToken: String): Tokens = {
    import HttpFetch._
    val form =
      s"grant_type=refresh_token&client_id=${enc(clientId)}" +
        s"&client_secret=${enc(clientSecret)}&refresh_token=${enc(refreshToken)}"
    val req = HttpRequest.newBuilder(URI.create(tokenUrl))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(form))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 200 =>
        val n = mapper.readTree(resp.body())
        Tokens(
          accessToken = n.path("access_token").asText(),
          refreshToken = n.path("refresh_token").asText(""), // "" = keep old
          expiresAtMillis =
            System.currentTimeMillis() + n.path("expires_in").asLong(0L) * 1000L)
      case 400 if resp.body().contains("invalid_grant") =>
        throw new ReauthRequiredException(
          s"refresh token evicted (invalid_grant): ${resp.body()}")
      case 401 | 403 =>
        throw new ReauthRequiredException(
          s"token endpoint rejected the refresh (HTTP ${resp.statusCode()}): ${resp.body()}")
      case other => throw new RuntimeException(
        s"token endpoint returned HTTP $other: ${resp.body()}")
    }
  }
}
