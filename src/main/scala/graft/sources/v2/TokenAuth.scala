package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow

/** Token lifecycle for the API source, mirroring the reference's
  * `MonzoTokenManager` / `MonzoAPIClient` orchestration
  * (/root/reference/src/utils/api/token_manager.py:25-171,
  * /root/reference/src/utils/api/api_client.py:13-31) with the cloud
  * pieces abstracted behind traits instead of hard-wired services:
  *
  *  - [[TokenStore]] — the token record (access, refresh, expiry stamp)
  *    in durable storage; the reference keeps it in a key-value table
  *    (token_manager.py:25-62). [[InMemoryTokenStore]] is the offline
  *    stand-in; a cluster deployment implements this against its own
  *    secret store.
  *  - [[TokenExchanger]] — the refresh-token grant
  *    (token_manager.py:64-120): exchanges the current refresh token for
  *    fresh tokens. An evicted/revoked refresh token is terminal and
  *    throws [[ReauthRequiredException]] (the reference's
  *    `requires_reauth: true` branch, token_manager.py:156-162); an empty
  *    `refreshToken` in the response means the grant carried none and
  *    the caller must keep using the previous one
  *    (token_manager.py:99-101).
  *  - [[RefreshAlwaysTokenProvider]] — `get_valid_token`'s actual
  *    policy (token_manager.py:122-171): it does NOT check the stored
  *    expiry; every call refreshes (the stored expiry exists for
  *    observability, and refresh-always keeps a long-idle scheduled job
  *    from ever presenting a stale token). No stored tokens at all is
  *    the initial-auth state and throws [[ReauthRequiredException]].
  *  - [[AuthedFetcher]] — the API-client behavior: present the bearer
  *    token to the endpoint; on a 401 rejection
  *    ([[UnauthorizedException]], e.g. the token was evicted by a
  *    concurrent login between refresh and use) refresh ONCE and retry;
  *    a second 401 propagates.
  *
  * Everything is Serializable: a provider travels inside the DSv2
  * [[DaySlice]] partitions, so each executor refreshes through its own
  * store handle rather than shipping a driver-fetched token whose
  * lifetime would have to outlive the whole scan.
  */
final case class Tokens(
    accessToken: String, refreshToken: String, expiresAtMillis: Long)

/** Terminal auth state: a human must re-run the OAuth flow (the
  * reference's 401 + `requires_reauth` response).
  */
final class ReauthRequiredException(msg: String) extends RuntimeException(msg)

/** The data endpoint rejected the bearer token (HTTP 401). */
final class UnauthorizedException(msg: String) extends RuntimeException(msg)

trait TokenStore extends Serializable {
  def load(): Option[Tokens]
  def save(t: Tokens): Unit
}

final class InMemoryTokenStore(initial: Option[Tokens] = None) extends TokenStore {
  @volatile private var current: Option[Tokens] = initial
  override def load(): Option[Tokens] = current
  override def save(t: Tokens): Unit = current = Some(t)
}

trait TokenExchanger extends Serializable {
  /** Refresh-token grant. Empty `refreshToken` in the result = the grant
    * response carried none (keep the old one). Throws
    * [[ReauthRequiredException]] for an evicted refresh token.
    */
  def refresh(refreshToken: String): Tokens
}

trait TokenProvider extends Serializable {
  /** A bearer token believed valid at call time. */
  def token(): String
}

/** `get_valid_token` mirror: refresh on EVERY call, persist the result,
  * rotate the refresh token only when the grant returned one.
  */
final class RefreshAlwaysTokenProvider(store: TokenStore, exchanger: TokenExchanger)
    extends TokenProvider {
  override def token(): String = {
    val stored = store.load().getOrElse(throw new ReauthRequiredException(
      "No valid tokens found. Initial authentication required."))
    val fresh = exchanger.refresh(stored.refreshToken)
    val rotated =
      if (fresh.refreshToken == null || fresh.refreshToken.isEmpty)
        fresh.copy(refreshToken = stored.refreshToken)
      else fresh
    store.save(rotated)
    rotated.accessToken
  }
}

/** Authenticated day fetch: `endpoint(token, epochDay, rowsPerDay)` is the
  * stubbed HTTP call (throws [[UnauthorizedException]] on a rejected
  * token). Exactly one refresh-and-retry on 401; the second rejection
  * propagates to the task (and Spark's task retry surfaces it loudly).
  */
final class AuthedFetcher(
    provider: TokenProvider,
    endpoint: (String, Long, Int) => Iterator[InternalRow]) extends DayFetcher {
  override def fetchDay(epochDay: Long, rowsPerDay: Int): Iterator[InternalRow] = {
    def attempt(): Iterator[InternalRow] =
      endpoint(provider.token(), epochDay, rowsPerDay)
    try attempt()
    catch { case _: UnauthorizedException => attempt() }
  }
}
