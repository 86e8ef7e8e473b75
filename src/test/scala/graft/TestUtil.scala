package graft

/** Shared test helpers. */
object TestUtil {
  /** Lowercase-hex MD5 of a UTF-8 string — matches Spark's and DuckDB's
    * `md5()`, used to check reconstructed-text contracts.
    */
  def md5Of(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
}
