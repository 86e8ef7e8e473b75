package graft

import org.apache.spark.sql.functions._

/** DSv2 API source: schema, per-day partition planning, filter pushdown
  * narrowing the fetch window, determinism.
  */
class MonzoApiSourceSpec extends SparkSpec {

  private def read(since: String, until: String, rowsPerDay: Int = 50) =
    spark.read.format("graft.sources.v2.MonzoApiSource")
      .option("since", since).option("until", until)
      .option("rowsPerDay", rowsPerDay.toString)
      .load()

  test("reads rowsPerDay rows per day with one partition per day") {
    val df = read("2024-01-01", "2024-01-11")
    assert(df.count() === 10 * 50)
    assert(df.rdd.getNumPartitions === 10)
    assert(df.columns.toSeq ===
      Seq("id", "created", "amount", "currency", "category", "merchant_id"))
  }

  test("created >= bound narrows the fetch window (partition-level pushdown)") {
    val df = read("2024-01-01", "2024-01-31")
      .filter(col("created") >= lit("2024-01-25").cast("timestamp"))
    // only 6 day-slices (25..30) should be planned, not 30
    assert(df.rdd.getNumPartitions === 6)
    assert(df.count() === 6 * 50)
    val explained = df.queryExecution.executedPlan.toString
    assert(explained.contains("graft-monzo-api [since=2024-01-25"))
  }

  test("sub-day bound narrows to day granularity and residual-filters rows") {
    val df = read("2024-01-01", "2024-01-31")
      .filter(col("created") >= lit("2024-01-25 12:00:00").cast("timestamp"))
    assert(df.rdd.getNumPartitions === 6) // day 25 still fetched
    val cnt = df.count()
    assert(cnt < 6 * 50 && cnt > 4 * 50) // ~half of day 25 filtered out
    // every surviving row respects the original sub-day predicate
    assert(df.filter(col("created") < lit("2024-01-25 12:00:00").cast("timestamp"))
      .count() === 0)
  }

  test("created <= midnight bound still fetches that day (inclusive upper bound)") {
    val bound = lit("2024-01-15 00:00:00").cast("timestamp")
    val filtered = read("2024-01-10", "2024-01-31")
      .filter(col("created") <= bound)
    assert(filtered.rdd.getNumPartitions === 6) // days 10..15 inclusive
    val expected = read("2024-01-10", "2024-01-31").collect()
      .count(!_.getTimestamp(1).after(java.sql.Timestamp.valueOf("2024-01-15 00:00:00")))
    assert(filtered.count() === expected)
  }

  test("limit pushdown: the reference's limit=200 page param reaches the source") {
    // S5 (api_client.py:158): LIMIT caps the FETCH, not a post-scan
    // operator over fully-fetched pages
    val df = read("2024-01-01", "2024-01-31", rowsPerDay = 200).limit(7)
    assert(df.count() === 7)
    val explained = df.queryExecution.executedPlan.toString
    assert(explained.contains("limit=7"),
      s"limit not pushed into the scan:\n$explained")
  }

  test("deterministic across reads; spend amounts are negative pence") {
    val a = read("2024-02-01", "2024-02-03").collect().map(_.toString).sorted
    val b = read("2024-02-01", "2024-02-03").collect().map(_.toString).sorted
    assert(a === b)
    val df = read("2024-02-01", "2024-02-03")
    assert(df.filter(col("amount") > 0).count() === 0)
    assert(df.select(countDistinct("id")).head.getLong(0) === df.count())
  }
}
