package graft

/** The events reader must not mutate session state: the legacy
  * nanos-as-long flag travels as a per-read option, so a library user's
  * session conf is exactly what they set (VERDICT r1 "what's wrong" #5).
  */
class TablesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("events reads nanos timestamps without touching session conf") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)

    val df = Tables.events(spark, sf)
    val n = df.count()
    assert(n > 0)
    assert(df.schema("ts").dataType.typeName == "timestamp")
    // a concrete value must materialize (the scan itself honors the option)
    assert(df.selectExpr("max(ts)").collect().head.get(0) != null)

    // registered SQLConfs report their default after unset; the reader must
    // not have flipped the session-level value to true
    assert(!spark.conf.get(key).toBoolean,
      "events reader leaked nanosAsLong into the session conf")
  }
}
