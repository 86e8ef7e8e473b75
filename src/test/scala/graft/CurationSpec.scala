package graft

import graft.functions.TextFunctions
import graft.operators.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("stratifiedSample (xxhash64 gate): rates hit within tolerance, deterministic") {
    val events = Tables.events(spark, sf)
    val rates = Map("view" -> 0.1, "click" -> 0.5, "purchase" -> 1.0)
    val sampled = Curation.stratifiedSample(events, "event_type", "event_id", rates)
    val got = sampled.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = events.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // strata not in the rates map are dropped entirely
    assert(!got.contains("signup") && !got.contains("error"))
    rates.foreach { case (stratum, rate) =>
      val observed = got.getOrElse(stratum, 0L).toDouble / base(stratum)
      assert(math.abs(observed - rate) <= 0.05,
        s"$stratum: observed $observed vs rate $rate")
    }
    // hash gate ⇒ bit-identical on re-run (no RNG state anywhere)
    val again = Curation.stratifiedSample(events, "event_type", "event_id", rates)
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(again === sampled.select("event_id").collect().map(_.getLong(0)).sorted)
  }

  test("decontaminate: drops the doc sharing a benchmark passage, keeps clean docs") {
    val benchmark = Seq(
      (1000L, "the quick brown fox jumps over the lazy dog tonight")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "completely unrelated text about spark partitions and shuffles"),
      // contains a ≥3-shingle passage copied from the benchmark doc
      (2L, "intro words then the quick brown fox jumps over the lazy dog and more"),
      (3L, "short")).toDF("doc_id", "text")
    val clean = Curation.decontaminate(corpus, benchmark, n = 3, minShared = 3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(clean === Array(1L, 3L))
  }

  test("redactPii: emails, IPs, phone runs replaced; clean text untouched") {
    val rows = Seq(
      ("mail me at alice.smith+spam@sub.example.co.uk please",
        "mail me at <EMAIL> please"),
      ("server 192.168.0.255 and backup 10.0.3.7 up",
        "server <IP> and backup <IP> up"),
      ("call +44 20 7946 0958 now", "call <PHONE> now"),
      ("nothing sensitive here", "nothing sensitive here"))
    val got = rows.map(_._1).toDF("text")
      .select(TextFunctions.redactPii(col("text"))).as[String].collect()
    assert(got.toSeq === rows.map(_._2))
  }
}
