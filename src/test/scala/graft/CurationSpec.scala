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

  test("boilerplateChunkFilter removes ALL occurrences of a shared chunk, keep-first does not apply") {
    // 4-token chunks; docs 1 and 2 share their first chunk verbatim
    // (boilerplate), doc 3 is clean. Every doc also has a unique tail.
    val docs = Seq(
      (1L, "cookie banner accept all unique tail one two"),
      (2L, "cookie banner accept all other ending words here"),
      (3L, "entirely original content with no repeats at all")).toDF("doc_id", "text")
    val got = graft.operators.Curation.boilerplateChunkFilter(docs, chunkTokens = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(4))).toMap
    // both sharers lose the chunk — including the FIRST occurrence
    assert(got(1L)._1 === 2 && got(1L)._2 === 1)
    assert(got(2L)._1 === 2 && got(2L)._2 === 1)
    assert(got(3L)._2 === 0)
    // the reconstructed survivor stream is exactly the unique tail
    assert(got(1L)._3 === TestUtil.md5Of("unique tail one two"))
    assert(got(3L)._3 === TestUtil.md5Of("entirely original content with no repeats at all"))
    // deterministic across runs (collect_list order is tamed by sort_array)
    val again = graft.operators.Curation.boilerplateChunkFilter(docs, 4, 2)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(again === got.map { case (k, v) => k -> v._3 })
  }

  test("capSourceShare: overrepresented source capped near maxShare, small source untouched") {
    // 900 rows of "big", 100 of "small"; cap at 50% of the 1000-row corpus
    val df = spark.range(1000)
      .select(col("id").as("doc_id"),
        when(col("id") < 900, "big").otherwise("small").as("source"))
    val kept = graft.operators.Curation.capSourceShare(df, "source", "doc_id", maxShare = 0.5)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // big: rate = 0.5*1000/900 ≈ 0.556 → ~500 kept (the cap's target volume)
    assert(math.abs(kept("big") - 500L) < 60, s"big kept ${kept("big")}")
    // small: rate = 5.0 clamps to 1.0 → ALL 100 kept, deterministically
    assert(kept("small") === 100L)
    // pure-hash gate ⇒ bit-identical keep set on re-run
    val a = graft.operators.Curation.capSourceShare(df, "source", "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val b = graft.operators.Curation.capSourceShare(df, "source", "doc_id", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a === b)
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

  test("repetitionStats: counts match a naive reference on hand cases") {
    import graft.expressions.RepetitionStats.repetitionStats
    // (text, total, distinct, topBigram, dupChars, totalChars)
    val cases = Seq(
      ("a a b", 3, 2, 1, 1L, 3L),                   // "a a" once; one dup 'a'
      ("x y x y x", 5, 2, 2, 3L, 5L),               // "x y" twice, "y x" twice
      ("one two three", 3, 3, 1, 0L, 11L),          // all unique, every bigram count 1
      ("aa aa aa", 3, 1, 2, 4L, 6L),                // "aa aa" twice; 2 extra 'aa' = 4 chars
      ("", 1, 1, 0, 0L, 0L))                        // split('') = [''], no bigrams
    val df = cases.map(_._1).toDF("text")
      .select(repetitionStats(TextFunctions.tokens(col("text"))).as("st"))
      .select("st.total_words", "st.distinct_words", "st.top_bigram",
        "st.dup_chars", "st.total_chars")
    val got = df.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === cases.map(c => (c._2, c._3, c._4, c._5, c._6)))
  }

  test("aucBySource: separation 1, reversal 0, ties 1/2, single-class NULL") {
    def doc(id: Long, src: String, len: Long, lang: String) = (id, src, len, lang)
    val docs = (
      // perfect: every en longer than every non-en
      Seq(doc(1, "sep", 10, "en"), doc(2, "sep", 9, "en"),
        doc(3, "sep", 2, "fr"), doc(4, "sep", 1, "fr")) ++
      // reversed: every en shorter
      Seq(doc(5, "rev", 1, "en"), doc(6, "rev", 9, "fr")) ++
      // all scores equal: AUC = 1/2 from the tie term
      Seq(doc(7, "tie", 5, "en"), doc(8, "tie", 5, "fr")) ++
      // single class: undefined, must be NULL (not NaN/inf)
      Seq(doc(9, "one", 5, "en"), doc(10, "one", 6, "en"))
    ).toDF("doc_id", "source", "n_chars", "lang")
    val rows = graft.queries.CurationQueries.aucBySource(docs).collect()
    val bynm = rows.map(r => r.getString(0) -> r).toMap
    assert(bynm("sep").getDouble(3) === 1.0)
    assert(bynm("rev").getDouble(3) === 0.0)
    assert(bynm("tie").getDouble(3) === 0.5)
    assert(bynm("one").isNullAt(3))
  }

  private def words(n: Int): String = Seq.fill(n)("w").mkString(" ")

  // the q199/q200 portable gate, replayed independently of Spark
  private def md5U60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("q198 packing profile: hand-traced boundary crossings at L=512") {
    // source a tape: 500 | 20 | 1004 tokens -> ends 500, 520, 1524.
    // doc 2 straddles seqs 0-1; doc 3 spans seqs 1-2. 3 seqs, tail 500.
    val docs = Seq(
      (1L, words(500), "en", "a", 1L),
      (2L, words(20), "en", "a", 1L),
      (3L, words(1004), "en", "a", 1L),
      (9L, words(7), "en", "b", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("graft_q198")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Registry.byName("q198_sequence_packing").run(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = rows("a")
    assert(a.getAs[Long]("n_docs") === 3L)
    assert(a.getAs[Long]("total_tokens") === 1524L)
    assert(a.getAs[Long]("n_seqs") === 3L)
    assert(a.getAs[Long]("tail_fill") === 500L)
    assert(a.getAs[Long]("boundary_docs") === 2L)
    assert(a.getAs[Long]("doc_seq_spans") === 5L)
    assert(a.getAs[Long]("max_span") === 2L)
    assert(a.getAs[Double]("docs_per_seq") === 1.666667)
    // a one-doc source: one partial sequence, nothing straddles
    val b = rows("b")
    assert(b.getAs[Long]("n_seqs") === 1L && b.getAs[Long]("tail_fill") === 7L
      && b.getAs[Long]("boundary_docs") === 0L)
  }

  test("q199 E-S weighted sample: exactly the k smallest hash priorities survive") {
    // 60 docs in one source (> k=50): the query must return precisely the
    // 50 smallest round(-ln(u)/w, 9) keys, u replayed here from md5
    val docs = (1 to 60).map(i =>
      (i.toLong, words(3), "en", "s", 10L + i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("graft_q199")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Registry.byName("q199_weighted_sample_es").run(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("pri")))
    assert(got.length === 50)
    val expected = (1 to 60).map { i =>
      val u = (md5U60(i.toString) % 1000000L + 1L).toDouble / 1000001.0
      val pri = BigDecimal(-math.log(u) / (10L + i).toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      (i.toLong, pri)
    }.sortBy(p => (p._2, p._1)).take(50)
    assert(got.toSeq === expected)
  }

  test("q200 temperature mixing: sqrt-share rates and md5-gate census replay") {
    // T_a=400, T_b=100 -> sw 20/10, S=30, B=250;
    // rate_a = 250*20/30/400 = .416667, rate_b = 250*10/30/100 = .833333
    val docs = ((1 to 40).map(i => (i.toLong, words(10), "en", "a", 1L)) ++
      (101 to 110).map(i => (i.toLong, words(10), "en", "b", 1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("graft_q200")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Registry.byName("q200_temperature_mixing").run(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("a").getAs[Double]("rate") === 0.416667)
    assert(rows("b").getAs[Double]("rate") === 0.833333)
    def keptOf(ids: Seq[Long], rate: Double): Long = ids.count { id =>
      (md5U60(s"$id/mix") % 1000000L).toDouble / 1000000.0 < rate
    }.toLong
    assert(rows("a").getAs[Long]("kept_docs") ===
      keptOf((1L to 40L), 0.416667))
    assert(rows("b").getAs[Long]("kept_docs") ===
      keptOf((101L to 110L), 0.833333))
    assert(rows("a").getAs[Long]("kept_tokens") ===
      rows("a").getAs[Long]("kept_docs") * 10L)
  }

  test("q206 chunk geometry: counts, starts, tail lengths, overlap content") {
    import spark.implicits._
    // 100 distinct tokens: chunks at 1 and 49; tail chunk = 52 tokens
    val text100 = (1 to 100).map(i => s"w$i").mkString(" ")
    val text64 = (1 to 64).map(i => s"v$i").mkString(" ")
    val text10 = (1 to 10).map(i => s"u$i").mkString(" ")
    val docs = Seq((1L, text100), (2L, text64), (3L, text10), (4L, ""))
      .toDF("doc_id", "text")
    val q = graft.Registry.byName("q206_rag_chunking")
    // run the query body against a landed copy of the fixture via the
    // same chunk arithmetic, replayed directly on the operator pipeline
    val dir = graft.queries.Scratch.tempDir("graft_q206_fix")
    docs.write.mode("overwrite").parquet(dir + "/documents.parquet")
    val got = q.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(got === List(
      (1L, 0L, 1L, 64L), (1L, 1L, 49L, 52L), // ceil((100-64)/48)+1 = 2 chunks
      (2L, 0L, 1L, 64L),                      // exactly C ⇒ one chunk
      (3L, 0L, 1L, 10L)))                     // short doc ⇒ one short chunk
    // overlap content: chunk 1 of doc 1 starts at token 49 = "w49"
    val md5s = q.run(spark, dir).collect().map(_.getString(4))
    assert(md5s.distinct.length === md5s.length) // distinct windows ⇒ distinct hashes
  }
}
