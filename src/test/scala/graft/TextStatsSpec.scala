package graft

import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** Analytic ground truths for the corpus-statistics family (q102–q104):
  * KL divergence, unigram surprisal, PMI. Each test pins the closed-form
  * value on a corpus small enough to compute by hand, so the decimal-sum
  * plumbing can't drift without a loud failure.
  */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenKlDivergence: identical distributions give KL 0, skew gives > 0") {
    // Two sources with identical unigram distributions (each "a a b").
    val same = Seq(
      (1L, "a a b", "s1"), (2L, "a a b", "s2"))
      .toDF("doc_id", "text", "source")
    val kl0 = TokenKl.of(same)
    assert(kl0.values.forall(_ == 0.0), s"expected 0, got $kl0")

    // s1 = "a a a a", s2 = "b b b b": p_s1(a)=1, q(a)=1/2 ⇒ KL = ln 2.
    val skew = Seq(
      (1L, "a a a a", "s1"), (2L, "b b b b", "s2"))
      .toDF("doc_id", "text", "source")
    val kl = TokenKl.of(skew)
    val ln2 = BigDecimal(math.log(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(kl("s1") - ln2) < 1e-9)
    assert(math.abs(kl("s2") - ln2) < 1e-9)
  }

  test("unigramSurprisal: uniform vocabulary gives ln(V) everywhere") {
    // 4 equally-frequent words ⇒ every token surprisal = ln 4.
    val docs = Seq(
      (1L, "a b"), (2L, "c d"), (3L, "a c"), (4L, "b d"))
      .toDF("doc_id", "text")
    val got = TextQueries.unigramSurprisal(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ln4 = math.log(4)
    got.values.foreach(v => assert(math.abs(v - ln4) < 1e-8, s"got $v want $ln4"))
  }

  test("unigramSurprisal: docs of rarer tokens score higher") {
    val common = "the " * 50
    val rare = "rarest"
    val docs = Seq((1L, common.trim), (2L, rare)).toDF("doc_id", "text")
    val got = TextQueries.unigramSurprisal(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(2L) > got(1L))
  }

  test("pmiPairs: perfect co-occurrence pins ln(D/df); independence gives ~0") {
    // 8 docs: "x y" always together in 4 docs ⇒ pmi(x,y) = ln(8·4/(4·4)) = ln 2.
    // "p q" co-occur at chance: p in docs 1-4+5-6, q in 1-2+5-8 … keep it
    // simpler: p and q each in 4 docs, together in 2 ⇒ pmi = ln(8·2/16) = 0.
    val docs = Seq(
      (1L, "x y p q"), (2L, "x y p q"), (3L, "x y p"), (4L, "x y p"),
      (5L, "q z"), (6L, "q z"), (7L, "z w"), (8L, "z w"))
      .toDF("doc_id", "text")
    val got = TextQueries.pmiPairs(docs, minDf = 2, minPair = 1, topK = 100)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(math.abs(got(("x", "y")) - math.log(2)) < 1e-9)
    assert(math.abs(got(("p", "q")) - 0.0) < 1e-9)
    // df filter: words below minDf (here w, df=2) never appear in any pair
    val gotMin3 = TextQueries.pmiPairs(docs, minDf = 3, minPair = 1, topK = 100)
      .collect().map(r => Set(r.getString(0), r.getString(1))).toSet
    assert(gotMin3.flatten.forall(Set("x", "y", "p", "q", "z").contains _))
    assert(!gotMin3.flatten.contains("w"))
  }

  test("bigramSurprisal: closed form on a two-doc corpus; soup above prose") {
    // corpus = {"a b", "a b"}: c(a,b)=2, ctx(a)=2, V=2
    // ⇒ every bigram surprisal = ln((2+2)/(2+1)) = ln(4/3)
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextQueries.bigramSurprisal(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val want = math.log(4.0 / 3.0)
    got.values.foreach(v => assert(math.abs(v - want) < 1e-8, s"got $v want $want"))

    // repeated natural transitions score below never-repeated soup
    val corpus = (Seq.tabulate(20)(i => (i.toLong, "the cat sat on the mat")) :+
      (99L, "qq zz pp kk rr ww")).toDF("doc_id", "text")
    val scored = TextQueries.bigramSurprisal(corpus)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored(99L) > scored(0L))
  }

  test("unigramSurprisal/bigramSurprisal drop nothing vs the doc universe") {
    // every doc with >= 2 tokens appears exactly once in both outputs
    val docs = Seq((1L, "a b c"), (2L, "b c"), (3L, "a")).toDF("doc_id", "text")
    assert(TextQueries.unigramSurprisal(docs).count() === 3)
    val bg = TextQueries.bigramSurprisal(docs)
      .collect().map(_.getLong(0)).toSet
    assert(bg === Set(1L, 2L)) // the 1-token doc has no bigram, by contract
  }

  test("sourceVocabJaccard: hand-computed overlap") {
    // s1 vocab {a,b}, s2 {b,c}: |∩|=1, |∪|=3 ⇒ 1/3; s3 {x}: disjoint ⇒ no row
    // (inner pair join emits only intersecting pairs — pin that contract)
    val docs = Seq(
      (1L, "a b a", "s1"), (2L, "b c", "s2"), (3L, "x", "s3"))
      .toDF("doc_id", "text", "source")
    val got = TextQueries.sourceVocabJaccard(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(got === Map(("s1", "s2") -> (1.0 / 3 * 1e12).round / 1e12))
  }

  test("tfidfKeywords: distinctive terms outrank ubiquitous ones") {
    // "the" is in every doc (idf = 0); each doc's unique word must rank 1
    val docs = Seq(
      (1L, "the alpha the"), (2L, "the beta"), (3L, "the gamma"))
      .toDF("doc_id", "text")
    val top1 = TextQueries.tfidfKeywords(docs, topK = 1)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(top1 === Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
  }

  test("zipfSlope: an exact power law is recovered; slope -1 for 1/r counts") {
    // build a corpus whose word counts are exactly c(r) = 120/r for ranks
    // 1..4 (120,60,40,30): ln c = ln 120 − 1·ln r ⇒ slope = −1 exactly
    val words = Seq("w1" -> 120, "w2" -> 60, "w3" -> 40, "w4" -> 30)
    val text = words.flatMap { case (w, c) => Seq.fill(c)(w) }.mkString(" ")
    val docs = Seq((1L, text, "s")).toDF("doc_id", "text", "source")
    val got = TextQueries.zipfSlope(docs, topK = 4).collect().head
    assert(got.getLong(1) === 4L)
    assert(math.abs(got.getDouble(2) - (-1.0)) < 1e-9, got.toString)
  }

  test("giniTokenConcentration: 0 on uniform counts; closed form on (1,9)") {
    // uniform: every word count equal ⇒ G = 0 exactly.
    // skewed: counts (1, 9) sorted asc ⇒ G = (2·(1·1+2·9) − 3·10)/(2·10) = 0.4
    val docs = Seq(
      (1L, "a b c a b c", "uni"),
      (2L, ("y " + Seq.fill(9)("z").mkString(" ")), "skew"))
      .toDF("doc_id", "text", "source")
    val got = TextQueries.giniTokenConcentration(docs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("uni") === ((3L, 6L, 0.0)))
    assert(got("skew") === ((2L, 10L, 0.4)))
  }

  test("shinglePostings: df band gates, postings sorted ascending") {
    val docs = Seq(
      (3L, "a b c d"), (1L, "a b c"), (2L, "a b c"))
      .toDF("doc_id", "text")
    val got = TextQueries.shinglePostings(docs, n = 3, minDf = 2, maxDf = 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // "a b c" in all three docs; "b c d" is a singleton (below minDf)
    assert(got.toSeq === Seq(("a b c", 3L, "1,2,3")))
    // a hub above maxDf is dropped, not truncated
    assert(TextQueries.shinglePostings(docs, n = 3, minDf = 2, maxDf = 2).count() === 0L)
  }

  test("tokenEntropy: ln V on uniform tokens, 0 on a single repeated token") {
    val docs = Seq(
      (1L, "a b c d"),        // uniform over 4 → ln 4
      (2L, "z z z z z"))      // degenerate → 0
      .toDF("doc_id", "text")
    val got = TextQueries.tokenEntropy(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L)._1 === 4L && got(1L)._2 === 4L)
    assert(math.abs(got(1L)._3 - math.log(4.0)) < 1e-11, got.toString)
    assert(got(2L) === ((5L, 1L, 0.0)))
  }

  private object TokenKl {
    def of(docs: org.apache.spark.sql.DataFrame): Map[String, Double] =
      TextQueries.tokenKlDivergence(docs)
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
  }

  test("bpeMerges: hand-traced two rounds incl. overlapping-pair counting and greedy merge") {
    // corpus "aaab aaab ab": round 1 counts (a,a)=4 (overlaps counted:
    // 2 per "aaab"), (a,b)=3 -> merge (a,a). Greedy application turns
    // "a a a b" into "aa a b" (NOT "aa aa b"). Round 2: (aa,a)=2,
    // (a,b)=2+1=3 -> merge (a,b).
    val docs = Seq((1L, "aaab aaab ab", "s1")).toDF("doc_id", "text", "source")
    val merges = TextQueries.bpeMerges(docs, rounds = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(merges.toSeq === Seq((1, "a", "a", "aa", 4L), (2, "a", "b", "ab", 3L)))
  }

  test("bpeEncodeStats: fertility from the trained state") {
    // after the two merges above: "aaab" -> [aa, ab] (2 subwords),
    // "ab" -> [ab] (1) => 3 words, 5 subwords, 5/3
    val docs = Seq((1L, "aaab aaab ab", "s1")).toDF("doc_id", "text", "source")
    val r = TextQueries.bpeEncodeStats(docs, rounds = 2).collect().head
    assert(r.getString(0) === "s1")
    assert(r.getLong(1) === 3L && r.getLong(2) === 5L)
    assert(r.getAs[Double]("avg_subwords_per_word") === 1.666666667)
  }
}
