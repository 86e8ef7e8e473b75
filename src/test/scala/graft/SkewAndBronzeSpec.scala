package graft

import graft.operators.SkewJoin
import graft.streaming.StreamingBronzeLoad
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Salted-join equivalence and streaming bronze-load idempotence. */
class SkewAndBronzeSpec extends SparkSpec {
  import spark.implicits._

  test("saltedEquiJoin == plain join on a skewed key distribution") {
    // 10k rows of one hot key + a tail, joined to a small dim
    val probe = ((1 to 10000).map(_ => 1L) ++ (2L to 100L)).toDF("k")
      .withColumn("v", monotonically_increasing_id())
    val build = (1L to 100L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val salted = SkewJoin.saltedEquiJoin(probe, build, Seq("k"), factor = 8)
      .select("k", "v", "name")
    val plain = probe.join(build, Seq("k")).select("k", "v", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("streaming bronze load: re-delivered keys land exactly once") {
    val root = Files.createTempDirectory("graft-bronze").toString
    val src = s"$root/src"
    val bronze = s"$root/bronze"
    val ckpt = s"$root/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))

    Seq(("tx_1", 100L), ("tx_2", 200L)).toDF("id", "amount")
      .write.mode("append").parquet(src)
    StreamingBronzeLoad.run(spark, src, bronze, "id", ckpt)
    // second delivery overlaps (tx_2 again) — the reference's 30-day
    // re-extraction window in miniature
    Seq(("tx_2", 200L), ("tx_3", 300L)).toDF("id", "amount")
      .write.mode("append").parquet(src)
    StreamingBronzeLoad.run(spark, src, bronze, "id", ckpt)

    val got = spark.read.parquet(bronze)
    assert(got.count() === 3)
    assert(got.select("id").as[String].collect().sorted === Array("tx_1", "tx_2", "tx_3"))
    assert(got.columns.contains("date_retrieved"))
  }

  test("bloom semi-join: equals plain join, actually prunes the fact side") {
    import spark.implicits._
    val fact = (0 until 5000).map(i => (i.toLong % 500, i.toLong)).toDF("fk", "payload")
    val dim = (0 until 25).map(i => (i.toLong * 17, s"d$i")).toDF("dk", "name")

    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "name").collect().map(_.toString).sorted
    val bloomed = graft.operators.BloomSemiJoin
      .reduceThenJoin(fact, "fk", dim, "dk", expectedKeys = 100L, fpp = 0.01)
      .select("fk", "payload", "name").collect().map(_.toString).sorted
    assert(bloomed === plain)

    val kept = graft.operators.BloomSemiJoin
      .prefilter(fact, "fk", dim, "dk", expectedKeys = 100L, fpp = 0.01).count()
    // 25 of 500 keys qualify (5%); with fpp=1% the prefilter must drop the
    // overwhelming majority of fact rows
    assert(kept < 1000, s"bloom kept $kept of 5000 rows")
  }
}
