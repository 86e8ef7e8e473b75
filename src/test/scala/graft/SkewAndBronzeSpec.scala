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
}
