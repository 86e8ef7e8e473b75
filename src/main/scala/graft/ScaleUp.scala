package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a ×`factor` scale-up of a testdata directory for the
  * self-scale probe: fact tables are unioned with key-shifted copies
  * (stride 10⁹ keeps every copy's key space disjoint while preserving
  * join consistency — a shifted order keeps its shifted lineitems), tiny
  * dimensions (region, nation) stay fixed like real dimensions do, and
  * embedding copies are deterministically perturbed so the scaled corpus
  * has realistic near-duplicate geometry instead of 10 exact clones per
  * vector. Documents ARE cloned verbatim — a heavily-duplicated corpus
  * is exactly what the dedup family must survive at scale.
  *
  * Usage: runMain graft.ScaleUp [srcDir] [outDir] [factor]
  */
object ScaleUp {

  private val Stride = 1000000000L

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sfx10")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.build("graft-scaleup", defaultCpus = "32")
    try write(spark, src, out, factor) finally spark.stop()
  }

  def write(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    def rd(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def land(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaleup] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }
    def shifted(df: DataFrame, keyCols: Seq[String]): DataFrame =
      (0 until factor).map { i =>
        keyCols.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(Stride * i)))
      }.reduce(_ unionByName _)

    // fixed dimensions: real scale-ups grow facts, not region/nation
    land("region", rd("region"))
    land("nation", rd("nation"))
    land("customer", shifted(rd("customer"), Seq("c_custkey")))
    land("supplier", shifted(rd("supplier"), Seq("s_suppkey")))
    land("part", shifted(rd("part"), Seq("p_partkey")))
    land("orders", shifted(rd("orders"), Seq("o_orderkey", "o_custkey")))
    land("lineitem",
      shifted(rd("lineitem"), Seq("l_orderkey", "l_partkey", "l_suppkey")))
    // single file: q81's AvailableNow drain asserts one micro-batch ⇔ one
    // file (the driver's testdata is single-file per table)
    land("events", shifted(rd("events"), Seq("event_id", "user_id")).coalesce(1))
    land("documents", shifted(rd("documents"), Seq("doc_id")))
    // perturb embedding copies (copy 0 stays exact): small deterministic
    // per-element noise keeps cosine structure but breaks exact cloning
    val emb = rd("embeddings")
    land("embeddings", (0 until factor).map { i =>
      val base = emb.withColumn("vec_id", col("vec_id") + lit(Stride * i))
      if (i == 0) base
      else base.withColumn("embedding",
        expr(s"transform(embedding, (x, j) -> CAST(x + 0.0005 * $i * cos(j + vec_id % 97) AS FLOAT))"))
    }.reduce(_ unionByName _))
  }
}
