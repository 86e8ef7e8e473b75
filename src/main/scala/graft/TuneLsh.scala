package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-probe tuning harness for the LSH knn-graph constructor: times
  * candidate generation + re-rank at the given scale dir for a grid of
  * (bits, tables) and reports candidate volume and recall vs a
  * brute-force sample, so the production knobs are measured, not
  * guessed. Usage: runMain graft.TuneLsh <sfDir> <bits,tables>...
  */
object TuneLsh {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sfx10")
    val grid = args.drop(1).map { s =>
      val Array(b, t) = s.split(","); (b.toInt, t.toInt)
    }.toSeq match { case Nil => Seq((7, 16), (9, 16), (9, 24)); case g => g }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir).cache()
    val n = emb.count()
    println(s"[tune] n=$n")
    // brute-force ground truth on a 200-query sample for recall
    val sample = emb.orderBy(xxhash64(col("vec_id"))).limit(200).cache()
    sample.count()
    val bf = graft.operators.NearDup.knnBruteForce(sample, emb, 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((bits, tables) <- grid) {
      val t0 = System.nanoTime()
      val g = graft.operators.NearDup.knnTopKLsh(emb, k = 5, bits = bits, tables = tables)
        .cache()
      val edges = g.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val got = g.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = bf.count(got.contains).toDouble / bf.size
      println(f"[tune] bits=$bits tables=$tables edges=$edges time=$secs%.1fs recall@5(sampled)=$recall%.3f")
      g.unpersist()
    }
    spark.stop()
  }
}
