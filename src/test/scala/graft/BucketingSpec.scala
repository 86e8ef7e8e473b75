package graft

import graft.operators.Bucketing
import java.nio.file.Files

/** Bucketed tables make the repeated equi-join shuffle-free: the shuffle
  * is paid once at write time, every subsequent join on the bucket key
  * plans without an Exchange.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-located join of bucketed tables plans without a shuffle exchange") {
    val root = Files.createTempDirectory("graft-buckets").toString
    val fact = (1L to 10000L).map(i => (i % 500, i)).toDF("k", "v")
    val dim = (0L until 500L).map(k => (k, s"d$k")).toDF("k", "name")
    val oldBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid the broadcast shortcut so the shuffle decision is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Bucketing.writeBucketed(fact, "b_fact", 4, Seq("k"),
        sortCols = Seq("k"), path = Some(s"$root/fact"))
      Bucketing.writeBucketed(dim, "b_dim", 4, Seq("k"),
        sortCols = Seq("k"), path = Some(s"$root/dim"))

      val colocated = Bucketing.colocatedJoin(spark, "b_fact", "b_dim", Seq("k"))
      val plain = fact.join(dim, Seq("k"))
      assert(!Bucketing.hasShuffle(colocated),
        s"bucketed join should not shuffle:\n${colocated.queryExecution.executedPlan}")
      assert(Bucketing.hasShuffle(plain), "unbucketed SMJ join should shuffle")
      assert(colocated.count() === plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_fact")
      spark.sql("DROP TABLE IF EXISTS b_dim")
    }
  }
}
