package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Written layout drives read-side pruning. */
class LayoutSpec extends SparkSpec {

  test("hive-partitioned write prunes directories on the partition predicate") {
    val root = Files.createTempDirectory("graft-layout").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    Layout.writePartitioned(events, s"$root/by_type", Seq("event_type"))

    assert(Layout.prunesPartitions(spark, s"$root/by_type", "event_type = 'click'"))
    assert(!Layout.prunesPartitions(spark, s"$root/by_type", "value > 5.0"))
    // directory layout is hive-style and the data round-trips
    assert(new java.io.File(s"$root/by_type/event_type=click").isDirectory)
    val back = spark.read.parquet(s"$root/by_type")
      .filter(col("event_type") === "click").count()
    assert(back === events.filter(col("event_type") === "click").count())
  }

  test("range-sorted write produces disjoint per-file min/max on the sort column") {
    val root = Files.createTempDirectory("graft-layout-range").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    Layout.writeRangeSorted(events, s"$root/by_user", "user_id", files = 4)

    // per-file ranges must not overlap (allow boundary equality)
    val ranges = spark.read.parquet(s"$root/by_user")
      .select(col("user_id"), input_file_name().as("f"))
      .groupBy("f").agg(min("user_id").as("lo"), max("user_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length === 4)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ => ()
    }
    assert(spark.read.parquet(s"$root/by_user").count() === events.count())
  }
}
