package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join via bucket expansion.
  *
  * Spark plans a bare `p.ts BETWEEN i.start AND i.end` join as broadcast
  * nested loop (fine while the interval side is small) or cartesian — a
  * scale cliff when both sides are large. The standard fix is to make the
  * join an equi-join: replicate each interval into the fixed-width buckets
  * it covers, bucket each point, hash-join on the bucket, and re-check the
  * exact predicate. Shuffle cost is |points| + |intervals|·(avg span /
  * bucketWidth); each (point, interval) match arises in exactly one bucket
  * (the point's own), so no post-join dedup is needed.
  *
  * Pick `bucketWidth` near the typical interval length: too small inflates
  * the interval replication, too large degrades bucket selectivity (more
  * false candidates re-checked). A single interval spanning the whole
  * domain still replicates everywhere — cap outliers upstream or route
  * them through a broadcast side union.
  */
object RangeJoin {

  private val Bucket = "__graft_rj_bucket"

  /** Inner join of `points` to every interval with
    * `start <= point <= end`, both expressed as LONG columns (epoch
    * micros, sequence numbers, ...). Floor-division bucketing, so negative
    * coordinates stay aligned.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def floorDiv(c: String) =
      expr(s"($c - pmod($c, ${bucketWidth}L)) div ${bucketWidth}L")
    val ib = intervals.withColumn(Bucket,
      explode(sequence(floorDiv(startCol), floorDiv(endCol))))
    val pb = points.withColumn(Bucket, floorDiv(pointCol))
    pb.join(ib, Seq(Bucket))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop(Bucket)
  }
}
