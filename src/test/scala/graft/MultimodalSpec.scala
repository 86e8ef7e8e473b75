package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, determinism, batch shape, and the
  * partition-preserving property of the mapPartitions decode path.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.mediaFromDocuments(
    Seq((1L, "abc"), (2L, "abcd"), (3L, "abcde"), (4L, "x" * 100))
      .toDF("doc_id", "text"))

  test("withMeta derives format/geometry from bytes deterministically") {
    val meta = Multimodal.withMeta(spark, media).collect().map(m => m.media_id -> m).toMap
    assert(meta(1L).format === "img")     // 3 bytes % 3 == 0
    assert(meta(2L).format === "audio")   // 4 % 3 == 1
    assert(meta(3L).format === "video")   // 5 % 3 == 2
    assert(meta(1L).byte_len === 3L)
    assert(meta(1L).width === 4 + 3 % 5 && meta(1L).height === 4 + 3 % 3)
    assert(meta(3L).n_frames === 8 && meta(1L).n_frames === 1)
  }

  test("extractFeatures: fixed dim, L2-normalized, run-to-run identical") {
    val a = Multimodal.extractFeatures(spark, media, dim = 16).collect()
      .map(f => f.media_id -> f.embedding.toSeq).toMap
    val b = Multimodal.extractFeatures(spark, media, dim = 16).collect()
      .map(f => f.media_id -> f.embedding.toSeq).toMap
    assert(a === b)
    a.values.foreach { e =>
      assert(e.length === 16)
      val n = math.sqrt(e.map(v => v.toDouble * v).sum)
      assert(math.abs(n - 1.0) < 1e-5)
    }
  }

  test("sampleFrames strides video frames, passes single-frame media through") {
    val frames = Multimodal.sampleFrames(spark, media, stride = 2).collect()
      .groupBy(_.media_id).view.mapValues(_.map(_.frame_idx).sorted.toSeq).toMap
    assert(frames(3L) === Seq(0, 2, 4, 6)) // video: 8 frames, stride 2
    assert(frames(1L) === Seq(0))          // img: 1 frame
  }

  test("decode path preserves partitioning (no shuffle in mapPartitions)") {
    val df = media.repartition(3)
    assert(Multimodal.extractFeatures(spark, df).rdd.getNumPartitions === 3)
  }
}
