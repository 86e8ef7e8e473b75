package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (driver north star §2b): media payloads travel
  * as opaque `binary` columns plus typed metadata, and all per-item media
  * work (decode, feature-extract, resize, frame-sample) runs batched inside
  * `mapPartitions` so a 100 TB corpus streams through executors without
  * driver involvement and with one decoder context per partition (the Scala
  * analog of a Pandas-batched UDF).
  *
  * DECODE IS STUBBED: this container has no image/audio codecs, so
  * [[FakeDecoder]] derives a deterministic pseudo-media from the bytes
  * (size-dependent dimensions, hash-derived samples). The Spark-side
  * contract — schema, batching, partitioning, feature shapes — is real and
  * tested; swapping in a real codec is a one-class change behind
  * [[MediaDecoder]].
  */
object Multimodal {

  /** Typed metadata carried alongside every media blob. */
  final case class MediaMeta(
      media_id: Long,
      format: String,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Decoded representation: row-major luma-like samples per frame. */
  final case class Decoded(width: Int, height: Int, frames: Array[Array[Float]])

  /** The pluggable decode boundary — implement per real codec. */
  trait MediaDecoder extends Serializable {
    def sniffFormat(bytes: Array[Byte]): String
    def decode(bytes: Array[Byte]): Decoded
  }

  /** Deterministic stand-in decoder: dimensions from byte length, samples
    * from a splitmix64 stream seeded by the content — NOT a real codec (see
    * object Scaladoc), but stable across runs/partitions so tests can
    * assert exact outputs.
    */
  object FakeDecoder extends MediaDecoder {
    import graft.functions.Sketches.splitmix64

    override def sniffFormat(bytes: Array[Byte]): String =
      if (bytes.length % 3 == 0) "img" else if (bytes.length % 3 == 1) "audio" else "video"

    override def decode(bytes: Array[Byte]): Decoded = {
      val w = 4 + (bytes.length % 5)
      val h = 4 + (bytes.length % 3)
      val nFrames = if (sniffFormat(bytes) == "video") 8 else 1
      var seed = bytes.foldLeft(1469598103934665603L)((a, b) => (a ^ b) * 1099511628211L)
      val frames = Array.fill(nFrames) {
        Array.fill(w * h) {
          seed = splitmix64(seed)
          ((seed >>> 40).toInt & 0xFF) / 255.0f
        }
      }
      Decoded(w, h, frames)
    }
  }

  /** Attach typed metadata to (media_id, payload) rows — one decoder per
    * partition, batched row iteration, no driver round trips.
    */
  def withMeta(
      spark: SparkSession, media: DataFrame,
      decoder: MediaDecoder = FakeDecoder): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("media_id").as[Long], col("payload").as[Array[Byte]])
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val d = decoder.decode(bytes)
          MediaMeta(id, decoder.sniffFormat(bytes), bytes.length.toLong,
            d.width, d.height, d.frames.length)
        }
      }
  }

  final case class MediaFeatures(media_id: Long, embedding: Array[Float])

  /** Decode + pool each item into a fixed-dim feature vector (mean-pooled
    * sample blocks, L2-normalized) — the shape a real vision/audio encoder
    * would produce, ready for [[NearDup.knnBruteForce]] /
    * [[NearDup.embeddingNearDupLsh]] downstream.
    */
  def extractFeatures(
      spark: SparkSession, media: DataFrame, dim: Int = 16,
      decoder: MediaDecoder = FakeDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id").as[Long], col("payload").as[Array[Byte]])
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val d = decoder.decode(bytes)
          val flat = d.frames.flatten
          val feat = Array.tabulate(dim) { k =>
            var s = 0.0f
            var i = k
            while (i < flat.length) { s += flat(i); i += dim }
            s
          }
          val norm = math.sqrt(feat.foldLeft(0.0)((a, v) => a + v.toDouble * v)).toFloat
          MediaFeatures(id, if (norm == 0f) feat else feat.map(_ / norm))
        }
      }
  }

  /** Sample every `stride`-th frame of video items (frame-sampling stage of
    * a video pipeline; pass-through for single-frame media).
    */
  final case class FrameSample(media_id: Long, frame_idx: Int, width: Int, height: Int)

  def sampleFrames(
      spark: SparkSession, media: DataFrame, stride: Int,
      decoder: MediaDecoder = FakeDecoder): Dataset[FrameSample] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import spark.implicits._
    media.select(col("media_id").as[Long], col("payload").as[Array[Byte]])
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val d = decoder.decode(bytes)
          d.frames.indices.by(stride).map(i => FrameSample(id, i, d.width, d.height))
        }
      }
  }

  /** The harness ships no binary table; derive one from `documents` (UTF-8
    * payloads) — the plumbing under test is byte-domain and agnostic to
    * what produced the bytes.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"))
}
