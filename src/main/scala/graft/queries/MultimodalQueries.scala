package graft.queries

import graft.{GraftQuery, Tables}
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column surface (driver north star §2b): opaque binary
  * payloads + typed metadata + batched partition-wise featurization. The
  * payloads are derived from `documents` (the harness ships no binary
  * table); the operators are byte-domain and don't care.
  */
object MultimodalQueries {

  /** Typed metadata per media item. The fake decoder's geometry is a pure
    * function of byte length, so the whole operator — including the
    * mapPartitions decode path — is oracle-checkable end to end.
    */
  private val q30 = GraftQuery(
    "q30_multimodal_meta",
    (s, dir) =>
      Multimodal.withMeta(s, Multimodal.mediaFromDocuments(Tables.documents(s, dir)))
        .toDF()
        .orderBy("media_id"),
    Some("""SELECT doc_id AS media_id,
                   CASE octet_length(encode(text)) % 3
                     WHEN 0 THEN 'img' WHEN 1 THEN 'audio' ELSE 'video' END AS format,
                   octet_length(encode(text)) AS byte_len,
                   CAST(4 + octet_length(encode(text)) % 5 AS INT) AS width,
                   CAST(4 + octet_length(encode(text)) % 3 AS INT) AS height,
                   CAST(CASE WHEN octet_length(encode(text)) % 3 = 2 THEN 8 ELSE 1 END AS INT)
                     AS n_frames
            FROM documents ORDER BY media_id"""))

  /** Pooled feature vectors from the (stubbed) decode — rows-only; the
    * MultimodalSpec asserts determinism, shape, and L2 normalization.
    * The vector is emitted as a JSON string plus scalar digests (dim, L2
    * norm, first component) — array columns aren't comparable downstream,
    * and the JSON form is deterministic (single JVM float formatting).
    */
  private val q31 = GraftQuery(
    "q31_multimodal_features",
    (s, dir) =>
      Multimodal.extractFeatures(
        s, Multimodal.mediaFromDocuments(Tables.documents(s, dir)))
        .toDF()
        .select(
          col("media_id"),
          size(col("embedding")).as("dim"),
          round(sqrt(graft.functions.Similarity.dotFast(
            col("embedding"), col("embedding"))), 6).as("l2_norm"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("e0"),
          to_json(col("embedding")).as("embedding_json"))
        .orderBy("media_id"),
    None)

  val all: Seq[GraftQuery] = Seq(q30, q31)
}
