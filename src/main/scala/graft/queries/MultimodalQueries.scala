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

  /** Pooled feature vectors from the (stubbed) decode. The decoded-feature
    * frame (media_id, embedding, embedding_json) is parquet-landed (per-run
    * path, see [[Landed]]) and the digests — dim, decimal-accumulated L2
    * norm, first component, md5 of the JSON form — are recomputed by BOTH
    * engines over the same landed arrays, so the digest arithmetic
    * (size/dot/element/md5) is cross-checked hash-exactly while the
    * splitmix64 sample stream stays engine-specific (its determinism,
    * shape, and normalization are pinned by MultimodalSpec). A `def` (and
    * `all` a def) so the oracle SQL dumped after the run embeds this run's
    * landing path.
    */
  private def q31 = GraftQuery(
    "q31_multimodal_features",
    (s, dir) => {
      val path = Landed.land("q31_multimodal_features", dir)
      Multimodal.extractFeatures(
        s, Multimodal.mediaFromDocuments(Tables.documents(s, dir)))
        .toDF()
        .withColumn("embedding_json", to_json(col("embedding")))
        .repartition(1) // see q24: empty-safe single part file
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .select(
          col("media_id"),
          size(col("embedding")).as("dim"),
          round(sqrt(graft.functions.Similarity.dotExact(
            col("embedding"), col("embedding"))), 12).as("l2_norm"),
          element_at(col("embedding"), 1).cast("double").as("e0"),
          md5(col("embedding_json")).as("feature_md5"))
        .orderBy("media_id")
    },
    Some(s"""SELECT media_id,
                    CAST(len(embedding) AS INT) AS dim,
                    round(sqrt(CAST(list_sum(list_transform(embedding,
                      x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,20)))) AS DOUBLE)), 12) AS l2_norm,
                    CAST(embedding[1] AS DOUBLE) AS e0,
                    md5(embedding_json) AS feature_md5
             FROM read_parquet('${Landed.oraclePath("q31_multimodal_features")}/*.parquet')
             ORDER BY media_id"""))

  def all: Seq[GraftQuery] = Seq(q30, q31)
}
