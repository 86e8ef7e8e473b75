package graft.queries

import graft.{GraftQuery, Tables}
import graft.operators.Sharding
import org.apache.spark.sql.functions._

/** Training-data export surface: seeded global shuffle → round-robin
  * shards → hash-bucket splits ([[graft.operators.Sharding]]). The oracle
  * replays the identical scramble arithmetic (overflow-safe by
  * construction) and re-derives rank/shard/split with a window — DuckDB
  * can afford the single-node sort the operator's two-phase scan exists
  * to avoid.
  */
object ShardQueries {

  private val q84 = GraftQuery(
    "q84_shuffle_shard_split",
    (s, dir) =>
      Sharding.shuffleShards(
        Tables.documents(s, dir).select("doc_id"),
        "doc_id", nShards = 8, seed = 42L)
        .select(col("doc_id"), col("rank"), col("shard_id"),
          col("shard_pos"), col("split"))
        .orderBy("rank"),
    Some("""WITH r AS (
              SELECT doc_id,
                     (((doc_id + 42) % 1000000007) * 2654435761) % 1000000007 AS scr,
                     ((((doc_id + 43) % 1000000007) * 2246822519) % 1000000007) % 100 AS bucket
              FROM documents),
            ranked AS (
              SELECT doc_id, bucket,
                     row_number() OVER (ORDER BY scr, doc_id) - 1 AS rank
              FROM r)
            SELECT doc_id, CAST(rank AS BIGINT) AS rank,
                   CAST(rank % 8 AS INT) AS shard_id,
                   CAST(rank // 8 AS BIGINT) AS shard_pos,
                   CASE WHEN bucket < 90 THEN 'train'
                        WHEN bucket < 95 THEN 'val'
                        ELSE 'test' END AS split
            FROM ranked ORDER BY rank"""))

  def all: Seq[GraftQuery] = Seq(q84)
}
