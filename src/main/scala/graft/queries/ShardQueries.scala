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

  /** Consistent-hash resharding audit (Karger et al. 1997): assign every
    * user key to a shard via a hash ring (32 virtual nodes per shard,
    * portable md5 positions), once for 8 shards and once for 10, and
    * measure the MOVED fraction against the naive `key mod n` scheme —
    * the number that justifies ring-based sharding for any stateful
    * service: consistent hashing moves ≈ 1 − 8/10 of keys on a 8→10
    * rebalance where mod moves ~90%.
    *
    * Plan shape: the vnode rings are tiny broadcast tables (256 + 320
    * rows); each key's successor vnode is one broadcast non-equi join +
    * min (the q160 bounded-fan BNLJ contract — fan-out is the ring size,
    * never the corpus), with the ring's wraparound folded in as a global
    * min fallback. All positions are 60-bit integers from the portable
    * md5, so DuckDB rebuilds both rings and every assignment exactly.
    */
  private val VnodesPerShard = 32
  private def ringAssign(
      s: org.apache.spark.sql.SparkSession,
      keys: org.apache.spark.sql.DataFrame, // (k, kpos)
      nShards: Int,
      outCol: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val vnodes = broadcast(
      (0 until nShards).flatMap(sh => (0 until VnodesPerShard).map(v => (sh, v)))
        .toDF("shard", "vn")
        .select(col("shard"),
          expr(s"conv(substring(md5(concat('ring$nShards/s:', cast(shard as string), '/v:', cast(vn as string))), 1, 15), 16, 10)")
            .cast("long").as("vpos")))
    // successor vnode: smallest vpos >= kpos; wraparound -> globally
    // smallest vpos. min(struct) carries the shard along deterministically
    // (vpos collisions are 2^-60-improbable; the struct breaks them by id).
    val succ = keys.join(vnodes, col("vpos") >= col("kpos"), "left")
      .groupBy("k", "kpos")
      .agg(min(struct(col("vpos"), col("shard"))).as("sv"))
      .select(col("k"), col("kpos"), col("sv.shard").as("succ_shard"))
    val wrap = vnodes.orderBy("vpos", "shard").limit(1)
      .select(col("shard").as("wrap_shard"))
    succ.crossJoin(broadcast(wrap))
      .select(col("k"), col("kpos"),
        coalesce(col("succ_shard"), col("wrap_shard")).as(outCol))
  }

  private val q261 = GraftQuery(
    "q261_consistent_hash_reshard",
    (s, dir) => {
      val keys = Tables.events(s, dir).select(col("user_id").as("k")).distinct()
        .withColumn("kpos",
          expr("conv(substring(md5(concat('key:', cast(k as string))), 1, 15), 16, 10)")
            .cast("long"))
      val a8 = ringAssign(s, keys, 8, "shard8")
      val a10 = ringAssign(s, keys, 10, "shard10").drop("kpos")
      val joined = a8.join(a10, "k")
        .select(col("k"), col("shard8"), col("shard10"),
          (col("k") % 8 =!= col("k") % 10).cast("long").as("mod_moved"),
          (col("shard8") =!= col("shard10")).cast("long").as("ring_moved"))
      joined.agg(
          count(lit(1)).as("n_keys"),
          sum(col("ring_moved")).as("ring_moved"),
          sum(col("mod_moved")).as("mod_moved"))
        .select(col("n_keys"), col("ring_moved"),
          round(col("ring_moved").cast("double") / col("n_keys").cast("double"), 12)
            .as("ring_moved_frac"),
          col("mod_moved"),
          round(col("mod_moved").cast("double") / col("n_keys").cast("double"), 12)
            .as("mod_moved_frac"))
    },
    Some {
      def ringSql(n: Int, alias: String) =
        s"""$alias AS (
             SELECT sh.shard,
                    ('0x' || substr(md5('ring$n/s:' || CAST(sh.shard AS VARCHAR)
                      || '/v:' || CAST(v.vn AS VARCHAR)), 1, 15))::BIGINT AS vpos
             FROM (SELECT unnest(range(0, $n)) AS shard) sh
             CROSS JOIN (SELECT unnest(range(0, $VnodesPerShard)) AS vn) v)"""
      def assignSql(ring: String, out: String) =
        s"""SELECT k.k, k.kpos,
              coalesce(
                (SELECT r.shard FROM $ring r WHERE r.vpos >= k.kpos
                 ORDER BY r.vpos, r.shard LIMIT 1),
                (SELECT r.shard FROM $ring r ORDER BY r.vpos, r.shard LIMIT 1))
                AS $out
            FROM keys k"""
      s"""WITH keys AS (
            SELECT DISTINCT user_id AS k,
                   ('0x' || substr(md5('key:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                     AS kpos
            FROM events),
          ${ringSql(8, "ring8")},
          ${ringSql(10, "ring10")},
          a8 AS (${assignSql("ring8", "shard8")}),
          a10 AS (${assignSql("ring10", "shard10")}),
          j AS (
            SELECT a8.k, a8.shard8, a10.shard10,
                   CASE WHEN a8.k % 8 <> a8.k % 10 THEN 1 ELSE 0 END AS mod_moved,
                   CASE WHEN a8.shard8 <> a10.shard10 THEN 1 ELSE 0 END AS ring_moved
            FROM a8 JOIN a10 ON a8.k = a10.k)
          SELECT count(*) AS n_keys,
                 CAST(sum(ring_moved) AS BIGINT) AS ring_moved,
                 round(CAST(sum(ring_moved) AS DOUBLE) / CAST(count(*) AS DOUBLE), 12)
                   AS ring_moved_frac,
                 CAST(sum(mod_moved) AS BIGINT) AS mod_moved,
                 round(CAST(sum(mod_moved) AS DOUBLE) / CAST(count(*) AS DOUBLE), 12)
                   AS mod_moved_frac
          FROM j"""
    })

  def all: Seq[GraftQuery] = Seq(q84, q261)
}
