package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental batch-vs-corpus deduplication with a Bloom-filter screen.
  *
  * The canonical shape for "is this incoming document already in the
  * 100 TB standing corpus?": the corpus text itself NEVER shuffles —
  * one tree-aggregated pass builds a Bloom filter over the corpus keys
  * (partial filters OR-merged map-side, one `numBits/8`-byte blob at the
  * root), the incoming batch is screened against it as a scalar
  * subquery (Spark's own `BloomFilterMightContain`, the same expression
  * the engine injects for runtime row-group filtering), and only the
  * screened survivors — true duplicates plus the fpp·|batch| false
  * positives — reach the exact-confirm equi-join. Rows the screen
  * rejects are DEFINITIVELY new (a Bloom filter has no false
  * negatives), so the final answer is exact: the filter only prunes the
  * join's build input.
  *
  * At 1000-executor scale the single-blob filter holds to ~10^9 corpus
  * keys (1.2 GB at 10 bits/key); past that, shard the aggregate by
  * `pmod(xxhash64(k), S)` and screen each batch row against its shard's
  * blob — the confirm join below is unchanged. Reference behavior: the
  * VAMS indexer dedupes per-key by idempotent overwrite
  * (backend/backend/handlers/indexing/streams.py upsert path); this
  * operator is the corpus-scale generalization the BASELINE adds.
  */
object BloomDedup {

  /** Flags each `batch` row with `is_dup`: whether its `keyCol` value
    * occurs in `ref`'s `keyCol` column. Exact semantics (equivalent to
    * `batch.join(ref, key, "left_semi")` membership), Bloom-screened so
    * only candidate rows shuffle into the confirm join.
    *
    * @param estItems  expected distinct corpus keys (sizes the filter)
    * @param numBits   Bloom filter size in bits (blob = numBits/8 bytes)
    */
  def flagDups(
      batch: DataFrame,
      ref: DataFrame,
      keyCol: String,
      estItems: Long = 1L << 20,
      numBits: Long = 1L << 23): DataFrame = {
    val spark = batch.sparkSession
    graft.functions.GraftFunctions.register(spark)

    // One aggregation pass over the corpus keys; lands as a scalar
    // subquery so the whole operator stays a single declarative plan
    // (no driver round-trip — the blob flows root→broadcast).
    val bloom: Column = ref
      .agg(call_function("graft_bloom_agg",
        xxhash64(col(keyCol)), lit(estItems), lit(numBits)).as("bf"))
      .scalar()

    // One pass, one join: screen-rejected rows keep a per-row sentinel
    // join key (NUL-prefixed per-row hash — ref keys are tokenized
    // text, which cannot contain NUL) so they flow through the same
    // equi-join as candidates and simply never match. This avoids a
    // union of two batch re-scans AND keeps the miss majority spread
    // across all partitions (a shared null/constant key would funnel
    // every miss into one reducer — the classic null-skew kill).
    // Candidates are confirmed against the DISTINCT corpus keys —
    // dedup before the join keeps the probe side from fanning out on
    // corpus-internal duplicates.
    val refKeys = ref.select(col(keyCol).as("__ref_k")).distinct()
    val cand = coalesce(
      call_function("graft_bloom_contains", bloom, xxhash64(col(keyCol))), lit(false))
    batch
      .withColumn("__jk", when(cand, col(keyCol))
        .otherwise(concat(lit("\u0000"), xxhash64(struct(batch.columns.map(col): _*)))))
      .join(refKeys.withColumn("__hit", lit(true)),
        col("__jk") === col("__ref_k"), "left")
      .withColumn("is_dup", coalesce(col("__hit"), lit(false)))
      .drop("__jk", "__ref_k", "__hit")
  }

  /** The >10⁹-keys scale path promised by [[flagDups]]'s doc: the
    * corpus Bloom is SHARDED by `pmod(xxhash64(k), shards)`, so no
    * single blob must hold the whole key space — each shard's filter
    * sizes to `estItems` keys, and total filter memory spreads across
    * the S-row shard table instead of one driver-bounded blob. Each
    * batch row joins its shard's blob (the shard table broadcasts: S ×
    * numBits/8 bytes) and probes it with `graft_bloom_probe` — the
    * column-valued cousin of `might_contain`, with per-executor
    * deserialization caching. Same exactness contract as [[flagDups]]:
    * the screen only prunes the confirm join's probe side. */
  def flagDupsSharded(
      batch: DataFrame,
      ref: DataFrame,
      keyCol: String,
      shards: Int = 8,
      estItems: Long = 1L << 17,
      numBits: Long = 1L << 20): DataFrame = {
    val spark = batch.sparkSession
    graft.functions.GraftFunctions.register(spark)
    require(shards > 0, s"shards must be positive, got $shards")

    val shardOf = pmod(xxhash64(col(keyCol)), lit(shards.toLong))
    val blooms = ref.groupBy(shardOf.as("__shard"))
      .agg(call_function("graft_bloom_agg",
        xxhash64(col(keyCol)), lit(estItems), lit(numBits)).as("__bf"))

    val refKeys = ref.select(col(keyCol).as("__ref_k")).distinct()
    val withBlob = batch.withColumn("__shard", shardOf)
      .join(broadcast(blooms), Seq("__shard"), "left")
    val cand = coalesce(
      call_function("graft_bloom_probe", col("__bf"), xxhash64(col(keyCol))),
      lit(false))
    withBlob
      .withColumn("__jk", when(cand, col(keyCol))
        .otherwise(concat(lit("\u0000"),
          xxhash64(struct(batch.columns.map(col): _*)))))
      .join(refKeys.withColumn("__hit", lit(true)),
        col("__jk") === col("__ref_k"), "left")
      .withColumn("is_dup", coalesce(col("__hit"), lit(false)))
      .drop("__shard", "__bf", "__jk", "__ref_k", "__hit")
  }
}
