package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental (batch-vs-corpus) near-duplicate screening — the shape a
  * 100 TB ingest actually runs: today's delta is deduplicated against
  * the ACCUMULATED corpus without ever re-scanning it, by keeping only
  * the 64-slot MinHash signatures (512 B/doc — 10^10 docs ≈ 5 TB, a
  * side table) and joining the delta's LSH band keys against them.
  *
  * Contrast with [[graft.registry.LlmQueries]]' `llm_dedup_minhash`
  * (corpus self-dedup, candidates from a band SELF-join): here the join
  * is ASYMMETRIC — the batch side is small by construction, so its band
  * keys BROADCAST, and the corpus side is first SEMI-JOINED down to the
  * cells the batch actually touches before anything aggregates. The
  * corpus never joins itself; per-cell cost is bounded by `maxCell`.
  *
  * Verification is signature-level (matching permutation slots ≥
  * `minMatch` of 64 ⇒ estimated Jaccard ≥ minMatch/64): at signature-
  * store scale the gram sets are long gone, and n_match/64 is the
  * standard unbiased Jaccard estimator. The screen is therefore
  * probabilistic BY CONTRACT (the same contract every production
  * signature store accepts); a caller holding the delta's full text can
  * always exact-verify the reported pairs afterwards.
  *
  * Skew: a corpus band cell holding k exact duplicates would emit k
  * rows per colliding batch doc. Cells are capped to the `maxCell`
  * smallest corpus ids via [[TopK.smallestK]] — a map-side-combined
  * aggregate (shuffle ≤ maxCell entries per partition-cell, never the
  * cell itself). A batch doc colliding with an over-cap cell still sees
  * `maxCell` candidates — far more than needed to flag it — so recall
  * loss applies only to WHICH corpus twin is reported, never whether.
  *
  * Honest per-trigger cost: the screen still READS the signature store
  * once per batch (one columnar scan of (doc_id, sig) — the semi-join
  * prunes what aggregates, not what is read; band keys derive by
  * slicing, so the scan, not the CPU, is the cost). At 10^10 docs
  * that is the ~5 TB side-table scan per trigger — proportionate for
  * daily deltas, heavy for minute-level triggers. The disk-level fix
  * is the postings treatment ([[graft.query.TermIndex]]'s shape: band
  * keys as a key-clustered table probed by shard), worth building only
  * when trigger frequency × store size demands it; the store layout
  * here (sharded TxLog, key-ordered files) is already the layout that
  * index would cluster.
  */
object IncrementalDedup {

  /** Cap on corpus candidates per LSH band cell (see class doc). */
  val MaxCell = 64

  /** Signature slots that must agree to call a pair near-duplicate:
    * 32 of 64 ⇒ estimated Jaccard ≥ 0.5, matching the batch operators'
    * verify threshold. */
  val DupThreshold = 32

  /** (idCol, sig) → (idCol, band, bkey): the 16×4 banding of
    * [[MinHash]], band keys as joined strings (identical derivation to
    * the self-dedup operator so stores are interchangeable). */
  def bandKeys(sigs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val bandStructs = array((0 until MinHash.NumBands).map { bnd =>
      struct(lit(bnd).as("band"),
        concat_ws("_", slice(col("sig"), bnd * MinHash.BandRows + 1,
          MinHash.BandRows)).as("bkey"))
    }: _*)
    sigs.select(col(idCol), explode(bandStructs).as("b"))
      .select(col(idCol), col("b.band").as("band"), col("b.bkey").as("bkey"))
  }

  /** Matching-slot count of two equal-length signature arrays. */
  def slotMatches(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), (acc, v) => acc + v)

  /** Screen `batchSigs` (small: one delta) against `corpusSigs` (huge:
    * the signature store), both `(idCol, sig)`. Returns
    * `(b_id, c_id, n_match, est_jaccard)` for pairs with `n_match >=
    * minMatch`, where `b_id` is the batch doc and `c_id` its corpus
    * near-twin. Plan shape (asserted in `IncrementalDedupSpec`): batch
    * band keys broadcast TWICE (cell semi-join, then candidate join) —
    * the corpus side is never broadcast, never self-joined, and only
    * batch-touched cells reach the capping aggregate. */
  def screen(batchSigs: DataFrame, corpusSigs: DataFrame,
      idCol: String = "doc_id", minMatch: Int = DupThreshold,
      maxCell: Int = MaxCell): DataFrame = {
    val spark = batchSigs.sparkSession
    val bBands = bandKeys(batchSigs, idCol)
      .withColumnRenamed(idCol, "b_id")
    // corpus bands pruned to batch-touched cells BEFORE the capping
    // aggregate: the semi-join's broadcast side is |batch|×16 keys
    val touched = bBands.select("band", "bkey").distinct()
    val cBands = bandKeys(corpusSigs, idCol)
      .withColumnRenamed(idCol, "c_id")
      .join(broadcast(touched), Seq("band", "bkey"), "left_semi")
    // per-cell cap via the bounded top-k AGGREGATE (map-side combine;
    // a window row_number would sort whole cells in single tasks —
    // cells are exactly where the skew lives)
    val capped = cBands
      .groupBy("band", "bkey")
      .agg(TopK.smallestK(maxCell)(col("c_id"), col("c_id")).as("p"))
      .select(col("band"), col("bkey"),
        explode(transform(
          sequence(lit(1), (size(col("p")) / lit(2)).cast("int")),
          i => element_at(col("p"), i * 2))).as("c_id"))
    val cand = capped.join(broadcast(bBands), Seq("band", "bkey"))
      .select("b_id", "c_id").distinct()
    // attach both signatures: candidate-sized shuffle-hash joins with
    // the candidate side as build — the store is shuffled, not
    // broadcast, and never more than once per key column
    val jac = (col("n_match").cast("double") / MinHash.NumPerm)
      .as("est_jaccard")
    cand.hint("shuffle_hash")
      .join(batchSigs.select(col(idCol).as("b_id"), col("sig").as("sig_b")),
        "b_id")
      .hint("shuffle_hash")
      .join(corpusSigs.select(col(idCol).as("c_id"), col("sig").as("sig_c")),
        "c_id")
      .withColumn("n_match", slotMatches(col("sig_b"), col("sig_c")))
      .filter(col("n_match") >= minMatch)
      .select(col("b_id"), col("c_id"), col("n_match"), jac)
  }

  // ── signature store on the transaction log ─────────────────────────

  private val StoreShards = 16

  private def storeKey(idCol: Column): Column =
    concat((pmod(idCol, lit(StoreShards))).cast("string"), lit("#"),
      idCol.cast("string"))

  /** Upsert `(doc_id, sig)` rows into the TxLog-backed signature store
    * at `tablePath` (idempotent per doc — redelivery converges; the
    * store is partitioned by a doc-id shard so a delta touches at most
    * `StoreShards` partitions). */
  def mergeSignatures(spark: SparkSession, tablePath: String,
      sigs: DataFrame, idCol: String = "doc_id"): Unit =
    graft.sources.TxLog.merge(spark, tablePath,
      sigs.select(storeKey(col(idCol)).as("_docId"),
        pmod(col(idCol), lit(StoreShards)).cast("string").as("_shard"),
        col(idCol).cast("long").as("doc_id"), col("sig")),
      keyCol = "_docId", partitionCol = "_shard")

  /** Read the signature store back as `(doc_id, sig)`. */
  def loadSignatures(spark: SparkSession, tablePath: String): DataFrame =
    graft.sources.TxLog.read(spark, tablePath).select("doc_id", "sig")

  /** Per-doc signatures off raw text: tokenize → distinct 3-gram
    * shingles → 60-bit hashes → [[MinHash.minhash]] fold (one pass,
    * map-side combined). */
  def signaturesOf(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol),
        explode(Text.shingles(Text.tokens(col(textCol)))).as("gram"))
      .select(col(idCol), Text.hash60(col("gram")).as("g"))
      .groupBy(idCol)
      .agg(MinHash.minhash(col("g")).as("sig"))

  /** Streaming ingest dedup: per micro-batch, (1) screen the delta's
    * signatures against the store, (2) hand `(batch docs + is_dup flag
    * + best corpus match)` to `sink`, (3) merge the NOVEL docs'
    * signatures into the store so later batches screen against them —
    * the arrival order of batches defines who is "first" (the
    * reference's CDC consumers make the same choice; LWW on
    * redelivery). Batch-INTERNAL duplicates are screened too — the
    * delta self-screens (small×small) and the LOWER doc id wins, so
    * two copies arriving in one micro-batch yield one novel doc and
    * one flagged dup, exactly as if they had arrived in order. Docs too
    * short to shingle (< 3 tokens) carry no signature: they surface in
    * the sink as is_dup = false and are never stored — sub-shingle
    * dedup is exact-hash territory (`llm_dedup_exact`/BloomDedup), not
    * MinHash's. */
  def streamScreen(newDocs: DataFrame, storePath: String,
      sink: DataFrame => Unit, idCol: String = "doc_id",
      textCol: String = "text"): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val sigs = signaturesOf(batch, idCol, textCol)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val store =
            if (graft.sources.TxLog.isTable(spark, storePath))
              loadSignatures(spark, storePath)
            else sigs.limit(0)
          // store screen ∪ batch-internal self-screen (lower id wins;
          // self-pairs drop on the strict inequality). The store leg
          // needs its own b_id =!= c_id guard: foreachBatch is
          // at-least-once, so a batch replayed AFTER its signatures
          // merged (crash between mergeSignatures and the checkpoint
          // commit) finds every previously-novel doc in the store —
          // matching itself at n_match = 64, which would out-rank any
          // real twin and mark the doc a dup of itself. With the guard
          // the replay converges: self-matches drop, real twins (if
          // any) still surface, and the re-merge is idempotent.
          val hits = screen(sigs, store, idCol)
            .filter(col("b_id") =!= col("c_id"))
            .unionByName(screen(sigs, sigs, idCol)
              .filter(col("b_id") > col("c_id")))
            .groupBy(col("b_id").as(idCol))
            .agg(max(struct(col("n_match"), col("c_id"))).as("m"))
            .select(col(idCol), col("m.c_id").as("dup_of"),
              col("m.n_match").as("n_match"))
          // the sink contract covers EVERY batch doc: docs too short to
          // shingle (< 3 tokens, or empty) have no signature, cannot be
          // screened, and pass as is_dup = false with a null dup_of —
          // deriving the id set from `batch` (not from `sigs`) is what
          // keeps them from silently vanishing from the verdict frame
          val flagged = batch.select(col(idCol)).distinct()
            .join(hits, Seq(idCol), "left")
            .withColumn("is_dup", col("dup_of").isNotNull)
          sink(flagged)
          val novel = sigs.join(
            hits.select(col(idCol)), Seq(idCol), "left_anti")
          mergeSignatures(spark, storePath, novel, idCol)
        } finally { sigs.unpersist(); () }
      }
      .start()
}
