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
  * STORE LAYOUT — the postings treatment ([[graft.query.TermIndex]]'s
  * shape): the persistent store is a BAND-sharded [[graft.sources.TxLog]]
  * table, one row per (band, bkey, doc) with the doc's full signature
  * DENORMALIZED into the row (TermIndex denormalizes the doc length
  * into postings for the same reason: verification never joins a
  * corpus-sized side). A micro-batch probe then reads only
  *  - the SHARDS its band keys hash to (metadata-level partition
  *    pruning — decisive for tiny deltas), and
  *  - within them, only the FILES whose committed [minKey, maxKey]
  *    overlap a probed cell prefix ([[graft.sources.TxLog.read]]'s
  *    `keyPrefixes` skipping) — decisive at every delta size once
  *    [[graft.sources.TxLog.compact]] has key-clustered the store,
  *    because probed cells are a vanishing fraction of ~16 × 10^10
  *    total cells. A batch of 10^4 docs probes ≤ 160k cells → reads
  *    the ≤ 160k files holding them, not the store.
  * Writes are [[graft.sources.TxLog.append]] (insert-only commits,
  * Θ(batch) regardless of store size): signature rows are
  * content-determined by the doc, so an at-least-once replay re-inserts
  * byte-identical rows — readers dedup by doc id ([[TopK.smallestKSig]]
  * dedups inside the cap; [[loadSignatures]] dedups explicitly). A
  * keyed merge here would re-read and rewrite every touched shard each
  * trigger — a full-store rewrite, the write-side twin of the scan this
  * layout removes. The denormalization costs NumBands × |sig| storage
  * (≈ 8 KB/doc, an index ~16× the compact signatures) — the standard
  * inverted-index trade of disk for probe-time I/O.
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

  // ── band-sharded signature store (see class doc, STORE LAYOUT;
  //    plumbing shared with PhashDedup/EmbedDedup via BandStore) ─────

  /** Band-hash partition count (= [[BandStore.BandShards]], re-exported
    * for callers/specs). */
  val BandShards: Int = BandStore.BandShards

  /** This store's cell = (band, bkey); key-prefix parts zero-pad the
    * band number to 2 so cell keys sort band-major. */
  private def cell = Seq(col("band"), col("bkey"))
  private def prefixParts =
    Some(Seq(lpad(col("band").cast("string"), 2, "0"), col("bkey")))

  /** (idCol, sig) → (idCol, band, bkey, sig): [[bandKeys]] with the
    * signature carried through. */
  private def bandedWithSig(sigs: DataFrame, idCol: String): DataFrame = {
    val bandStructs = array((0 until MinHash.NumBands).map { bnd =>
      struct(lit(bnd).as("band"),
        concat_ws("_", slice(col("sig"), bnd * MinHash.BandRows + 1,
          MinHash.BandRows)).as("bkey"))
    }: _*)
    sigs.select(col(idCol), col("sig"), explode(bandStructs).as("b"))
      .select(col(idCol), col("b.band").as("band"),
        col("b.bkey").as("bkey"), col("sig"))
  }

  /** Fold `(doc_id, sig)` rows into the band store at `tablePath`:
    * one APPENDED row per (band, doc), sig denormalized. Insert-only by
    * contract — doc ids are content-stable (the funnels' exact-hash
    * tier keys identity by content), so replays re-insert identical
    * rows and readers dedup by id; cost is Θ(batch), never Θ(store). */
  def mergeSignatures(spark: SparkSession, tablePath: String,
      sigs: DataFrame, idCol: String = "doc_id"): Unit =
    BandStore.writeRows(spark, tablePath, bandedWithSig(sigs, idCol),
      idCol, cell,
      out = Seq(col("band"), col("bkey"),
        col(idCol).cast("long").as("doc_id"), col("sig")),
      prefixParts = prefixParts)

  /** Store maintenance — [[BandStore.optimize]] (compact to
    * key-clustered files + vacuum; row-invisible by spec). */
  def optimize(spark: SparkSession, tablePath: String): Unit =
    BandStore.optimize(spark, tablePath)

  /** Read the store back as one `(doc_id, sig)` row per doc (band-0
    * rows carry the full signature; append replays dedup here). */
  def loadSignatures(spark: SparkSession, tablePath: String): DataFrame =
    graft.sources.TxLog.read(spark, tablePath)
      .filter(col("band") === 0)
      .select("doc_id", "sig")
      .dropDuplicates("doc_id")

  /** [[screen]] against the PERSISTENT band store, reading only the
    * shards — and, under [[MaxProbeKeys]], only the key-clustered
    * files — the batch's band keys touch. Same output contract as
    * [[screen]]: `(b_id, c_id, n_match, est_jaccard)`, `n_match >=
    * minMatch`, candidates per cell capped to the `maxCell` smallest
    * distinct corpus ids. An absent store screens as empty. */
  def screenStore(batchSigs: DataFrame, storePath: String,
      idCol: String = "doc_id", minMatch: Int = DupThreshold,
      maxCell: Int = MaxCell): DataFrame = {
    val spark = batchSigs.sparkSession
    val bBands = bandedWithSig(batchSigs, idCol)
      .select(col(idCol).as("b_id"), col("band"), col("bkey"),
        col("sig").as("sig_b"))
    val store = BandStore.prunedRead(spark, storePath, bBands, cell,
        prefixParts) match {
      case None => return bBands.limit(0)
        .select(col("b_id"), lit(0L).as("c_id"), lit(0L).as("n_match"),
          lit(0.0).as("est_jaccard"))
      case Some(df) =>
        df.select(col("band"), col("bkey"), col("doc_id").as("c_id"),
          col("sig").as("sig_c"))
    }
    // rows from kept files still need the exact cell filter (file
    // skipping is superset-safe), then the bounded per-cell cap —
    // dedup-by-id inside the aggregate absorbs append replays
    val touched = bBands.select("band", "bkey").distinct()
    val capped = store
      .join(broadcast(touched), Seq("band", "bkey"), "left_semi")
      .groupBy("band", "bkey")
      .agg(TopK.smallestKSig(maxCell)(col("c_id"), col("sig_c")).as("p"))
      .select(col("band"), col("bkey"), explode(col("p")).as("q"))
      .select(col("band"), col("bkey"),
        col("q._1").as("c_id"), col("q._2").as("sig_c"))
    // verify off the denormalized signature — no corpus-sized join;
    // a pair colliding in several bands collapses on the group-by
    // (n_match is pair-determined, max = the value)
    capped.join(broadcast(bBands), Seq("band", "bkey"))
      .withColumn("n_match", slotMatches(col("sig_b"), col("sig_c")))
      .filter(col("n_match") >= minMatch)
      .groupBy("b_id", "c_id")
      .agg(max(col("n_match")).as("n_match"))
      .select(col("b_id"), col("c_id"), col("n_match"),
        (col("n_match").cast("double") / MinHash.NumPerm).as("est_jaccard"))
  }

  /** Per-doc signatures off raw text: tokenize → distinct 3-gram
    * shingles → 60-bit hashes → [[MinHash.minhash]] fold (one pass,
    * map-side combined). */
  def signaturesOf(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol),
        explode(Text.shingleHashes(Text.tokens(col(textCol)))).as("g"))
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
        // the [[BandStore.screenFold]] skeleton: pruned store probe ∪
        // batch-internal self-screen (lower id wins; self-pairs drop
        // on the strict inequality); the store leg's id self-matches
        // (a replay after its fold finds every previously-novel doc at
        // n_match = 64) are excluded from verdicts AND mark the docs
        // already stored, so replays converge growth-free. Docs too
        // short to shingle (< 3 tokens) carry no signature and pass
        // through the sink as is_dup = false (the verdict frame is
        // derived from `batch`, not from `sigs`).
        try BandStore.screenFold(batch, sigs, idCol,
          probe = screenStore(sigs, storePath, idCol),
          selfPairs = screen(sigs, sigs, idCol)
            .filter(col("b_id") > col("c_id")),
          bestAgg = max(struct(col("n_match"), col("c_id"))),
          bestCols = Seq(col("m.c_id").as("dup_of"),
            col("m.n_match").as("n_match")),
          sink = sink,
          foldNovel = novel => mergeSignatures(spark, storePath, novel, idCol))
        finally { sigs.unpersist(); () }
      }
      .start()
}
