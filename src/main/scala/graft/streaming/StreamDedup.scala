package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llmops.{MinHash, Text}

/** Incremental (streaming) MinHash near-dup detection — the micro-batch
  * twin of `llm_dedup_minhash`: new documents are checked against
  * EVERYTHING seen so far without ever recomputing the corpus.
  *
  * Reference analogue: the indexer's change-driven incremental update
  * (`backend/backend/handlers/indexing/assetIndexer.py:602-737` — new
  * truth is merged into the standing index, never a full rebuild);
  * applied here to the dedup surface instead of the search surface.
  *
  * Per micro-batch (drive from `foreachBatch`, same pattern as
  * [[DocMaintenance]]):
  *  1. signatures: one-pass MinHash aggregate over the batch's shingle
  *     hashes — map-side combined, 64 longs per doc over the shuffle;
  *  2. idempotence: docs already in the band index are dropped
  *     (anti-join on doc_id), so at-least-once redelivery emits nothing
  *     twice and state never duplicates;
  *  3. candidates: batch bands equi-join the standing index on
  *     (band, bkey) — ONLY collisions shuffle — plus the within-batch
  *     self-join; pairs are emitted (min, max)-ordered;
  *  4. state append: the batch's bands join the index.
  *
  * The cumulative emitted pairs after any prefix of batches equal the
  * batch-mode band-collision pairs over the union of those batches
  * (`StreamDedupSpec` asserts set equality against the full recompute) —
  * each pair surfaces exactly when its LATER document arrives.
  *
  * Scale notes: the band index is the only state, ~NumBands rows × a
  * band-key string per doc, stored as a parquet table; at 100 TB it is
  * the bucketed-by-bkey side table the candidate join co-locates with
  * (see `graft.sources.Bucketing` for the layout pattern). Nothing here
  * reads the historical CORPUS — only its banded fingerprints.
  */
object StreamDedup {

  /** (doc_id, band, bkey) band rows of a (doc_id, text) frame. Docs with
    * no shingles (under 3 tokens) produce no bands — an all-P signature
    * would otherwise spuriously collide every short doc. */
  def bands(docs: DataFrame): DataFrame = {
    val sig = docs
      .select(col("doc_id"),
        Text.shingleHashes(Text.tokens(col("text"))).as("grams"))
      .filter(size(col("grams")) > 0)
      .select(col("doc_id"), explode(col("grams")).as("g"))
      .groupBy("doc_id").agg(MinHash.minhash(col("g")).as("sig"))
    val bandStructs = array((0 until MinHash.NumBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until MinHash.BandRows).map(r =>
          element_at(col("sig"), b * MinHash.BandRows + r + 1)): _*).as("bkey"))
    }: _*)
    sig.select(col("doc_id"), explode(bandStructs).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
  }

  private def indexPath(stateDir: String) = s"$stateDir/band_index"

  private def readIndex(spark: SparkSession, stateDir: String): Option[DataFrame] =
    StreamState.readIfExists(spark, indexPath(stateDir))

  /** Process one micro-batch of (doc_id, text): emit the near-dup
    * candidate pairs this batch uncovers (new↔seen and new↔new), then
    * fold the batch into the standing index. */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String): DataFrame = {
    val batchBands0 = bands(batch)
    val existing = readIndex(spark, stateDir)
    // exactly-once per doc: a redelivered doc is already indexed → no
    // bands → no emissions → no state growth
    val batchBands = (existing match {
      case Some(idx) => batchBands0.join(
        idx.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
      case None => batchBands0
    }).persist()
    batchBands.count()
    val vsSeen = existing match {
      case Some(idx) => batchBands.as("n")
        .join(idx.as("o"),
          col("n.band") === col("o.band") && col("n.bkey") === col("o.bkey"))
        .select(least(col("n.doc_id"), col("o.doc_id")).as("a_id"),
          greatest(col("n.doc_id"), col("o.doc_id")).as("b_id"))
      case None => spark.range(0)
        .select(col("id").as("a_id"), col("id").as("b_id"))
    }
    val within = batchBands.as("x").join(batchBands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
    val out = vsSeen.unionByName(within).distinct()
    // SEVER LINEAGE before mutating the state the plan reads. cache()
    // is NOT enough: unpersisting batchBands below re-caches dependent
    // entries lazily against their SOURCE plans (non-cascading
    // uncache), and a re-bound plan re-reads the band index AFTER the
    // append — the exactly-once anti-join would then erase this batch's
    // own emissions. localCheckpoint materializes the rows eagerly and
    // detaches the plan from the index read entirely.
    val emitted = out.localCheckpoint(true)
    batchBands.write.mode("append").parquet(indexPath(stateDir))
    batchBands.unpersist()
    emitted
  }
}
