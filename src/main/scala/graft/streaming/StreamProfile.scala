package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llmops.Text

/** Incremental (streaming) corpus profiling — the micro-batch twin of
  * `llm_profile_vocab`: per-source document / posting counts and the
  * distinct-gram vocabulary, maintained as MERGEABLE state so the
  * profile is always current without ever recomputing the corpus.
  *
  * Reference analogue: the indexer's change-driven incremental update
  * (`backend/backend/handlers/indexing/assetIndexer.py:602-737` — new
  * truth folds into standing state, never a full rebuild); applied to
  * the profiling surface.
  *
  * The distinct-gram count is the part that cannot be a plain counter:
  * grams repeat across batches, so exact maintenance would need the
  * full gram set as state (corpus-sized). The scale answer is a
  * DataSketches HLL sketch per source (`hll_sketch_agg` /
  * `hll_union_agg`, codegen'd Spark built-ins): constant-size state,
  * mergeable across batches, and re-adding already-seen grams is a
  * no-op by set semantics. The streamed estimate is NOT bit-identical
  * to a one-shot sketch (a small one-shot sketch can still be in exact
  * sparse mode where the union has promoted to dense HLL); both sit
  * within the standard HLL error of the true vocabulary, which is what
  * `StreamProfileSpec` asserts. Doc/posting counters are exact longs
  * and match the batch recompute exactly; at-least-once
  * redelivery is made exactly-once by a doc-id ledger anti-join (the
  * compact 1-column table, same pattern as [[StreamDedup]]'s index).
  *
  * Per micro-batch (drive from `foreachBatch`):
  *  1. drop already-profiled docs (anti-join on the doc-id ledger);
  *  2. aggregate the batch: per source n_docs, n_postings (distinct
  *     grams per doc, summed) and the batch's gram HLL sketch;
  *  3. merge into standing state: counters add, sketches
  *     `hll_union_agg` — one row per source, a broadcast-sized table;
  *  4. append the batch's doc ids to the ledger.
  *
  * State size: profile = O(sources) rows × (2 longs + ~2 KB sketch);
  * ledger = one long per doc ever seen. Nothing re-reads historical
  * text.
  */
object StreamProfile {

  private def profilePath(stateDir: String) = s"$stateDir/profile"
  private def ledgerPath(stateDir: String) = s"$stateDir/doc_ledger"

  private def readIfExists(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) Some(spark.read.parquet(path)) else None
  }

  /** Per-source (source, n_docs, n_postings, gram_sketch) of one
    * (doc_id, source, text) frame. Docs with fewer than 3 tokens have
    * an empty shingle set: they count as docs, contribute no postings,
    * and leave the sketch untouched (explode_outer's null gram is
    * ignored by count and sketch alike). */
  def batchProfile(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), col("doc_id"),
        Text.shingles(Text.tokens(col("text"))).as("grams"))
      .select(col("source"), col("doc_id"),
        explode_outer(col("grams")).as("gram"))
      .withColumn("g", Text.hash60(col("gram")))
      .groupBy("source").agg(
        count_distinct(col("doc_id")).as("n_docs"),
        count(col("g")).as("n_postings"),
        hll_sketch_agg(col("g")).as("gram_sketch"))

  /** Fold one micro-batch of (doc_id, source, text) into the standing
    * profile; returns the updated profile with the vocabulary estimate
    * materialized: (source, n_docs, n_postings, n_grams_est). */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String): DataFrame = {
    val fresh = (readIfExists(spark, ledgerPath(stateDir)) match {
      case Some(ledger) => batch.join(ledger, Seq("doc_id"), "left_anti")
      case None => batch
    }).persist()
    val delta = batchProfile(fresh)
    val merged = (readIfExists(spark, profilePath(stateDir)) match {
      case Some(prev) => prev.unionByName(delta)
      case None => delta
    })
      .groupBy("source").agg(
        sum("n_docs").as("n_docs"),
        sum("n_postings").as("n_postings"),
        hll_union_agg(col("gram_sketch")).as("gram_sketch"))
    // sever lineage before overwriting the state the plan reads (same
    // re-bind hazard as StreamDedup.processBatch)
    val out = merged.localCheckpoint(true)
    out.write.mode("overwrite").parquet(profilePath(stateDir))
    fresh.select("doc_id").write.mode("append").parquet(ledgerPath(stateDir))
    fresh.unpersist()
    readProfile(spark, stateDir)
  }

  /** The standing profile with the vocabulary estimate evaluated. */
  def readProfile(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(profilePath(stateDir))
      .select(col("source"), col("n_docs"), col("n_postings"),
        hll_sketch_estimate(col("gram_sketch")).as("n_grams_est"))
      .orderBy("source")
}
