package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The SHARED plumbing of the band-store family — one implementation
  * of shard hashing, cell key prefixes, the append-only write, store
  * maintenance, the capped pruned probe, and the per-micro-batch
  * screen-and-fold skeleton, parameterized by each modality's band
  * schema and payload columns. [[IncrementalDedup]] (text MinHash),
  * [[PhashDedup]] (image aHash) and [[EmbedDedup]] (embedding cosine)
  * are thin instantiations; a store-layer fix lands HERE once, not
  * three times (the nested-prefix `keyPrefixes` bug class showed why
  * that matters).
  *
  * Layout contract (the postings treatment, see
  * [[IncrementalDedup]]'s STORE LAYOUT doc): one appended row per
  * (cell, doc) with the doc's signature/payload denormalized in, key
  * `shard#<cell parts>#<doc id>` so files key-cluster by cell under
  * [[graft.sources.TxLog.compact]], `_shard` = a 64-way hash of the
  * cell for metadata-level partition pruning. Probes prune to the
  * batch's shards AND (while the probe set is protocol-sized) to the
  * files whose committed key bounds overlap a probed cell prefix.
  * Writes are [[graft.sources.TxLog.append]]: Θ(batch) regardless of
  * store size; replays re-insert content-identical rows that readers
  * dedup by id.
  */
object BandStore {

  /** Band-hash partition count. Like [[graft.query.TermIndex.Shards]]:
    * far below the file count at any real scale; the file-level
    * `keyPrefixes` skipping inside a shard is what scales with delta
    * size, the shard pruning is the metadata-level first cut. */
  val BandShards = 64

  /** Driver-side probe-key cap: a batch probing more cells than this
    * skips the per-cell file skipping (collecting the prefixes would no
    * longer be protocol-sized) and falls back to shard pruning — by
    * then the batch is large enough that it touches most files anyway. */
  val MaxProbeKeys = 65536

  /** 64-way shard of one cell: a 60-bit hash of the `_`-joined cell
    * column values (cast to string), mod [[BandShards]]. */
  def shardOfCell(cell: Seq[Column]): Column =
    pmod(Text.hash60(concat_ws("_", cell.map(_.cast("string")): _*)),
      lit(BandShards.toLong)).cast("string")

  /** `shard#<part1>#<part2>#` — the store-key prefix of one cell; a
    * row's `_docId` is this prefix + the doc id, so files key-cluster
    * by cell and a cell probe prunes to the files that hold it.
    * `prefixParts` defaults to the cell columns cast to string;
    * callers needing fixed-width parts (sortable zero-padded band
    * numbers) pass their own. */
  def cellPrefix(cell: Seq[Column],
      prefixParts: Option[Seq[Column]] = None): Column = {
    val parts = prefixParts.getOrElse(cell.map(_.cast("string")))
    concat(shardOfCell(cell) +:
      parts.flatMap(p => Seq(lit("#"), p)) :+ lit("#"): _*)
  }

  /** Fold banded rows into the store at `tablePath`: append-only (rows
    * are content-determined, so at-least-once replays re-insert
    * byte-identical rows; cost Θ(batch), never Θ(store)). `rows` must
    * carry `idCol`, the cell columns, and the payload columns; `out`
    * is the column list persisted alongside the derived
    * `_docId`/`_shard`. */
  def writeRows(spark: SparkSession, tablePath: String, rows: DataFrame,
      idCol: String, cell: Seq[Column], out: Seq[Column],
      prefixParts: Option[Seq[Column]] = None): Unit =
    graft.sources.TxLog.append(spark, tablePath,
      rows.select(
        concat(cellPrefix(cell, prefixParts), col(idCol).cast("string"))
          .as("_docId") +:
          shardOfCell(cell).as("_shard") +: out: _*),
      keyCol = "_docId", partitionCol = "_shard")

  /** Store maintenance ([[graft.query.TermIndex.optimize]]'s
    * contract): per-batch appends fragment the band shards, and the
    * probe's file-level `keyPrefixes` skipping is only as sharp as the
    * files' key clustering — compaction folds the fragments into
    * key-disjoint right-sized files (one probe key → one file) and
    * vacuum reclaims superseded ones (signatures are derived data
    * nobody time-travels). Snapshot-isolated against concurrent
    * probes/appends; append commits never conflict, so the maintenance
    * loop and the ingest loop coexist. */
  def optimize(spark: SparkSession, tablePath: String): Unit = {
    graft.sources.TxLog.compact(spark, tablePath,
      partitionCol = "_shard", keyCol = "_docId")
    graft.sources.TxLog.vacuum(spark, tablePath)
    ()
  }

  /** Cell-cap maintenance: DELETE rows beyond the `maxCell` smallest
    * ids of each cell. Result-invisible by the cap contract: every
    * probe already caps a cell's candidates to its `maxCell` smallest
    * ids (TopK.smallestK*), so a row beyond the cap can never be
    * reported — dropping it changes no screen result, it only bounds
    * per-cell store size. This is what keeps a BOUNDED-cell-space
    * store's probe Θ(batch): the embedding store's 10×6-bit LSH has
    * ≤ 640 cells TOTAL, so cells grow with the corpus and an uncapped
    * probe reads Θ(store) per trigger (measured 1.77× at 10× store in
    * the r12 StoreScale smoke); capped, a probe reads ≤ cells ×
    * maxCell rows regardless of corpus size. Replay caveat (narrow): a
    * capped-out row's doc no longer id-self-matches, so an
    * at-least-once replay of its original batch can re-append its rows
    * — growth bounded by the next maintenance cycle, and only for docs
    * whose kept cell-mates ALL fail the similarity verify (an
    * identical twin always flags the replay as a dup instead).
    * Ordinary ACID merge — retries on conflict, snapshot-isolated
    * against probes. Returns the number of rows deleted. */
  def capCells(spark: SparkSession, tablePath: String,
      cellCols: Seq[String], idCol: String, maxCell: Int): Long = {
    if (!graft.sources.TxLog.isTable(spark, tablePath)) return 0L
    val store = graft.sources.TxLog.read(spark, tablePath)
    val gcols = cellCols.map(col)
    // per-cell cutoff from the bounded top-k AGGREGATE (map-side
    // combined — a window row_number would sort whole cells in single
    // tasks, and cells are exactly where the skew lives): the
    // maxCell-th smallest DISTINCT id, null while the cell is under
    // cap. Distinct first: append replays duplicate ids, and the
    // probe-side cap (smallestKSig) counts distinct ids — a
    // non-distinct cutoff would undercut it and delete reportable rows
    val cutoff = store
      .select(gcols :+ col(idCol): _*).distinct()
      .groupBy(gcols: _*)
      .agg(TopK.smallestK(maxCell)(col(idCol), col(idCol)).as("p"))
      .select(gcols :+
        when(size(col("p")) === 2 * maxCell,
          element_at(col("p"), 2 * maxCell - 1)).as("_cut"): _*)
      .filter(col("_cut").isNotNull)
    // victims PINNED once (localCheckpoint): the emptiness test, the
    // count, and merge's own consumption would otherwise each re-run
    // the store scan + top-k aggregate — 3× the cost on exactly the
    // mega-cell stores the cap exists for, and racy against concurrent
    // appends between evaluations
    val victims = store.join(cutoff, cellCols)
      .filter(col(idCol) > col("_cut"))
      .select("_docId")
      .localCheckpoint()
    val n = victims.count()
    if (n == 0) return 0L
    graft.sources.TxLog.merge(spark, tablePath,
      updates = victims.limit(0).select(col("_docId"),
        split(col("_docId"), "#").getItem(0).as("_shard")),
      removedKeys = victims,
      keyCol = "_docId", partitionCol = "_shard")
    n
  }

  /** The capped pruned probe: collect the batch's distinct
    * (shard, cell prefix) pairs driver-side — ≤ [[BandShards]] shard
    * strings always; cell prefixes only while ≤ [[MaxProbeKeys]] —
    * and read ONLY those shards' prefix-matching files. Over the cap,
    * falls back to shard pruning alone. Returns None when the store
    * doesn't exist yet (callers screen as empty). `cell` refers to
    * `bBands`' banding columns. */
  def prunedRead(spark: SparkSession, storePath: String,
      bBands: DataFrame, cell: Seq[Column],
      prefixParts: Option[Seq[Column]] = None): Option[DataFrame] = {
    if (!graft.sources.TxLog.isTable(spark, storePath)) return None
    val probed = bBands
      .select(shardOfCell(cell).as("s"),
        cellPrefix(cell, prefixParts).as("p"))
      .distinct().limit(MaxProbeKeys + 1).collect()
    val prefixes =
      if (probed.length > MaxProbeKeys) None
      else Some(probed.map(_.getString(1)).toSeq)
    val shards =
      if (prefixes.isDefined) probed.map(_.getString(0)).toSet
      else bBands.select(shardOfCell(cell))
        .distinct().collect().map(_.getString(0)).toSet
    Some(graft.sources.TxLog.read(spark, storePath,
      partitions = Some(shards), keyPrefixes = prefixes))
  }

  /** The per-micro-batch screen-and-fold skeleton every streaming
    * screen runs ([[IncrementalDedup.streamScreen]]'s contract):
    *  1. `probe` = the delta screened against the store; its id
    *     self-matches (`b_id === c_id`) identify docs ALREADY stored —
    *     an at-least-once replay after a fold finds its own rows, and
    *     skipping their re-insert is what keeps replays growth-free —
    *     and are excluded from the verdicts;
    *  2. the best twin per batch doc is picked by `bestAgg` over the
    *     store hits ∪ `selfPairs` (the batch-internal screen, lower id
    *     wins — callers pre-filter to `b_id > c_id`), projected back
    *     out by `bestCols` (over the struct alias `m`);
    *  3. EVERY batch doc — including ones too short/degenerate to
    *     signature — reaches `sink` as `(idCol, dup_of?, metric?,
    *     is_dup)`;
    *  4. the novel docs' rows fold into the store via `foldNovel`.
    */
  def screenFold(batch: DataFrame, prepared: DataFrame, idCol: String,
      probe: DataFrame, selfPairs: DataFrame,
      bestAgg: Column, bestCols: Seq[Column],
      sink: DataFrame => Unit, foldNovel: DataFrame => Unit): Unit = {
    val alreadyStored = probe.filter(col("b_id") === col("c_id"))
      .select(col("b_id").as(idCol))
    val hits = probe.filter(col("b_id") =!= col("c_id"))
      .unionByName(selfPairs)
      .groupBy(col("b_id").as(idCol))
      .agg(bestAgg.as("m"))
      .select(col(idCol) +: bestCols: _*)
    val flagged = batch.select(col(idCol)).distinct()
      .join(hits, Seq(idCol), "left")
      .withColumn("is_dup", col("dup_of").isNotNull)
    sink(flagged)
    val novel = prepared
      .join(hits.select(col(idCol)), Seq(idCol), "left_anti")
      .join(alreadyStored, Seq(idCol), "left_anti")
    foldNovel(novel)
  }
}
