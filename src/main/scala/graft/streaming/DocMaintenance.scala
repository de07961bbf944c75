package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental search-doc maintenance — the streaming half of the indexer
  * pipeline (SURVEY §2.8 ST1-ST4).
  *
  * Reference flow: entity-table change streams → route by source →
  * rebuild the affected doc(s) by re-reading current truth → idempotent
  * upsert keyed on the deterministic doc id
  * (`backend/backend/handlers/indexing/assetIndexer.py:602-737,1002-1114`).
  *
  * Spark shape: a CDC batch of changed keys drives a SEMI-JOIN-restricted
  * re-run of the full doc-build join (never a full recompute — SURVEY
  * §7.5.5), then a MERGE-equivalent: union + last-writer-wins on _docId.
  * In production the merge is a Delta `MERGE INTO` from `foreachBatch`;
  * the pure-DataFrame equivalent here has identical semantics and is what
  * the tests verify.
  */
object DocMaintenance {

  /** CDC record contract (ST1): op ∈ INSERT|MODIFY|REMOVE. */
  val CdcColumns: Seq[String] = Seq("sequence", "op", "table", "databaseId", "assetId")

  /** ST4 — affected asset keys of a CDC batch: metadata/asset changes map
    * to their own key; link changes fan out to both endpoints
    * (assetIndexer.py:902-910,974-987). */
  def affectedKeys(batch: DataFrame): DataFrame = {
    val direct = batch
      .filter(col("table") =!= "assetLinks")
      .select(col("databaseId"), col("assetId"))
    val linkFrom = batch.filter(col("table") === "assetLinks")
      .select(col("fromDatabaseId").as("databaseId"), col("fromAssetId").as("assetId"))
    val linkTo = batch.filter(col("table") === "assetLinks")
      .select(col("toDatabaseId").as("databaseId"), col("toAssetId").as("assetId"))
    direct.unionByName(linkFrom).unionByName(linkTo).distinct()
  }

  /** ST4 including LINK-METADATA fan-out: the reference's structural
    * sniffing routes any stream record carrying `assetLinkId` — the
    * link table's AND the link-metadata table's PK — to the link
    * handler, which rebuilds BOTH endpoint docs
    * (`assetIndexer.py:1077-1081`; the link-metadata table streams into
    * the indexer via `storageBuilder-nestedStack.ts:1615`). A metadata
    * row carries only its `assetLinkId`, so the endpoints resolve
    * through the links table. Scale shape: the CDC batch's link-id set
    * is micro-batch-sized → broadcast into a semi-join against links;
    * the links scan prunes on the broadcast, never the reverse. */
  def affectedKeysWithLinkMeta(batch: DataFrame, links: DataFrame): DataFrame = {
    val metaLinkIds = batch
      .filter(col("table") === "assetLinkMetadata")
      .select(col("assetLinkId")).distinct()
    val touchedLinks = links
      .join(broadcast(metaLinkIds), Seq("assetLinkId"), "left_semi")
    val metaFrom = touchedLinks
      .select(col("fromDatabaseId").as("databaseId"), col("fromAssetId").as("assetId"))
    val metaTo = touchedLinks
      .select(col("toDatabaseId").as("databaseId"), col("toAssetId").as("assetId"))
    affectedKeys(batch.filter(col("table") =!= "assetLinkMetadata"))
      .unionByName(metaFrom).unionByName(metaTo).distinct()
  }

  /** Rebuild docs for the affected keys only (keyed incremental view
    * maintenance): semi-join every input of the doc build down to the
    * changed keys, then run the same J1 pipeline. */
  def rebuildChanged(
      changedKeys: DataFrame,
      assets: DataFrame,
      buckets: DataFrame,
      metadata: DataFrame,
      versions: DataFrame,
      links: DataFrame): DataFrame = {
    val keys = Seq("databaseId", "assetId")
    val keyDf = changedKeys.select(keys.map(col): _*).distinct()
    // Links are keyed by EITHER endpoint: DocBuilder.linkFlags derives
    // bool_has_asset_parents (and half of bool_has_assets_related) from the
    // *to* endpoint, so a rebuild of X must see incoming edges P→X as well as
    // outgoing ones (assetIndexer.py:405-454 re-reads both GSIs). Union of two
    // semi-joins; distinct() collapses edges whose both endpoints changed.
    val fromTouched = links.join(
      broadcast(keyDf.select(col("databaseId").as("fd"), col("assetId").as("fa"))),
      col("fromDatabaseId") === col("fd") && col("fromAssetId") === col("fa"),
      "left_semi")
    val toTouched = links.join(
      broadcast(keyDf.select(col("databaseId").as("td"), col("assetId").as("ta"))),
      col("toDatabaseId") === col("td") && col("toAssetId") === col("ta"),
      "left_semi")
    graft.docs.DocBuilder.buildAssetDocs(
      assets.join(broadcast(keyDf), keys, "left_semi"),
      buckets,
      metadata.join(broadcast(keyDf), keys, "left_semi"),
      versions.join(broadcast(keyDf), keys, "left_semi"),
      fromTouched.unionByName(toTouched).distinct())
  }

  /** ST3/S9 — idempotent MERGE-equivalent on the deterministic doc id:
    * rows from `updates` win over `current`; REMOVE keys are deleted.
    * At-least-once delivery therefore converges to the same table. */
  def mergeDocs(current: DataFrame, updates: DataFrame,
      removedDocIds: DataFrame = null): DataFrame = {
    val afterRemove =
      if (removedDocIds == null) current
      else current.join(removedDocIds, Seq("_docId"), "left_anti")
    val winners = updates.select(col("_docId")).distinct()
    afterRemove.join(winners, Seq("_docId"), "left_anti")
      .unionByName(updates)
  }

  /** Partition column of the persisted docs table (docs are written
    * `partitionBy(str_databaseid)` so the F10 access filter and this
    * incremental merge both prune partitions). */
  val DocPartitionCol = "str_databaseid"

  /** ST3/S9 at table scale, PLAIN-PARQUET COMPATIBILITY shim: the same
    * partition-scoped last-writer-wins merge as [[mergeDocsTx]] — and
    * since round 7 it IS [[mergeDocsTx]] — followed by an immediate
    * zero-grace vacuum and empty-partition-dir cleanup, so the table
    * directory a non-TxLog-aware engine reads directly (plain
    * `spark.read.parquet`, DuckDB, Trino over the files) equals the
    * committed head after every call (the `_txlog` dir is
    * underscore-prefixed and ignored by every parquet reader).
    *
    * One write path, two read contracts: the ACID path (readers use
    * `TxLog.read`, superseded files retained for snapshot isolation /
    * time travel) is [[mergeDocsTx]]; THIS wrapper trades those
    * retained files away for external-reader compatibility and is
    * SINGLE-WRITER (the zero-grace vacuum would reclaim a concurrent
    * writer's in-flight staging). Previously this was an independent
    * dynamic-partition-overwrite implementation — two diverging write
    * paths to the same tables; now the non-ACID variant cannot drift
    * from the transactional merge semantics. */
  def mergeDocsIncremental(spark: SparkSession, tablePath: String,
      updates: DataFrame, removedDocIds: DataFrame = null): Unit = {
    mergeDocsTx(spark, tablePath, updates, removedDocIds)
    graft.sources.TxLog.vacuum(spark, tablePath, olderThanMs = -1)
    // a fully-emptied partition keeps its (now file-less) hive dir after
    // vacuum; external listers treat a present dir as a present
    // partition, so drop it
    val hPath = new org.apache.hadoop.fs.Path(tablePath)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(hPath)
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .foreach { st =>
        if (!fs.listStatus(st.getPath)
            .exists(_.getPath.getName.endsWith(".parquet")))
          fs.delete(st.getPath, true)
      }
  }

  /** ST3/S9, ACID — the same partition-scoped last-writer-wins merge as
    * [[mergeDocsIncremental]], executed as a [[graft.sources.TxLog]]
    * MERGE INTO: one atomic commit per micro-batch, snapshot-isolated
    * readers (never a partition mid-swap), optimistic retry under
    * concurrent writers. This is the production doc-table path; the
    * reference's per-doc-atomic upsert (`assetIndexer.py:534-596`) is
    * the per-item special case of this per-batch transaction. */
  def mergeDocsTx(spark: SparkSession, tablePath: String,
      updates: DataFrame, removedDocIds: DataFrame = null): Unit =
    graft.sources.TxLog.merge(spark, tablePath, updates, removedDocIds,
      keyCol = "_docId", partitionCol = DocPartitionCol)

  /** ST7/S8 — S3-eventual-consistency reconciliation: objects that arrive
    * for unknown assets get the asset auto-created (get-or-create,
    * sqsBucketSync.py:592-741). Returns the asset rows to insert —
    * a streaming left-anti join against current truth. */
  def reconcileUnknownAssets(s3Objects: DataFrame, assets: DataFrame): DataFrame =
    s3Objects
      .join(assets.select("databaseId", "assetId"),
        Seq("databaseId", "assetId"), "left_anti")
      .select(col("databaseId"), col("assetId"),
        col("assetId").as("assetName"),
        graft.core.Codecs.fileExtension(col("objectKey")).as("assetType"),
        lit(false).as("archived"))
      .distinct()

  /** ST8/W7 — auto-execute a workflow when files arrive: per micro-batch,
    * submit each (db, asset) once (sqsAutoExecuteWorkflow shape — the
    * reference's SQS delivery is naturally batch-bounded at 10
    * messages; this is the corpus-scale analogue of that bound).
    *
    * The per-trigger driver collect is CAPPED at
    * `maxSubmitsPerTrigger`: the submission protocol is inherently
    * driver-side (one workflow call per key), but a pathological
    * backfill batch must not collect unbounded keys. Keys beyond the
    * cap SPILL to `spillDir` as parquet and drain on subsequent
    * triggers (each trigger takes the ordered head of spill ∪ new,
    * via a TakeOrdered plan — the driver never materializes more than
    * the cap). Pass `spillDir = None` only when the source is known
    * batch-bounded (e.g. a queue feed): overflow keys are then
    * DEFERRED-LESS — the cap still holds but the remainder is dropped
    * with a warning, matching at-most-once submission. */
  def autoExecOnArrival(
      newFiles: DataFrame,
      submit: (String, String) => Unit,
      maxSubmitsPerTrigger: Int = 10000,
      spillDir: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    newFiles.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val incoming = batch.select("databaseId", "assetId").distinct()
        val spillPath = spillDir.map(p => new org.apache.hadoop.fs.Path(p))
        val fs = spillPath.map(_.getFileSystem(
          spark.sessionState.newHadoopConf()))
        // crash recovery for the rewrite protocol (all three windows —
        // partial tmp, committed-but-unswapped tmp, deleted live store —
        // see AtomicSpill, the ONE shared copy of this logic)
        (spillPath, fs) match {
          case (Some(p), Some(f)) => AtomicSpill.recover(f, p)
          case _ => ()
        }
        val hasSpill = (spillPath, fs) match {
          case (Some(p), Some(f)) => f.exists(p)
          case _ => false
        }
        val pending =
          if (hasSpill)
            incoming.unionByName(
              spark.read.parquet(spillDir.get)
                .select("databaseId", "assetId")).distinct()
          else incoming
        // ordered head → TakeOrderedAndProject: the driver sees at most
        // maxSubmitsPerTrigger rows regardless of batch size
        val taken = pending.orderBy("databaseId", "assetId")
          .limit(maxSubmitsPerTrigger).collect()
        taken.foreach(r => submit(r.getString(0), r.getString(1)))
        (spillPath, fs) match {
          case (Some(p), Some(f)) =>
            // remainder = pending minus the (≤cap, broadcastable) taken
            // set; rewrite the spill via temp + rename, with the
            // orphaned-tmp recovery at the top of the trigger covering
            // the delete→rename crash window — so a crash at any point
            // never loses queued keys (at-least-once resubmission is
            // fine — submission is idempotent per the reference's
            // redelivery semantics)
            import spark.implicits._
            val takenDf = taken.map(r => (r.getString(0), r.getString(1)))
              .toSeq.toDF("databaseId", "assetId")
            val rest = pending.join(org.apache.spark.sql.functions
              .broadcast(takenDf), Seq("databaseId", "assetId"), "left_anti")
            AtomicSpill.rewrite(rest, f, p)
          case _ =>
            if (taken.length == maxSubmitsPerTrigger)
              org.slf4j.LoggerFactory.getLogger(getClass).warn(
                s"autoExecOnArrival: batch hit the $maxSubmitsPerTrigger " +
                  "submit cap with no spillDir — overflow keys dropped")
        }
      }
      .start()

  /** Run a CDC source as a Structured Streaming query into a doc-table
    * sink directory, applying the incremental rebuild per micro-batch.
    * (Parquet-based stand-in for the Delta `MERGE INTO` foreachBatch.) */
  def streamMaintain(
      cdc: DataFrame, // streaming DF with CdcColumns
      snapshot: () => (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame),
      applyBatch: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    cdc.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (assets, buckets, metadata, versions, links) = snapshot()
        // batches whose contract carries assetLinkId (the link +
        // link-metadata tables' PK) resolve link-metadata rows to both
        // endpoints through the links snapshot; plain entity feeds keep
        // the column-free contract
        val changed =
          if (batch.columns.contains("assetLinkId"))
            affectedKeysWithLinkMeta(batch, links)
          else affectedKeys(batch)
        applyBatch(rebuildChanged(changed, assets, buckets, metadata, versions, links))
      }
      .start()

  /** The PRODUCTION wiring of [[streamMaintain]]: each micro-batch's
    * rebuilt docs merge into a [[graft.sources.TxLog]] table through
    * [[mergeDocsTx]] — one atomic commit per micro-batch, so a reader
    * concurrent with the stream always sees a complete snapshot
    * (either before or after a batch, never a partition mid-swap), and
    * Structured Streaming's at-least-once redelivery re-commits an
    * identical LWW merge (idempotent by ST3). Read the maintained
    * table with `TxLog.read`. */
  def streamMaintainTx(
      spark: SparkSession,
      tablePath: String,
      cdc: DataFrame, // streaming DF with CdcColumns
      snapshot: () => (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame))
      : org.apache.spark.sql.streaming.StreamingQuery =
    streamMaintain(cdc, snapshot,
      rebuilt => mergeDocsTx(spark, tablePath, rebuilt))
}
