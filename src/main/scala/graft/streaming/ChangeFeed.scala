package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.TxLog

/** A LIVE change-data-capture consumer for [[graft.sources.TxLog]]
  * tables — the streaming half of the reference's DynamoDB-stream →
  * indexer pipeline (S6/ST1, `handlers/indexing/assetIndexer.py:
  * 1002-1114`), driven by the table's own commit log instead of a
  * separate stream service.
  *
  * Commit files are atomically renamed into `_txlog/` as zero-padded
  * `<version>.json` — exactly the append-only, immutable-file layout
  * Spark's file streaming source tracks natively. `follow` tails the
  * log directory with a file-source stream (checkpointed: a restarted
  * follower resumes after the last PROCESSED commit, never redelivers
  * it, never skips one) and, per micro-batch, hands the handler the
  * typed change frame for the batch's contiguous version span:
  *
  *  - first-ever batch including version 0 → the initial snapshot as
  *    `insert` rows (a CDC consumer's initial load);
  *  - later batches → [[TxLog.changes]] of (lowest-1, highest), i.e.
  *    inserts / deletes / update pre+post images keyed by `keyCol`.
  *
  * Scale shape: the per-trigger driver work is bounded by
  * `maxCommitsPerTrigger` file NAMES (a collect of paths, never row
  * data); the change frame itself stays a distributed parquet read of
  * only the files the span's snapshots disagree on. Consumers that
  * vacuum aggressively must keep the follower's lag inside the vacuum
  * grace window — a span below the horizon fails loud at resolve
  * ([[TxLog.vacuumHorizon]]), the documented recovery being a fresh
  * checkpoint dir (re-initial-load), same as any CDC reader that fell
  * off the log's retention. */
object ChangeFeed {

  private val CommitName = "([0-9]{20})\\.json".r

  /** Tail `tablePath`'s commit log and invoke `handler(changes, loV,
    * hiV)` for every micro-batch of commits. The handler's writes
    * should be idempotent on (loV, hiV) — foreachBatch is
    * at-least-once on crash BETWEEN handler success and checkpoint
    * commit (the standard Structured Streaming sink contract). */
  def follow(spark: SparkSession, tablePath: String, checkpointDir: String,
      keyCol: String = "_docId", maxCommitsPerTrigger: Int = 100)
      (handler: (DataFrame, Long, Long) => Unit): StreamingQuery = {
    val commits = spark.readStream
      .format("text")
      .option("maxFilesPerTrigger", maxCommitsPerTrigger)
      .load(s"$tablePath/_txlog")
    commits.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // versions come from the FILE NAMES of the batch (bounded by
        // maxCommitsPerTrigger — driver-sized); checkpoint snapshots
        // (<v>.checkpoint.json) ride along in the source but are not
        // commits and drop out here
        val versions = batch.select(input_file_name().as("f")).distinct()
          .collect().iterator.map(_.getString(0))
          .map(f => f.substring(f.lastIndexOf('/') + 1))
          .collect { case CommitName(v) => v.toLong }
          .toSeq
        if (versions.nonEmpty) {
          val (lo, hi) = (versions.min, versions.max)
          val changeDf =
            if (lo == 0L)
              TxLog.read(spark, tablePath, asOfVersion = Some(hi))
                .withColumn("_change_type", lit("insert"))
            else TxLog.changes(spark, tablePath, lo - 1, hi, keyCol)
          handler(changeDf, lo, hi)
        }
      }
      .start()
  }
}
