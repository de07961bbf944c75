package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** S7 — the SNS→SQS re-queue loop re-expressed on micro-batches.
  *
  * The reference wires its indexing and workflow consumers to SQS
  * (`sqsBucketSync.py`, `sqsAutoExecuteWorkflow.py`): a message whose
  * handler fails returns to the queue after its visibility timeout and
  * is REDELIVERED with an incremented receive count; queues configured
  * with a redrive policy park a message on its dead-letter queue once
  * `maxReceiveCount` deliveries have failed (the reference's own queues
  * mostly decline DLQs — `apiBuilder-nestedStack.ts:693,1389` — and
  * rely on redelivery + idempotent handlers, which is exactly the
  * at-least-once contract this twin preserves).
  *
  * Mapping to micro-batches:
  *  - one trigger = one delivery round; the visibility timeout becomes
  *    `backoffTriggers(receiveCount)` — how many ROUNDS a failed
  *    record waits before redelivery (round-denominated so tests and
  *    replays are deterministic; wall-clock backoff for throttled
  *    CALLS inside a delivery is [[Retry.withBackoff]]'s job, ST6).
  *    Rounds are counted by a DURABLE clock file beside the pending
  *    store, not the streaming batchId — batchIds reset to 0 on a
  *    checkpoint-less restart, which would future-date every persisted
  *    backoff by the previous run's length;
  *  - the queue becomes a parquet pending store rewritten atomically
  *    per trigger (temp + rename, with the orphaned-tmp promotion
  *    [[DocMaintenance.autoExecOnArrival]] uses — a crash at any point
  *    loses nothing, it only redelivers, which SQS does too);
  *  - the DLQ becomes an append-only parquet dir; a crash between the
  *    DLQ append and the pending rewrite can duplicate a parked row on
  *    replay — the at-least-once face of the same contract (consumers
  *    of a real DLQ dedupe by message id; readers here dedupe by key).
  *
  * Scale: per trigger the driver touches at most `maxPerTrigger` rows
  * (ordered head, TakeOrderedAndProject — never the full backlog); the
  * pending/DLQ stores stay distributed parquet. The backlog drains
  * across triggers exactly like autoExecOnArrival's spill.
  */
object Requeue {

  /** Pending-store schema: (key, payload, receive_count, not_before). */
  private val PendingCols = Seq("key", "payload", "receive_count", "not_before")

  /** Durable trigger clock beside the pending store: `not_before` is
    * denominated in DELIVERY ROUNDS, and the streaming batchId resets
    * to 0 whenever the query starts without (or with a fresh)
    * checkpoint — which would future-date every persisted backoff by
    * the whole previous run's length. The clock is a tiny file bumped
    * once per trigger via temp + delete + rename; crash windows:
    *  - mid-write of tmp, or between tmp write and delete → the live
    *    clock still holds the previous tick (one increment lost — a
    *    backoff stretches by one round, harmless);
    *  - between delete(clock) and rename(tmp) → the live clock is GONE
    *    but the tmp holds the newer tick — [[readClock]] promotes it,
    *    so the clock never resets to 0 (a reset would future-date every
    *    persisted backoff by the previous run's length — the exact
    *    failure the durable clock exists to prevent). */
  private def readClock(fs: org.apache.hadoop.fs.FileSystem, p: Path): Long = {
    val cp = new Path(p.getParent, s".${p.getName}.clock")
    val tmp = new Path(p.getParent, s".${p.getName}.clock.tmp")
    if (!fs.exists(cp) && fs.exists(tmp)) { fs.rename(tmp, cp); () }
    if (!fs.exists(cp)) 0L
    else {
      val in = fs.open(cp)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  private def writeClock(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      v: Long): Unit = {
    val cp = new Path(p.getParent, s".${p.getName}.clock")
    val tmp = new Path(p.getParent, s".${p.getName}.clock.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(cp)) fs.delete(cp, true)
    fs.rename(tmp, cp)
    ()
  }

  /** Consume `events` (columns `key`, `payload`) with bounded-redelivery
    * semantics: `deliver(key, payload)` returning false marks a
    * transient failure — the record re-queues and redelivers after
    * `backoffTriggers(receiveCount)` triggers, until its
    * `maxReceiveCount`-th delivery has failed, at which point it parks
    * in `dlqDir` carrying its final `receive_count` and the trigger it
    * was parked on. A key redelivered while already pending collapses
    * to ONE pending row at the highest receive count (idempotent
    * delivery — the reference's handlers tolerate duplicates, so
    * collapsing is safe and keeps the store key-bounded).
    *
    * `deliver` must not throw for data-level failures (return false);
    * a throw fails the batch and replays it wholesale — reserve that
    * for infrastructure errors, mirroring a Lambda crash (SQS
    * redelivers the whole receive batch). */
  def requeueOnFailure(
      events: DataFrame,
      deliver: (String, String) => Boolean,
      pendingDir: String,
      dlqDir: String,
      maxReceiveCount: Int = 5,
      maxPerTrigger: Int = 10000,
      backoffTriggers: Int => Long = _ => 1L,
      // production callers SET this: without a checkpoint the file
      // source reprocesses every old event on restart, re-enqueuing
      // previously-parked keys as fresh deliveries (at-least-once
      // stretched to its worst case)
      checkpointDir: Option[String] = None): StreamingQuery = {
    require(maxReceiveCount >= 1, s"maxReceiveCount must be >= 1")
    val writer0 = events.writeStream.outputMode("append")
    checkpointDir.fold(writer0)(c =>
        writer0.option("checkpointLocation", c))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val pendingPath = new Path(pendingDir)
        val fs = pendingPath.getFileSystem(spark.sessionState.newHadoopConf())
        AtomicSpill.recover(fs, pendingPath)
        val nowTick = readClock(fs, pendingPath)
        val pending =
          if (fs.exists(pendingPath))
            spark.read.parquet(pendingDir).select(PendingCols.map(col): _*)
          else
            spark.emptyDataFrame
              .select(lit("").as("key"), lit("").as("payload"),
                lit(0).as("receive_count"), lit(0L).as("not_before"))
              .limit(0)
        val fresh = batch.select(col("key"), col("payload"),
          lit(0).as("receive_count"), lit(nowTick).as("not_before"))
        // one row per key, at the key's HIGHEST receive count (struct
        // max orders by receive_count first) — new arrivals of a
        // pending key neither reset its count nor fork a second row
        val all = pending.unionByName(fresh)
          .groupBy("key")
          .agg(max(struct(col("receive_count"), col("not_before"),
            col("payload"))).as("m"))
          .select(col("key"), col("m.payload").as("payload"),
            col("m.receive_count").as("receive_count"),
            col("m.not_before").as("not_before"))
        val due = all.filter(col("not_before") <= nowTick)
        val notDue = all.filter(col("not_before") > nowTick)
        // bounded delivery round: the driver never sees more than the
        // cap; the rest of the backlog stays pending (still due) and
        // drains on later triggers
        val taken = due.orderBy("key").limit(maxPerTrigger)
          .select("key", "payload", "receive_count").collect()
        val results = taken.map { r =>
          val ok = deliver(r.getString(0), r.getString(1))
          (r.getString(0), r.getString(1), r.getInt(2), ok)
        }.toSeq
        val takenDf = results
          .map { case (k, p, rc, ok) => (k, p, rc, ok) }
          .toDF("key", "payload", "receive_count", "ok")
        // failures stay driver-side (the round is maxPerTrigger-bounded
        // already), so the caller's backoff function applies as plain
        // Scala — no UDF enters any plan
        val failed = results.collect {
          case (k, p, rc, false) => (k, p, rc + 1)
        }
        // park after the maxReceiveCount-th failed delivery; DLQ append
        // is at-least-once (see object doc) — DLQ readers dedupe by key
        val parked = failed.filter(_._3 >= maxReceiveCount)
          .map { case (k, p, rc) => (k, p, rc, nowTick) }
        if (parked.nonEmpty)
          parked.toDF("key", "payload", "receive_count", "parked_at")
            .write.mode("append").parquet(dlqDir)
        val retries = failed.filter(_._3 < maxReceiveCount)
          .map { case (k, p, rc) => (k, p, rc, nowTick + backoffTriggers(rc)) }
          .toDF(PendingCols: _*)
          .select(PendingCols.map(col): _*)
        val overflow = due.join(
          broadcast(takenDf.select("key")), Seq("key"), "left_anti")
        AtomicSpill.rewrite(
          notDue.unionByName(overflow).unionByName(retries),
          fs, pendingPath)
        writeClock(fs, pendingPath, nowTick + 1)
      }
      .start()
  }

  /** Count of records still pending redelivery (diagnostic). */
  def pendingCount(spark: SparkSession, pendingDir: String): Long = {
    val p = new Path(pendingDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0L
    else spark.read.parquet(pendingDir).count()
  }
}
