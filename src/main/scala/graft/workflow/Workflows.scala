package graft.workflow

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable
import scala.util.{Failure, Success, Try}

/** Workflow/pipeline execution — the W-series surface.
  *
  * Reference: pipeline model `backend/backend/models/pipelines.py:31-184`;
  * linear-DAG workflow compilation `handlers/workflows/createWorkflow.py:
  * 128-287` + `common/stepfunctions_builder.py:161-203`; execution launch
  * and tracking `handlers/workflows/executeWorkflow.py:312-352`; output
  * sidecar ingestion `processWorkflowExecutionOutput.py:193-419`.
  *
  * Our model: a pipeline is a registered `DataFrame => DataFrame`
  * transform (native Spark stage); a workflow is an ordered list of
  * pipeline names (the reference compiles exactly this linear sequence
  * into ASL); executions are rows in an executions table. External
  * (Lambda/SQS-style) pipelines map to `foreachBatch` callouts — modeled
  * by the same Stage signature with an effectful body.
  */
object Workflows {

  /** Driver-residency bound for crash recovery: `rehydrate` loads only
    * the newest this-many executions into the runtime buffer (the
    * collect is LIMIT-bounded inside the query). A long-lived tenant's
    * execution log is unbounded; its full history stays queryable from
    * the log via `executionTable`, and status upserts to evicted
    * executions still resolve last-write-wins through the log. 10⁴
    * records ≈ single-digit MB of driver heap — the contract is
    * "recovery cost is O(retention), not O(history)". */
  val RecoveryRetention = 10000

  /** W1 — registered pipeline. `waitForCallback` pipelines suspend the
    * execution after their transform runs (the external callout); the
    * workflow resumes when the callback token is delivered
    * (stepfunctions_builder.py:316-513 task-token pattern). */
  final case class Pipeline(
      pipelineId: String,
      transform: DataFrame => DataFrame,
      executionType: String = "native", // native | Lambda | SQS | EventBridge
      enabled: Boolean = true,
      waitForCallback: Boolean = false)

  /** W2 — linear workflow over registered pipelines. */
  final case class Workflow(workflowId: String, pipelineIds: Seq[String])

  final case class ExecutionRecord(
      databaseId: String, assetId: String, executionId: String,
      workflowId: String, executionStatus: String,
      startedAtMs: Long, stoppedAtMs: Long, failedPipeline: String)

  /** Orchestrator state. Definitions (pipelines/workflows) are CODE and
    * re-register on start, like the reference's deployed lambdas; the
    * RUNTIME state — execution records and pending callback tokens — is
    * what must survive a driver restart (the reference persists both:
    * executions in DynamoDB, suspended state as Step Functions task
    * tokens, `stepfunctions_builder.py:316-513`).
    *
    * Pass `durableDir` to back that runtime state with storage:
    *  - every [[ExecutionRecord]] transition appends to
    *    `<dir>/executions` (tiny control-plane parquet; last state wins
    *    by record sequence on read);
    *  - a suspended execution persists its intermediate FRAME to
    *    `<dir>/pending/<executionId>/data` and a JSON descriptor
    *    (workflow, remaining stages, identity) beside it — the task
    *    token is re-deliverable after a restart via [[Workflows.recover]];
    *  - tokens stay single-use: the descriptor is removed when the
    *    resumed execution records its final state, so a crash MID-resume
    *    leaves the token deliverable again (at-least-once, the Step
    *    Functions contract), while a completed one cannot be replayed.
    * Without `durableDir` the registry is driver-local (tests, ad-hoc
    * sessions) with identical semantics minus restart survival. */
  final class Registry(
      durableDir: Option[(SparkSession, String)] = None) {
    private val pipelines = mutable.LinkedHashMap[String, Pipeline]()
    private val workflows = mutable.LinkedHashMap[String, Workflow]()
    private val executions = mutable.ArrayBuffer[ExecutionRecord]()
    private var seq = 0
    private var recSeq = 0L

    def registerPipeline(p: Pipeline): Unit = pipelines(p.pipelineId) = p
    def registerWorkflow(w: Workflow): Unit = {
      // createWorkflow.py:128-287 validates every pipeline exists+enabled
      val missing = w.pipelineIds.filterNot(id =>
        pipelines.get(id).exists(_.enabled))
      require(missing.isEmpty, s"unknown/disabled pipelines: $missing")
      workflows(w.workflowId) = w
    }

    /** W6 — suspended execution awaiting its callback token: the
      * pending-callback state table (the Step-Functions task-token
      * equivalent, stepfunctions_builder.py:316-513). `current` is a
      * thunk: in-memory mode it closes over the live frame; in durable
      * mode (and after recovery) it reads the persisted intermediate. */
    private final case class PendingCallback(
        databaseId: String, assetId: String, workflowId: String,
        remaining: Seq[String], current: () => DataFrame, startedAtMs: Long)
    private val pending = mutable.LinkedHashMap[String, PendingCallback]()

    // ── durable-state plumbing ─────────────────────────────────────────
    private def fsAnd(path: String) = durableDir.map { case (s, _) =>
      val p = new org.apache.hadoop.fs.Path(path)
      (p.getFileSystem(s.sessionState.newHadoopConf()), p)
    }
    private def execLogDir = durableDir.map(_._2 + "/executions")
    private def pendingDir(execId: String) =
      durableDir.map(_._2 + s"/pending/$execId")

    private def writeDescriptor(fs: org.apache.hadoop.fs.FileSystem,
        dest: org.apache.hadoop.fs.Path, p: PendingCallback,
        dataPath: String): Unit = {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val desc = JsonMethods.compact(JsonMethods.render(JObject(
        "databaseId" -> JString(p.databaseId),
        "assetId" -> JString(p.assetId),
        "workflowId" -> JString(p.workflowId),
        "remaining" -> JArray(p.remaining.map(JString(_)).toList),
        "startedAtMs" -> JLong(p.startedAtMs),
        "dataPath" -> JString(dataPath))))
      val out = fs.create(dest, true)
      try out.write(desc.getBytes("UTF-8")) finally out.close()
    }

    /** Parse a persisted execution descriptor → (state with a thunk
      * reading the persisted frame, its data path). */
    private def readDescriptor(spark: SparkSession,
        fs: org.apache.hadoop.fs.FileSystem,
        src: org.apache.hadoop.fs.Path): (PendingCallback, String) = {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val in = fs.open(src)
      val j = try JsonMethods.parse(new java.io.InputStreamReader(in, "UTF-8"))
        finally in.close()
      val remaining = (j \ "remaining") match {
        case JArray(items) => items.collect { case JString(s) => s }
        case _ => Nil
      }
      val dataPath = (j \ "dataPath").values.toString
      (PendingCallback(
        (j \ "databaseId").values.toString,
        (j \ "assetId").values.toString,
        (j \ "workflowId").values.toString,
        remaining,
        () => spark.read.parquet(dataPath),
        (j \ "startedAtMs").values.toString.toLong), dataPath)
    }

    private[workflow] def persistPending(execId: String,
        p: PendingCallback): Unit = pendingDir(execId).foreach { dir =>
      val (spark, _) = durableDir.get
      // versioned data dir: a resume that suspends AGAIN writes its new
      // intermediate while the old one is still the read source of the
      // running plan — never overwrite in place
      val dataPath = s"$dir/data-${java.util.UUID.randomUUID().toString.take(8)}"
      p.current().write.mode("overwrite").parquet(dataPath)
      val (fs, d) = fsAnd(dir).get
      writeDescriptor(fs, new org.apache.hadoop.fs.Path(d, "descriptor.json"),
        p, dataPath)
      // thunk now reads the persisted copy — restart-equivalent even in
      // the same process
      pending(execId) = p.copy(current = () => spark.read.parquet(dataPath))
    }

    private def dropPending(execId: String): Unit = {
      pendingDir(execId).foreach { dir =>
        fsAnd(dir).foreach { case (fs, d) => fs.delete(d, true) }
      }
    }

    // ── mid-stage crash durability (Step Functions restart semantics) ──
    // Step Functions persists every state transition, so a crashed
    // execution restarts at its last COMPLETED state, not from scratch
    // (`common/stepfunctions_builder.py:161-203` — each compiled stage
    // is a durable state). Durable mode mirrors that: the input at
    // execute() and the intermediate after EVERY completed stage are
    // checkpointed to `<dir>/inflight/<execId>`; the checkpoint is
    // superseded stage-by-stage and removed at suspend (the pending
    // token takes over) or terminal record. [[rehydrate]] surfaces
    // survivors; [[resumeInterrupted]] re-runs ONLY the remaining stages.
    private val interrupted = mutable.LinkedHashMap[String, PendingCallback]()

    private def inflightDir(execId: String) =
      durableDir.map(_._2 + s"/inflight/$execId")

    /** Persist the stage boundary and return the frame REBOUND to the
      * persisted copy — the continuation reads what a restart would
      * read (restart-equivalence), and the previous boundary's files
      * can be deleted because nothing references them anymore. */
    private def checkpointStage(execId: String, p: PendingCallback)
        : DataFrame = inflightDir(execId) match {
      case None => p.current()
      case Some(dir) =>
        val (spark, _) = durableDir.get
        val (fs, d) = fsAnd(dir).get
        val priorData =
          if (!fs.exists(new org.apache.hadoop.fs.Path(d, "descriptor.json")))
            None
          else Some((readDescriptor(spark, fs,
            new org.apache.hadoop.fs.Path(d, "descriptor.json"))._2))
        val dataPath = s"$dir/data-${java.util.UUID.randomUUID().toString.take(8)}"
        p.current().write.mode("overwrite").parquet(dataPath)
        writeDescriptor(fs, new org.apache.hadoop.fs.Path(d, "descriptor.json"),
          p, dataPath)
        priorData.foreach { old =>
          fs.delete(new org.apache.hadoop.fs.Path(old), true)
        }
        spark.read.parquet(dataPath)
    }

    private def dropInflight(execId: String): Unit =
      inflightDir(execId).foreach { dir =>
        fsAnd(dir).foreach { case (fs, d) => fs.delete(d, true) }
      }

    /** Executions that were mid-stage when the driver died (recovered
      * from their last completed-stage checkpoint). */
    def interruptedExecutions: Seq[String] = interrupted.keys.toSeq

    /** Resume every interrupted execution from its last completed stage
      * — completed stages are NOT re-run (their output is the persisted
      * checkpoint). Returns each execution's final (or re-suspended)
      * result. */
    def resumeInterrupted(): Map[String, Try[DataFrame]] = {
      val ids = interrupted.keys.toSeq
      ids.map { execId =>
        val p = interrupted.remove(execId).get
        val (_, r) = runStages(execId, p.databaseId, p.assetId,
          p.workflowId, p.remaining, p.current(), p.startedAtMs)
        execId -> r
      }.toMap
    }

    /** Re-hydrate runtime state from `durableDir` (crash/restart path):
      * executions reload from the log, pending tokens from their
      * descriptors; `seq` resumes past every recovered execution id.
      * Pipelines/workflows must be re-registered by the caller first —
      * they are code, not state. */
    private[workflow] def rehydrate(): Unit = durableDir.foreach { case (spark, dir) =>
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val (fs, root) = fsAnd(dir).get
      execLogDir.filter(d => fs.exists(new org.apache.hadoop.fs.Path(d)))
        .foreach { d =>
          import spark.implicits._
          val rows = spark.read.parquet(d)
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("executionId")).orderBy(col("recSeq").desc)
          // BOUNDED recovery: only the newest `RecoveryRetention`
          // executions become driver-resident — the bound rides the
          // QUERY (orderBy + limit), so the collect is capped however
          // long the tenant's log has grown (the reference's analog
          // queries its executions table per asset, never whole;
          // executeWorkflow.py:394-488). Older history stays in the
          // log and remains visible through [[executionTable]], which
          // reads the log lazily in durable mode; it is only the
          // RUNTIME buffer (status upserts, failure lookups) that is
          // bounded. An update to an evicted execution still works:
          // the upsert appends a fresh record with a higher recSeq,
          // and the log's latest-wins read resolves it.
          val latest = rows.withColumn("_rn", row_number().over(w))
            .filter(col("_rn") === 1).drop("_rn", "recSeq")
            .orderBy(col("startedAtMs").desc, col("executionId").desc)
            .limit(RecoveryRetention)
            .as[ExecutionRecord].collect()
          executions.clear()
          executions ++= latest.sortBy(r => (r.startedAtMs, r.executionId))
          recSeq = Option(rows.agg(max("recSeq")).head().get(0))
            .map(_.asInstanceOf[Long]).getOrElse(0L)
          // seq derives from the FULL log, not the bounded buffer — an
          // old evicted execution may still hold the max suffix, and
          // resuming below it would mint a colliding id
          seq = Option(rows
            .filter(col("executionId").startsWith("exec-"))
            .agg(max(expr(
              "coalesce(try_cast(substring(executionId, 6) AS INT), 0)")))
            .head().get(0)).map(_.asInstanceOf[Int]).getOrElse(0)
        }
      val pendRoot = new org.apache.hadoop.fs.Path(root, "pending")
      if (fs.exists(pendRoot)) fs.listStatus(pendRoot).filter(_.isDirectory)
        .foreach { st =>
          val execId = st.getPath.getName
          val descPath = new org.apache.hadoop.fs.Path(st.getPath, "descriptor.json")
          if (fs.exists(descPath))
            pending(execId) = readDescriptor(spark, fs, descPath)._1
        }
      // executions that died MID-STAGE: their last completed-stage
      // checkpoint survives under inflight/. A pending TOKEN for the
      // same execution wins (crash mid-resume: the token is re-
      // deliverable at-least-once, so the stale mid-resume checkpoint
      // is garbage, not state)
      val inflRoot = new org.apache.hadoop.fs.Path(root, "inflight")
      if (fs.exists(inflRoot)) fs.listStatus(inflRoot).filter(_.isDirectory)
        .foreach { st =>
          val execId = st.getPath.getName
          val descPath = new org.apache.hadoop.fs.Path(st.getPath, "descriptor.json")
          if (pending.contains(execId)) fs.delete(st.getPath, true)
          else if (fs.exists(descPath))
            interrupted(execId) = readDescriptor(spark, fs, descPath)._1
        }
    }

    /** Pending callback tokens (execution ids awaiting delivery). */
    def pendingCallbacks: Seq[String] = pending.keys.toSeq

    /** W3/W4 — run a workflow over an input frame (the reference passes
      * the asset + file + simplified metadata KV; here the input frame
      * carries those columns). Status lifecycle NEW→RUNNING→
      * (PENDING_CALLBACK→)SUCCEEDED/FAILED as in
      * executeWorkflow.py:334-351. A waitForCallback stage suspends the
      * execution after its transform (the callout); resume with
      * [[deliverCallback]]. */
    def execute(
        workflowId: String,
        databaseId: String,
        assetId: String,
        input: DataFrame): (String, Try[DataFrame]) = {
      val w = workflows.getOrElse(workflowId,
        throw new IllegalArgumentException(s"no workflow $workflowId"))
      seq += 1
      val execId = s"exec-$seq"
      runStages(execId, databaseId, assetId, workflowId, w.pipelineIds,
        input, System.currentTimeMillis())
    }

    /** Deliver the task token for a PENDING_CALLBACK execution: resume
      * the remaining stages on success, or fail the execution. Tokens
      * are single-use — a second delivery (or an unknown id) is an
      * error, as with Step Functions task tokens. */
    def deliverCallback(
        executionId: String,
        success: Boolean = true,
        reason: String = ""): Try[DataFrame] = {
      val p = pending.remove(executionId).getOrElse(
        throw new IllegalArgumentException(
          s"no pending callback for $executionId (unknown or already delivered)"))
      if (!success) {
        val failedPipeline = executions.collectFirst {
          case e if e.executionId == executionId => e.failedPipeline
        }.getOrElse("")
        record(executionId, p.databaseId, p.assetId, p.workflowId, "FAILED",
          p.startedAtMs, failedPipeline)
        dropPending(executionId)
        Failure(new RuntimeException(
          s"callback failure for $executionId: $reason"))
      } else {
        val (_, r) = runStages(executionId, p.databaseId, p.assetId,
          p.workflowId, p.remaining, p.current(), p.startedAtMs)
        // single-use: the durable token goes away only once the resumed
        // run recorded its outcome (a crash mid-resume keeps it
        // deliverable — at-least-once, as with SFN task tokens); if the
        // resume SUSPENDED again (another waitForCallback stage), the
        // fresh descriptor was just written and must survive. runStages
        // already materialized any durable terminal result, so deleting
        // the persisted intermediate cannot strand the caller's frame.
        if (!pending.contains(executionId)) dropPending(executionId)
        r
      }
    }

    private def runStages(
        execId: String, databaseId: String, assetId: String,
        workflowId: String, stages: Seq[String], input: DataFrame,
        startedAtMs: Long): (String, Try[DataFrame]) = {
      var failedAt = ""
      var current = input
      var idx = 0
      def boundary(remaining: Seq[String]): PendingCallback = {
        val frame = current
        PendingCallback(databaseId, assetId, workflowId, remaining,
          () => frame, startedAtMs)
      }
      // durable mode: the input is checkpointed before stage 1 and the
      // intermediate after every completed stage — a crash ANYWHERE
      // mid-run restarts from the last completed stage, never from
      // scratch (the SFN per-state durability this models); `current`
      // is rebound to the persisted copy so the continuation is
      // restart-equivalent. record() upserts, so the transient RUNNING
      // row becomes the terminal row in place.
      current = checkpointStage(execId, boundary(stages))
      record(execId, databaseId, assetId, workflowId, "RUNNING",
        startedAtMs, "")
      val result = Try {
        while (idx < stages.length) {
          val pid = stages(idx)
          failedAt = pid
          current = pipelines(pid).transform(current)
          idx += 1
          if (pipelines(pid).waitForCallback) {
            val pc = boundary(stages.drop(idx))
            pending(execId) = pc
            persistPending(execId, pc) // durable mode: frame + descriptor
            dropInflight(execId) // the pending token supersedes the checkpoint
            record(execId, databaseId, assetId, workflowId,
              "PENDING_CALLBACK", startedAtMs, pid)
            return (execId, Success(current))
          }
          if (idx < stages.length) // terminal record supersedes the last one
            current = checkpointStage(execId, boundary(stages.drop(idx)))
        }
        failedAt = ""
        current
      }
      // durable mode: the result's lineage reads the last stage-boundary
      // checkpoint, which the terminal record deletes below — materialize
      // (eager localCheckpoint) so the caller's frame never dangles on
      // removed files
      val out =
        if (durableDir.isDefined) result.map(_.localCheckpoint()) else result
      record(execId, databaseId, assetId, workflowId,
        if (out.isSuccess) "SUCCEEDED" else "FAILED",
        startedAtMs, failedAt)
      (execId, out)
    }

    /** Upsert the execution record (last state wins — the listing shows
      * the current status). */
    private def record(execId: String, databaseId: String, assetId: String,
        workflowId: String, status: String, startedAtMs: Long,
        failedPipeline: String): Unit = {
      // a terminal state retires the mid-stage checkpoint — only crashes
      // leave one behind for rehydrate() to find
      if (status == "SUCCEEDED" || status == "FAILED") dropInflight(execId)
      executions.filterInPlace(_.executionId != execId)
      val rec = ExecutionRecord(databaseId, assetId, execId, workflowId,
        status, startedAtMs, System.currentTimeMillis(), failedPipeline)
      executions += rec
      // durable mode: append the transition to the log (control-plane
      // sized — one tiny file per state change; last recSeq wins on read)
      execLogDir.foreach { d =>
        val (spark, _) = durableDir.get
        import spark.implicits._
        recSeq += 1
        Seq(rec).toDF().withColumn("recSeq", lit(recSeq))
          .coalesce(1).write.mode("append").parquet(d)
      }
    }

    /** J9 — execution listing as a DataFrame. Durable mode reads the
      * LOG (latest record per execution), so the listing covers the
      * full history even past the driver-resident
      * [[Workflows.RecoveryRetention]] bound; in-memory mode lists the
      * runtime buffer.
      *
      * Ordering is `startedAtMs` ascending (ties broken by executionId)
      * in BOTH modes — parquet read order is otherwise file-listing
      * order, which changes as the log grows. Cost note: each call is a
      * full scan + latest-per-key reduction over the WHOLE transition
      * log (O(history)); that is control-plane-sized by construction
      * (one tiny row per state change), but a caller polling this in a
      * tight loop should cache the result or compact the log first. */
    def executionTable(spark: SparkSession): DataFrame = {
      import spark.implicits._
      execLogDir.filter { d =>
        fsAnd(d).exists { case (fs, p) => fs.exists(p) }
      } match {
        case Some(d) =>
          val rows = spark.read.parquet(d)
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("executionId")).orderBy(col("recSeq").desc)
          rows.withColumn("_rn", row_number().over(w))
            .filter(col("_rn") === 1).drop("_rn", "recSeq")
            .as[ExecutionRecord].toDF()
            .orderBy(col("startedAtMs"), col("executionId"))
        case None => executions.toSeq.toDF()
          .orderBy(col("startedAtMs"), col("executionId"))
      }
    }

    /** Driver-resident execution-record count (spec hook for the
      * recovery bound). */
    private[workflow] def residentExecutionCount: Int = executions.length
  }

  /** Rebuild a durable [[Registry]] after a driver restart: re-register
    * the (code-defined) pipelines and workflows, then re-hydrate
    * executions and pending callback tokens from `stateDir`. A
    * `waitForCallback` pipeline suspended before the crash can have its
    * token delivered on the recovered registry and resumes from the
    * persisted intermediate frame. */
  def recover(spark: SparkSession, stateDir: String,
      pipelines: Seq[Pipeline], workflows: Seq[Workflow]): Registry = {
    val r = new Registry(Some((spark, stateDir)))
    pipelines.foreach(r.registerPipeline)
    workflows.foreach(r.registerWorkflow)
    r.rehydrate()
    r
  }

  /** W5 — sidecar metadata ingestion: parse `_metadata.json`-style columns
    * into long-form metadata rows (processWorkflowExecutionOutput.py:
    * 270-419). Input: (databaseId, assetId, filePath, sidecarJson). */
  def ingestSidecars(sidecars: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{MapType, StringType}
    sidecars
      .select(col("databaseId"), col("assetId"), col("filePath"),
        explode(from_json(col("sidecarJson"), MapType(StringType, StringType)))
          .as(Seq("metadataKey", "metadataValue")))
      .withColumn("metadataValueType",
        graft.core.Codecs.detectType(col("metadataValue")))
  }

  /** The input rows [[ingestSidecars]] would silently drop: a sidecar
    * whose JSON does not parse as a string map (`from_json` → NULL →
    * the explode emits nothing). The reference logs-and-skips these
    * per sidecar (processWorkflowExecutionOutput.py:270-419's
    * try/except around each parse); at pipeline scale a log line is
    * invisible, so the malformed inputs surface as a QUARANTINE frame
    * — same grain as the input, with the parse diagnostic — that the
    * caller lands next to the metadata writes. Valid-but-empty
    * sidecars (`{}`) are NOT quarantined: they parse fine and simply
    * carry no rows. */
  def quarantineSidecars(sidecars: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{MapType, StringType}
    sidecars
      .filter(col("sidecarJson").isNotNull &&
        length(trim(col("sidecarJson"))) > 0 &&
        from_json(col("sidecarJson"), MapType(StringType, StringType)).isNull)
      .select(col("databaseId"), col("assetId"), col("filePath"),
        col("sidecarJson").as("rawSidecar"),
        lit("sidecar JSON does not parse as a string map").as("reason"))
  }
}
