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

  /** DRIVER-LOCAL orchestrator state, by design: workflow/pipeline
    * definitions and execution records are control-plane metadata (the
    * reference keeps them in admin-sized DynamoDB tables), mutated only
    * by the single orchestrating driver. Data-plane state never lives
    * here — executions materialize to DataFrames ([[executionsDf]]) for
    * the J9/W3 query surfaces, and a multi-driver deployment would back
    * this class with the table itself. */
  final class Registry {
    private val pipelines = mutable.LinkedHashMap[String, Pipeline]()
    private val workflows = mutable.LinkedHashMap[String, Workflow]()
    private val executions = mutable.ArrayBuffer[ExecutionRecord]()
    private var seq = 0

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
      * equivalent, stepfunctions_builder.py:316-513). */
    private final case class PendingCallback(
        databaseId: String, assetId: String, workflowId: String,
        remaining: Seq[String], current: DataFrame, startedAtMs: Long)
    private val pending = mutable.LinkedHashMap[String, PendingCallback]()

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
        Failure(new RuntimeException(
          s"callback failure for $executionId: $reason"))
      } else {
        val (_, r) = runStages(executionId, p.databaseId, p.assetId,
          p.workflowId, p.remaining, p.current, p.startedAtMs)
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
      val result = Try {
        while (idx < stages.length) {
          val pid = stages(idx)
          failedAt = pid
          current = pipelines(pid).transform(current)
          idx += 1
          if (pipelines(pid).waitForCallback) {
            pending(execId) = PendingCallback(databaseId, assetId, workflowId,
              stages.drop(idx), current, startedAtMs)
            record(execId, databaseId, assetId, workflowId,
              "PENDING_CALLBACK", startedAtMs, pid)
            return (execId, Success(current))
          }
        }
        failedAt = ""
        current
      }
      record(execId, databaseId, assetId, workflowId,
        if (result.isSuccess) "SUCCEEDED" else "FAILED",
        startedAtMs, failedAt)
      (execId, result)
    }

    /** Upsert the execution record (last state wins — the listing shows
      * the current status). */
    private def record(execId: String, databaseId: String, assetId: String,
        workflowId: String, status: String, startedAtMs: Long,
        failedPipeline: String): Unit = {
      executions.filterInPlace(_.executionId != execId)
      executions += ExecutionRecord(databaseId, assetId, execId, workflowId,
        status, startedAtMs, System.currentTimeMillis(), failedPipeline)
    }

    /** J9 — execution listing as a DataFrame. */
    def executionTable(spark: SparkSession): DataFrame = {
      import spark.implicits._
      executions.toSeq.toDF()
    }
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
}
