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

  /** W1 — registered pipeline. `waitForCallback` pipelines complete only
    * when their callback token is delivered (emulated synchronously). */
  final case class Pipeline(
      pipelineId: String,
      transform: DataFrame => DataFrame,
      executionType: String = "native", // native | Lambda | SQS | EventBridge
      enabled: Boolean = true)

  /** W2 — linear workflow over registered pipelines. */
  final case class Workflow(workflowId: String, pipelineIds: Seq[String])

  final case class ExecutionRecord(
      databaseId: String, assetId: String, executionId: String,
      workflowId: String, executionStatus: String,
      startedAtMs: Long, stoppedAtMs: Long, failedPipeline: String)

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

    /** W3/W4 — run a workflow over an input frame (the reference passes
      * the asset + file + simplified metadata KV; here the input frame
      * carries those columns). Status lifecycle NEW→RUNNING→SUCCEEDED/
      * FAILED as in executeWorkflow.py:334-351. */
    def execute(
        workflowId: String,
        databaseId: String,
        assetId: String,
        input: DataFrame): (String, Try[DataFrame]) = {
      val w = workflows.getOrElse(workflowId,
        throw new IllegalArgumentException(s"no workflow $workflowId"))
      seq += 1
      val execId = s"exec-$seq"
      val started = System.currentTimeMillis()
      var failedAt = ""
      val result = Try {
        w.pipelineIds.foldLeft(input) { (df, pid) =>
          failedAt = pid
          pipelines(pid).transform(df)
        }
      } match {
        case s @ Success(_) => failedAt = ""; s
        case f @ Failure(_) => f
      }
      executions += ExecutionRecord(databaseId, assetId, execId, workflowId,
        if (result.isSuccess) "SUCCEEDED" else "FAILED",
        started, System.currentTimeMillis(), failedAt)
      (execId, result)
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
