package graft.workflow

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class WorkflowSpec extends SparkSpec {
  import spark.implicits._
  import Workflows._

  private def reg(): Registry = {
    val r = new Registry
    r.registerPipeline(Pipeline("double",
      df => df.withColumn("v", col("v") * 2)))
    r.registerPipeline(Pipeline("inc",
      df => df.withColumn("v", col("v") + 1)))
    r.registerPipeline(Pipeline("boom",
      df => df.select(col("does_not_exist"))))
    r
  }

  test("workflow executes pipelines in order (W2 linear DAG)") {
    val r = reg()
    r.registerWorkflow(Workflow("wf1", Seq("double", "inc")))
    val (_, result) = r.execute("wf1", "db1", "a1",
      Seq(1, 2, 3).toDF("v"))
    assert(result.get.select("v").as[Int].collect().sorted.toSeq == Seq(3, 5, 7))
    val exec = r.executionTable(spark).head()
    assert(exec.getAs[String]("executionStatus") == "SUCCEEDED")
  }

  test("failure records FAILED with the failing pipeline (W3 tracking)") {
    val r = reg()
    r.registerWorkflow(Workflow("wf2", Seq("double", "boom", "inc")))
    val (_, result) = r.execute("wf2", "db1", "a1", Seq(1).toDF("v"))
    assert(result.isFailure)
    val exec = r.executionTable(spark)
      .filter(col("workflowId") === "wf2").head()
    assert(exec.getAs[String]("executionStatus") == "FAILED")
    assert(exec.getAs[String]("failedPipeline") == "boom")
  }

  test("workflow registration validates pipelines exist (W1)") {
    val r = reg()
    intercept[IllegalArgumentException] {
      r.registerWorkflow(Workflow("bad", Seq("double", "missing")))
    }
  }

  test("sidecar ingestion expands JSON to typed metadata rows (W5)") {
    val sidecars = Seq(
      ("db1", "a1", "/out.gltf", """{"polyCount":"1200","author":"alice"}"""))
      .toDF("databaseId", "assetId", "filePath", "sidecarJson")
    val rows = Workflows.ingestSidecars(sidecars)
      .select("metadataKey", "metadataValue", "metadataValueType")
      .as[(String, String, String)].collect().toSet
    assert(rows == Set(
      ("polyCount", "1200", "integer"),
      ("author", "alice", "string")))
  }
}
