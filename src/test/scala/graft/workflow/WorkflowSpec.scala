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

  test("waitForCallback suspends, resumes on token, and tokens are single-use (W6)") {
    val r = reg()
    r.registerPipeline(Pipeline("callout",
      df => df.withColumn("v", col("v") * 10), executionType = "SQS",
      waitForCallback = true))
    r.registerWorkflow(Workflow("wf3", Seq("double", "callout", "inc")))
    val (execId, partial) = r.execute("wf3", "db1", "a1", Seq(1, 2).toDF("v"))
    // suspended after the callout stage ran (1,2 → double → ×10)
    assert(partial.get.select("v").as[Int].collect().sorted.toSeq == Seq(20, 40))
    assert(r.executionTable(spark).filter(col("executionId") === execId)
      .head().getAs[String]("executionStatus") == "PENDING_CALLBACK")
    // token delivery resumes the remaining stage
    val resumed = r.deliverCallback(execId)
    assert(resumed.get.select("v").as[Int].collect().sorted.toSeq == Seq(21, 41))
    assert(r.executionTable(spark).filter(col("executionId") === execId)
      .head().getAs[String]("executionStatus") == "SUCCEEDED")
    // tokens are single-use
    intercept[IllegalArgumentException] { r.deliverCallback(execId) }
  }

  test("waitForCallback failure token fails the execution (W6)") {
    val r = reg()
    r.registerPipeline(Pipeline("callout",
      df => df, executionType = "Lambda", waitForCallback = true))
    r.registerWorkflow(Workflow("wf4", Seq("callout")))
    val (execId, _) = r.execute("wf4", "db1", "a1", Seq(1).toDF("v"))
    assert(r.deliverCallback(execId, success = false, reason = "timeout").isFailure)
    val rec = r.executionTable(spark).filter(col("executionId") === execId).head()
    assert(rec.getAs[String]("executionStatus") == "FAILED")
  }

  test("durable registry: restart mid-callback recovers tokens and resumes (W6)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wfstate").toString
    def pipes = Seq(
      Pipeline("double", df => df.withColumn("v", col("v") * 2)),
      Pipeline("callout", df => df.withColumn("v", col("v") * 10),
        executionType = "SQS", waitForCallback = true),
      Pipeline("inc", df => df.withColumn("v", col("v") + 1)))
    val wf = Workflow("wfd", Seq("double", "callout", "inc"))
    val r1 = new Registry(Some((spark, dir)))
    pipes.foreach(r1.registerPipeline)
    r1.registerWorkflow(wf)
    val (execId, partial) = r1.execute("wfd", "db1", "a1", Seq(1, 2).toDF("v"))
    assert(partial.isSuccess && r1.pendingCallbacks == Seq(execId))

    // "driver restart": a FRESH registry re-hydrated from the state dir
    // (r1 is abandoned — nothing in memory carries over)
    val r2 = Workflows.recover(spark, dir, pipes, Seq(wf))
    assert(r2.pendingCallbacks == Seq(execId))
    assert(r2.executionTable(spark).filter(col("executionId") === execId)
      .head().getAs[String]("executionStatus") == "PENDING_CALLBACK")
    // the resumed run continues from the PERSISTED intermediate frame
    val resumed = r2.deliverCallback(execId)
    assert(resumed.get.select("v").as[Int].collect().sorted.toSeq == Seq(21, 41))
    assert(r2.executionTable(spark).filter(col("executionId") === execId)
      .head().getAs[String]("executionStatus") == "SUCCEEDED")
    // single-use token — on the recovered registry too
    intercept[IllegalArgumentException] { r2.deliverCallback(execId) }

    // a third recovery sees the terminal state, no pending token, and
    // continues the execution-id sequence without collision
    val r3 = Workflows.recover(spark, dir, pipes, Seq(wf))
    assert(r3.pendingCallbacks.isEmpty)
    assert(r3.executionTable(spark).filter(col("executionId") === execId)
      .head().getAs[String]("executionStatus") == "SUCCEEDED")
    val (execId2, _) = r3.execute("wfd", "db1", "a2", Seq(3).toDF("v"))
    assert(execId2 != execId)
    assert(r3.executionTable(spark).select("executionId").distinct().count() == 2)
  }

  test("durable registry: crash MID-STAGE resumes from the last completed stage (W3)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wfcrash").toString
    // stage-run counters prove completed stages are NOT re-run on resume
    val runs = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    def count(pid: String): Unit = runs.synchronized { runs(pid) += 1 }
    @volatile var crashInStage2 = true
    def pipes = Seq(
      Pipeline("stage1", df => { count("stage1"); df.withColumn("v", col("v") * 2) }),
      Pipeline("stage2", df => {
        count("stage2")
        // InterruptedException is FATAL to Try (NonFatal excludes it):
        // it escapes runStages exactly like a dying driver — no FAILED
        // record, no cleanup, only the durable checkpoints remain
        if (crashInStage2) throw new InterruptedException("simulated driver death")
        df.withColumn("v", col("v") + 1)
      }))
    val wf = Workflow("wfc", Seq("stage1", "stage2"))
    val r1 = new Registry(Some((spark, dir)))
    pipes.foreach(r1.registerPipeline)
    r1.registerWorkflow(wf)
    intercept[InterruptedException] {
      r1.execute("wfc", "db1", "a1", Seq(1, 2).toDF("v"))
    }
    val execId = "exec-1" // execute() never returned; the id is deterministic

    // "restart": fresh registry from the state dir; the execution is
    // surfaced as interrupted with stage1's output checkpointed
    crashInStage2 = false
    val r2 = Workflows.recover(spark, dir, pipes, Seq(wf))
    assert(r2.interruptedExecutions == Seq(execId))
    assert(r2.executionTable(spark).filter(col("executionId") === execId)
      .head().getAs[String]("executionStatus") == "RUNNING")
    val results = r2.resumeInterrupted()
    assert(results.keySet == Set(execId))
    // stage1 ran ONCE (before the crash), never again; stage2 ran in the
    // crashed attempt and once more on resume
    assert(runs("stage1") == 1 && runs("stage2") == 2)
    assert(results(execId).get.select("v").as[Int].collect().sorted.toSeq ==
      Seq(3, 5)) // (1,2) ×2 → +1
    assert(r2.executionTable(spark).filter(col("executionId") === execId)
      .head().getAs[String]("executionStatus") == "SUCCEEDED")
    // nothing interrupted remains; a later recovery is clean
    assert(r2.interruptedExecutions.isEmpty)
    val r3 = Workflows.recover(spark, dir, pipes, Seq(wf))
    assert(r3.interruptedExecutions.isEmpty)
    assert(r3.executionTable(spark).filter(col("executionId") === execId)
      .head().getAs[String]("executionStatus") == "SUCCEEDED")
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

  test("malformed sidecars land in quarantine, never silently vanish (W5)") {
    val sidecars = Seq(
      ("db1", "a1", "f1", """{"k":"v"}"""),        // valid → 1 row
      ("db1", "a2", "f2", """not json at all"""),  // malformed → quarantine
      ("db1", "a3", "f3", """[1,2,3]"""),          // wrong shape → quarantine
      ("db1", "a4", "f4", """{}"""),               // valid empty → neither
      ("db1", "a5", "f5", null))                   // absent → neither
      .toDF("databaseId", "assetId", "filePath", "sidecarJson")
    val good = Workflows.ingestSidecars(sidecars)
    assert(good.select("assetId").as[String].collect().toSeq == Seq("a1"))
    val bad = Workflows.quarantineSidecars(sidecars)
      .select("assetId", "reason").as[(String, String)].collect().toSet
    assert(bad.map(_._1) == Set("a2", "a3"))
    assert(bad.forall(_._2.nonEmpty))
  }

  test("recovery is bounded: 100k-record log rehydrates O(retention), full history stays listable") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wfbig").toString
    // synthesize a long-lived tenant's execution log DIRECTLY (10^5
    // latest-wins records, one row each) — the recovery bound must ride
    // the query, not the collect
    val n = 100000
    spark.range(n).selectExpr(
      "'db1' AS databaseId",
      "concat('a', id) AS assetId",
      "concat('exec-', id) AS executionId",
      "'wfb' AS workflowId",
      "'SUCCEEDED' AS executionStatus",
      "id AS startedAtMs",
      "id AS stoppedAtMs",
      "'' AS failedPipeline",
      "id AS recSeq")
      .write.mode("overwrite").parquet(dir + "/executions")
    val pipes = Seq(Pipeline("inc", df => df.withColumn("v", col("v") + 1)))
    val wf = Workflow("wfb", Seq("inc"))
    val r = Workflows.recover(spark, dir, pipes, Seq(wf))
    // driver residency is capped at the retention bound...
    assert(r.residentExecutionCount == Workflows.RecoveryRetention)
    // ...but the listing still surfaces the WHOLE history from the log
    assert(r.executionTable(spark).count() == n)
    // and the id sequence resumes past the evicted maximum - no collision
    val (execId, res) = r.execute("wfb", "db1", "aNew", Seq(1).toDF("v"))
    assert(res.isSuccess)
    assert(execId == s"exec-$n")
    assert(r.executionTable(spark).filter(col("executionId") === execId)
      .head().getAs[String]("executionStatus") == "SUCCEEDED")
    // listing order is the declared contract (startedAtMs asc, ties by
    // executionId), not parquet file-listing order (r14 advice)
    val heads = r.executionTable(spark)
      .select("startedAtMs").as[Long].head(1000).toSeq
    assert(heads == heads.sorted, "listing not startedAtMs-ordered")
  }
}
