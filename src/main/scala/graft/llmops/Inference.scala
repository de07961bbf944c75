package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset}

/** W6 — the containerized GenAI-labeling pipelines as a Spark stage
  * (reference: `backendPipelines/genAi/metadata3dLabeling/lambda/
  * metadataGenerationPipeline.py` labels assets via a vision model and
  * writes the labels back as metadata).
  *
  * The model call is STUBBED (no model endpoints in this container) but
  * the Spark contract is real: rows batch through `mapPartitions` (one
  * endpoint call per batch — bounded in-flight memory, amortized RPC),
  * and results come back in the long-form metadata shape ready to MERGE
  * into the metadata table, which re-enters the streaming doc-
  * maintenance loop (SURVEY §3.3 step 6 → §3.2).
  */
object Inference {

  final case class AssetPayload(
      databaseId: String, assetId: String, filePath: String,
      content: Array[Byte])

  /** Long-form metadata row (Schemas.metadata shape). */
  final case class LabelRow(
      databaseId: String, assetId: String, filePath: String,
      metadataKey: String, metadataValue: String, metadataValueType: String)

  val BatchSize = 32

  /** STUB of the model endpoint: one call per BATCH — a real
    * implementation posts the batch and parses per-item responses.
    * Deterministic features stand in for model output. */
  private def callModel(batch: Seq[AssetPayload]): Seq[Seq[(String, String)]] =
    batch.map { p =>
      val size = p.content.length
      Seq(
        "ai_label" -> (if (size % 3 == 0) "vehicle"
                       else if (size % 3 == 1) "building" else "terrain"),
        "ai_confidence" -> f"0.${50 + size % 50}%s")
    }

  /** Batched labeling: payloads → long-form metadata rows. Each batch
    * call runs under ST6 backoff ([[graft.streaming.Retry]]): a
    * rate-limited endpoint retries INSIDE the task — a task failure
    * would redo the whole partition's batches for one throttled call.
    * The stub never throttles; a real client throws
    * [[graft.streaming.Retry.ThrottledException]] on HTTP 429. */
  def labelAssets(ds: Dataset[AssetPayload]): Dataset[LabelRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        val out = graft.streaming.Retry.withBackoff()(callModel(batch))
        batch.lazyZip(out).flatMap { (p, kvs) =>
          kvs.map { case (k, v) =>
            LabelRow(p.databaseId, p.assetId, p.filePath, k, v,
              if (k == "ai_confidence") "number" else "string")
          }
        }
      }
    }
  }

  /** DataFrame façade over (databaseId, assetId, filePath, content). */
  def labelAssetsDF(df: DataFrame): DataFrame = {
    implicit val enc = org.apache.spark.sql.Encoders.product[AssetPayload]
    labelAssets(df.as[AssetPayload]).toDF()
  }
}
