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

  /** The labeling pipeline's CONSOLIDATION stage, made deterministic
    * (reference: `metadataGenerationPipeline.py:296-370` delegates this
    * to a final summarization prompt whose stated criteria are exactly
    * relational — we implement the criteria, not the model):
    *
    *  - per-view `none` results are dropped (:267-270);
    *  - labels dedup case-INsensitively, output lowercased unless the
    *    label is an acronym (all-caps, e.g. 'CAD' — the prompt's
    *    explicit carve-out);
    *  - outlier cut: labels appearing in < 10% of the asset's view
    *    labels are removed (the prompt's threshold filter);
    *  - the survivors become ONE long-form metadata row per asset:
    *    key `metadataKey`, value = the sorted JSON array rendered
    *    compactly, type `string` (:345-357 output_data shape).
    *
    * Input: `(databaseId, assetId, view, label)` — one row per label
    * per rendered view. Scale shape: one map-side-combined count per
    * (asset, label), one per-asset total via a second aggregation,
    * the 10% cut as an integer compare (count·10 ≥ total), and the
    * array assembled with sort_array + to_json — no window, no
    * collect, broadcast-free. */
  def consolidateLabels(viewLabels: DataFrame,
      metadataKey: String = "aiKeywords"): DataFrame = {
    import org.apache.spark.sql.functions._
    val norm = when(col("label") === upper(col("label")), col("label"))
      .otherwise(lower(col("label")))
    val counts = viewLabels
      .filter(col("label").isNotNull && lower(col("label")) =!= "none")
      .select(col("databaseId"), col("assetId"), norm.as("norm"))
      .groupBy("databaseId", "assetId", "norm")
      .agg(count(lit(1)).as("c"))
    counts
      .groupBy("databaseId", "assetId")
      .agg(sum("c").as("total"),
        collect_list(struct(col("norm"), col("c"))).as("ls"))
      .select(col("databaseId"), col("assetId"),
        lit(metadataKey).as("metadataKey"),
        to_json(sort_array(expr(
          "filter(ls, x -> x.c * 10 >= total).norm"))).as("metadataValue"),
        lit("string").as("metadataValueType"))
  }
}
