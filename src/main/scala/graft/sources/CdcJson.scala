package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DynamoDB-stream-record JSON → the engine's CDC contract
  * ([[graft.streaming.DocMaintenance.CdcColumns]] + the link columns).
  *
  * The reference's indexer consumes exactly this wire format
  * (`handlers/indexing/assetIndexer.py:1002-1114`): each record carries
  * `eventName` (INSERT|MODIFY|REMOVE), `eventSourceARN` (which entity
  * table), and `dynamodb.{Keys,NewImage,OldImage}` maps of DynamoDB
  * AttributeValues — `{"S": "text"}`, `{"N": "42"}`, `{"BOOL": true}` —
  * which it routes by ARN substring and, for SNS-wrapped records with
  * no ARN, by structural sniffing (an `assetLinkId` attribute anywhere
  * means the link handler, `:1077-1081`).
  *
  * Spark shape: `from_json` against a typed AttributeValue schema, then
  * pure column work — the parse, the ARN routing, and the sniffing all
  * happen inside whole-stage codegen; works identically on a batch
  * frame and a `readStream` of the queue body column (a narrow map, no
  * shuffle). The REMOVE image falls back to `Keys`/`OldImage`, exactly
  * as the reference reads deleted rows. */
object CdcJson {

  /** The attribute kinds the entity tables use (metadata.py's value
    * types serialize to S; numbers/booleans appear in flags and
    * counters). Extend with L/M/SS only when an entity needs them. */
  val AttributeValueSchema: StructType = StructType(Seq(
    StructField("S", StringType),
    StructField("N", StringType),
    StructField("BOOL", BooleanType)))

  val RecordSchema: StructType = StructType(Seq(
    StructField("eventID", StringType),
    StructField("eventName", StringType),
    StructField("eventSourceARN", StringType),
    StructField("dynamodb", StructType(Seq(
      StructField("SequenceNumber", StringType),
      StructField("Keys", MapType(StringType, AttributeValueSchema)),
      StructField("NewImage", MapType(StringType, AttributeValueSchema)),
      StructField("OldImage", MapType(StringType, AttributeValueSchema)))))))

  /** Scalar string of attribute `name`, REMOVE-safe: NewImage first,
    * then OldImage, then Keys (the reference reads deletes from the
    * old image / keys because REMOVE records carry no new one). */
  private def attr(name: String): Column = {
    def of(img: String) = col(s"_r.dynamodb.$img").getItem(name).getField("S")
    coalesce(of("NewImage"), of("OldImage"), of("Keys"))
  }

  /** Parse a frame with a JSON `value` column (an SQS/Kinesis body or
    * a file line) into the CDC contract: `(sequence, op, table,
    * databaseId, assetId, fromDatabaseId, fromAssetId, toDatabaseId,
    * toAssetId, assetLinkId)`.
    *
    * Table resolution mirrors the reference: the ARN substring when
    * present (`arnTables`: substring → logical table name), else
    * structural sniffing — any `assetLinkId` attribute routes to the
    * link tables, a `metadataKey` beside it to `assetLinkMetadata`,
    * bare `assetLinkId` to `assetLinks`; rows with `databaseId` +
    * `assetId` sniff as entity rows (`sniffDefault`). Unroutable rows
    * keep table = NULL — fail-visible, the caller decides. */
  def parse(df: DataFrame,
      arnTables: Seq[(String, String)] = DefaultArnTables,
      sniffDefault: String = "assets"): DataFrame = {
    val parsed = df.withColumn("_r", from_json(col("value"), RecordSchema))
    // FIRST match wins (Seq order is the priority order) — fold right
    // so earlier entries sit higher in the when-chain
    val byArn = arnTables.foldRight(lit(null).cast("string")) {
      case ((needle, table), acc) =>
        when(col("_r.eventSourceARN").contains(needle), table).otherwise(acc)
    }
    val hasLinkId = attr("assetLinkId").isNotNull
    val hasMetadataKey = attr("metadataKey").isNotNull
    val hasEntityKey = attr("databaseId").isNotNull && attr("assetId").isNotNull
    val sniffed = when(hasLinkId && hasMetadataKey, "assetLinkMetadata")
      .when(hasLinkId, "assetLinks")
      .when(hasEntityKey, sniffDefault)
    parsed.select(
      col("_r.dynamodb.SequenceNumber").cast("long").as("sequence"),
      col("_r.eventName").as("op"),
      coalesce(byArn, sniffed).as("table"),
      attr("databaseId").as("databaseId"),
      attr("assetId").as("assetId"),
      attr("fromDatabaseId").as("fromDatabaseId"),
      attr("fromAssetId").as("fromAssetId"),
      attr("toDatabaseId").as("toDatabaseId"),
      attr("toAssetId").as("toAssetId"),
      attr("assetLinkId").as("assetLinkId"))
  }

  /** ARN substrings of the streamed tables (storageBuilder table names;
    * the deployment-specific prefix/suffix around them is irrelevant to
    * a substring match, same as the reference's `in` check). */
  val DefaultArnTables: Seq[(String, String)] = Seq(
    "AssetStorageTable" -> "assets",
    "AssetFileMetadataStorageTable" -> "metadata",
    "AssetLinksMetadataStorageTable" -> "assetLinkMetadata",
    "AssetLinksStorageTable" -> "assetLinks",
    "DatabaseStorageTable" -> "databases")
}
