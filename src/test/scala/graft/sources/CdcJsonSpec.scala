package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.DocMaintenance

/** DynamoDB-stream JSON → CDC contract: ARN routing, structural
  * sniffing, REMOVE image fallback — then straight into the link-aware
  * affected-key resolution, closing the loop from the reference's wire
  * format to the doc rebuild. */
class CdcJsonSpec extends SparkSpec {
  import spark.implicits._

  private def rec(name: String, arn: String, image: String,
      seq: Long = 1L, imageField: String = "NewImage") =
    s"""{"eventID":"e$seq","eventName":"$name",
       |"eventSourceARN":"$arn",
       |"dynamodb":{"SequenceNumber":"$seq","$imageField":$image}}"""
      .stripMargin.replaceAll("\n", "")

  test("routes by ARN substring; REMOVE falls back to the old image") {
    val rows = Seq(
      rec("MODIFY", "arn:aws:dynamodb:us-east-1:1:table/x-AssetStorageTable-9/stream/1",
        """{"databaseId":{"S":"db1"},"assetId":{"S":"a1"}}""", 1),
      rec("REMOVE", "arn:aws:dynamodb:us-east-1:1:table/x-AssetFileMetadataStorageTable-9/stream/1",
        """{"databaseId":{"S":"db2"},"assetId":{"S":"a2"},"metadataKey":{"S":"k"}}""",
        2, imageField = "OldImage"))
      .toDF("value")
    val parsed = CdcJson.parse(rows)
      .select("sequence", "op", "table", "databaseId", "assetId")
      .as[(Long, String, String, String, String)].collect().toSet
    assert(parsed == Set(
      (1L, "MODIFY", "assets", "db1", "a1"),
      (2L, "REMOVE", "metadata", "db2", "a2")))
  }

  test("structurally sniffs SNS-wrapped records with no recognizable ARN") {
    val rows = Seq(
      // link table: assetLinkId, no metadataKey
      rec("INSERT", "arn:unknown",
        """{"assetLinkId":{"S":"l1"},"fromDatabaseId":{"S":"db1"},
          |"fromAssetId":{"S":"a1"},"toDatabaseId":{"S":"db2"},
          |"toAssetId":{"S":"b1"},"relationshipType":{"S":"related"}}"""
          .stripMargin.replaceAll("\n", ""), 3),
      // link-METADATA table: assetLinkId + metadataKey (the :1077-1081 route)
      rec("MODIFY", "arn:unknown",
        """{"assetLinkId":{"S":"l2"},"metadataKey":{"S":"weight"}}""", 4),
      // plain entity row: databaseId + assetId
      rec("MODIFY", "arn:unknown",
        """{"databaseId":{"S":"db3"},"assetId":{"S":"c1"}}""", 5))
      .toDF("value")
    val parsed = CdcJson.parse(rows)
    val tables = parsed.select("sequence", "table")
      .as[(Long, String)].collect().toMap
    assert(tables == Map(3L -> "assetLinks", 4L -> "assetLinkMetadata",
      5L -> "assets"))
    // and the parsed frame drives the link-aware key resolution directly
    val links = Seq(
      ("l1", "db1", "a1", "db2", "b1", "related", null: String),
      ("l2", "db4", "d1", "db5", "e1", "related", null: String))
      .toDF("assetLinkId", "fromDatabaseId", "fromAssetId", "toDatabaseId",
        "toAssetId", "relationshipType", "assetLinkAliasId")
    val keys = DocMaintenance.affectedKeysWithLinkMeta(parsed, links)
      .as[(String, String)].collect().toSet
    assert(keys == Set(
      ("db1", "a1"), ("db2", "b1"),   // l1's endpoints (link row)
      ("db4", "d1"), ("db5", "e1"),   // l2's endpoints via the links table
      ("db3", "c1")))                 // the entity row
  }

  test("wire format end-to-end: JSON stream → parse → Tx doc rebuild") {
    // the full reference pipeline shape: raw stream-record JSON arrives
    // as a readStream body column, parses in-stream (codegen'd, no
    // collect), and drives the transactional doc maintenance
    val jsonDir = java.nio.file.Files.createTempDirectory("graft-cdcjson").toString
    val docsDir = java.nio.file.Files.createTempDirectory("graft-cdcjson-docs").toString
    val assets = Seq(("db1", "a1", "One"))
      .toDF("databaseId", "assetId", "assetName")
      .withColumn("description", lit("d"))
      .withColumn("assetType", lit("gltf"))
      .withColumn("bucketId", lit("b1"))
      .withColumn("isDistributable", lit(true))
      .withColumn("tags", array())
      .withColumn("assetLocationKey", lit("k"))
      .withColumn("previewLocationKey", lit(null).cast("string"))
      .withColumn("currentVersionId", lit(null).cast("string"))
      .withColumn("archived", lit(false))
    val buckets = Seq(("b1", "bkt", "/", true))
      .toDF("bucketId", "bucketName", "baseAssetsPrefix", "isVersioningEnabled")
    val emptyMd = Seq.empty[(String, String, String, String, String, String)]
      .toDF("databaseId", "assetId", "filePath", "metadataKey",
        "metadataValue", "metadataValueType")
    val emptyVer = Seq
      .empty[(String, String, String, String, String, java.sql.Timestamp, Boolean, String)]
      .toDF("databaseId", "assetId", "assetVersionId", "versionAlias",
        "comment", "dateCreated", "isCurrentVersion", "createdBy")
    val emptyLinks = Seq
      .empty[(String, String, String, String, String, String, String)]
      .toDF("assetLinkId", "fromDatabaseId", "fromAssetId", "toDatabaseId",
        "toAssetId", "relationshipType", "assetLinkAliasId")
    Seq(rec("MODIFY",
        "arn:aws:dynamodb:us-east-1:1:table/x-AssetStorageTable-9/stream/1",
        """{"databaseId":{"S":"db1"},"assetId":{"S":"a1"}}""", 1))
      .toDF("value").write.mode("overwrite").parquet(jsonDir)
    val cdc = CdcJson.parse(
      spark.readStream.schema(new org.apache.spark.sql.types.StructType()
        .add("value", "string")).parquet(jsonDir))
    val q = DocMaintenance.streamMaintainTx(spark, docsDir, cdc,
      () => (assets, buckets, emptyMd, emptyVer, emptyLinks))
    try q.processAllAvailable() finally q.stop()
    val docs = TxLog.read(spark, docsDir)
      .select("_docId", "str_assetname").as[(String, String)].collect().toSeq
    assert(docs == Seq(("db1#a1", "One")))
  }

  test("unroutable records keep table NULL — visible, never misrouted") {
    val rows = Seq(rec("MODIFY", "arn:unknown",
      """{"somethingElse":{"S":"x"}}""", 9)).toDF("value")
    val t = CdcJson.parse(rows).select("table").collect().head
    assert(t.isNullAt(0))
  }
}
