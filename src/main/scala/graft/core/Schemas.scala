package graft.core

import org.apache.spark.sql.types._

/** Entity-table schemas for the VAMS-shaped catalog (SURVEY §1.1/1.4,
  * FIXTURES.md §A). System of record: one Parquet/Delta table per entity,
  * partitioned by `databaseId` at scale (matches the F10 access filter →
  * partition pruning on every governed query).
  *
  * Reference: DynamoDB table definitions
  * `infra/lib/nestedStacks/storage/storageBuilder-nestedStack.ts:648-1350`
  * and Pydantic models `backend/backend/models/assetsV3.py:51-87`,
  * `backend/backend/models/metadata.py:21-35`.
  */
object Schemas {

  val databases: StructType = StructType(Seq(
    StructField("databaseId", StringType, nullable = false),
    StructField("description", StringType),
    StructField("dateCreated", TimestampType),
    StructField("archived", BooleanType, nullable = false)))

  val buckets: StructType = StructType(Seq(
    StructField("bucketId", StringType, nullable = false),
    StructField("bucketName", StringType),
    StructField("baseAssetsPrefix", StringType),
    StructField("isVersioningEnabled", BooleanType)))

  val assets: StructType = StructType(Seq(
    StructField("databaseId", StringType, nullable = false),
    StructField("assetId", StringType, nullable = false),
    StructField("assetName", StringType),
    StructField("description", StringType),
    StructField("assetType", StringType),
    StructField("bucketId", StringType),
    StructField("isDistributable", BooleanType),
    StructField("tags", ArrayType(StringType)),
    StructField("assetLocationKey", StringType),
    StructField("previewLocationKey", StringType),
    StructField("currentVersionId", StringType),
    StructField("archived", BooleanType, nullable = false)))

  val files: StructType = StructType(Seq(
    StructField("databaseId", StringType, nullable = false),
    StructField("assetId", StringType, nullable = false),
    StructField("fileKey", StringType, nullable = false),
    StructField("s3Key", StringType),
    StructField("bucketName", StringType),
    StructField("fileExt", StringType),
    StructField("fileSize", LongType),
    StructField("etag", StringType),
    StructField("s3VersionId", StringType),
    StructField("lastModified", TimestampType),
    StructField("isPrimary", BooleanType),
    StructField("archived", BooleanType, nullable = false),
    StructField("previewFileKey", StringType)))

  /** Long-form typed metadata KV (metadata.py:21-35; filePath "/" =
    * asset-level). */
  val metadata: StructType = StructType(Seq(
    StructField("databaseId", StringType, nullable = false),
    StructField("assetId", StringType, nullable = false),
    StructField("filePath", StringType, nullable = false),
    StructField("metadataKey", StringType, nullable = false),
    StructField("metadataValue", StringType),
    StructField("metadataValueType", StringType)))

  /** File attributes: string-typed KV (metadata.py:601-602). */
  val attributes: StructType = StructType(Seq(
    StructField("databaseId", StringType, nullable = false),
    StructField("assetId", StringType, nullable = false),
    StructField("filePath", StringType, nullable = false),
    StructField("attributeKey", StringType, nullable = false),
    StructField("attributeValue", StringType)))

  /** Graph edges (models/assetLinks.py:16-19). */
  val assetLinks: StructType = StructType(Seq(
    StructField("assetLinkId", StringType, nullable = false),
    StructField("fromDatabaseId", StringType),
    StructField("fromAssetId", StringType),
    StructField("toDatabaseId", StringType),
    StructField("toAssetId", StringType),
    StructField("relationshipType", StringType), // parentChild | related
    StructField("assetLinkAliasId", StringType)))

  val assetVersions: StructType = StructType(Seq(
    StructField("databaseId", StringType, nullable = false),
    StructField("assetId", StringType, nullable = false),
    StructField("assetVersionId", StringType, nullable = false),
    StructField("versionAlias", StringType),
    StructField("comment", StringType),
    StructField("dateCreated", TimestampType),
    StructField("isCurrentVersion", BooleanType),
    StructField("createdBy", StringType)))

  /** The 13 metadata value types (metadata.py:21-35). */
  val MetadataValueTypes: Seq[String] = Seq(
    "string", "multiline_string", "inline_controlled_list", "number",
    "boolean", "date", "json", "xyz", "wxyz", "matrix4x4", "geopoint",
    "geojson", "lla")
}
