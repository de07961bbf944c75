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

  /** Per-version file snapshots (storageBuilder :1241-1266). */
  val assetFileVersions: StructType = StructType(Seq(
    StructField("databaseId", StringType, nullable = false),
    StructField("assetId", StringType, nullable = false),
    StructField("assetVersionId", StringType, nullable = false),
    StructField("fileKey", StringType, nullable = false),
    StructField("s3VersionId", StringType),
    StructField("fileSize", LongType),
    StructField("etag", StringType)))

  /** Per-version metadata snapshots (storageBuilder :1267-1292). */
  val assetMetadataVersions: StructType = StructType(Seq(
    StructField("databaseId", StringType, nullable = false),
    StructField("assetId", StringType, nullable = false),
    StructField("assetVersionId", StringType, nullable = false),
    StructField("entityType", StringType),
    StructField("filePath", StringType),
    StructField("metadataKey", StringType, nullable = false),
    StructField("metadataValue", StringType),
    StructField("metadataValueType", StringType)))

  val tags: StructType = StructType(Seq(
    StructField("tagName", StringType, nullable = false),
    StructField("tagTypeName", StringType),
    StructField("description", StringType)))

  val tagTypes: StructType = StructType(Seq(
    StructField("tagTypeName", StringType, nullable = false),
    StructField("description", StringType),
    StructField("required", BooleanType)))

  val comments: StructType = StructType(Seq(
    StructField("assetId", StringType, nullable = false),
    StructField("assetVersionId", StringType),
    StructField("commentId", StringType, nullable = false),
    StructField("commentBody", StringType),
    StructField("commentOwnerId", StringType),
    StructField("dateCreated", TimestampType),
    StructField("dateEdited", TimestampType)))

  /** ABAC policy rows (storageBuilder :1057-1137; authz/__init__.py). */
  val roles: StructType = StructType(Seq(
    StructField("roleName", StringType, nullable = false),
    StructField("description", StringType),
    StructField("source", StringType)))

  val userRoles: StructType = StructType(Seq(
    StructField("userId", StringType, nullable = false),
    StructField("roleName", StringType, nullable = false)))

  val constraints: StructType = StructType(Seq(
    StructField("constraintId", StringType, nullable = false),
    StructField("objectType", StringType),
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("appliesTo", ArrayType(StringType)), // role names
    StructField("criteriaAnd", StringType),          // JSON criterion list
    StructField("criteriaOr", StringType),
    StructField("permissions", StringType)))         // JSON permission list

  val pipelines: StructType = StructType(Seq(
    StructField("databaseId", StringType, nullable = false),
    StructField("pipelineId", StringType, nullable = false),
    StructField("pipelineType", StringType),
    StructField("pipelineExecutionType", StringType), // Lambda|SQS|EventBridge
    StructField("waitForCallback", BooleanType),
    StructField("enabled", BooleanType),
    StructField("userProvidedResource", StringType)))

  val workflowDefs: StructType = StructType(Seq(
    StructField("databaseId", StringType, nullable = false),
    StructField("workflowId", StringType, nullable = false),
    StructField("pipelineIds", ArrayType(StringType)),
    StructField("description", StringType)))

  val workflowExecutions: StructType = StructType(Seq(
    StructField("databaseId", StringType, nullable = false),
    StructField("assetId", StringType, nullable = false),
    StructField("executionId", StringType, nullable = false),
    StructField("workflowId", StringType),
    StructField("executionStatus", StringType),
    StructField("startedAt", TimestampType),
    StructField("stoppedAt", TimestampType),
    StructField("inputFileKey", StringType)))

  /** Metadata schema definitions v2 (storageBuilder :974-1027). */
  val metadataSchemas: StructType = StructType(Seq(
    StructField("metadataSchemaId", StringType, nullable = false),
    StructField("databaseId", StringType, nullable = false),
    StructField("metadataEntityType", StringType), // asset | file
    StructField("field", StringType),
    StructField("valueType", StringType),
    StructField("required", BooleanType),
    StructField("controlledList", ArrayType(StringType)),
    StructField("sequence", IntegerType)))

  val subscriptions: StructType = StructType(Seq(
    StructField("eventName", StringType, nullable = false),
    StructField("entityNameId", StringType, nullable = false),
    StructField("subscribers", ArrayType(StringType))))

  /** Multipart upload tracking rows (storageBuilder :1293-1339 —
    * AssetUploadsStorageTable, PK uploadId / SK assetId, GSIs on
    * assetId, databaseId, and (UserId, createdAt); record shape from
    * `handlers/assets/uploadFile.py:272-299`). `expectedParts` is the
    * part plan of `calculate_num_parts` (:90-104); reconciliation
    * against received parts is `up1_upload_reconcile`. */
  val uploads: StructType = StructType(Seq(
    StructField("uploadId", StringType, nullable = false),
    StructField("assetId", StringType, nullable = false),
    StructField("databaseId", StringType),
    StructField("userId", StringType),
    StructField("uploadType", StringType), // assetFile | preview
    StructField("expectedParts", IntegerType),
    StructField("createdAt", TimestampType),
    StructField("status", StringType)))

  /** API keys (storageBuilder :1340-1378 — ApiKeyStorageTable, PK
    * apiKeyId, GSIs apiKeyHashIndex / userIdIndex; record shape from
    * `handlers/auth/apiKeyService.py:145-175` — the plaintext key is
    * returned once, only its sha256 hash is stored). */
  val apiKeys: StructType = StructType(Seq(
    StructField("apiKeyId", StringType, nullable = false),
    StructField("apiKeyHash", StringType),
    StructField("keyName", StringType),
    StructField("userId", StringType),
    StructField("expiresAt", StringType), // ISO date or '' = never
    StructField("isActive", BooleanType),
    StructField("createdAt", TimestampType)))

  /** Per-link metadata KV (storageBuilder :1182-1197 —
    * AssetLinksMetadataStorageTable, PK assetLinkId / SK metadataKey,
    * NEW_IMAGE stream into the indexer :1615; record shape from
    * `handlers/metadata/metadataService.py:380-430` — listings return
    * ALL rows for a link, SK-descending, gated on BOTH endpoint assets'
    * authz). */
  val assetLinkMetadata: StructType = StructType(Seq(
    StructField("assetLinkId", StringType, nullable = false),
    StructField("metadataKey", StringType, nullable = false),
    StructField("metadataValue", StringType),
    StructField("metadataValueType", StringType)))

  /** Database-level metadata KV (storageBuilder :843-872 —
    * DatabaseMetadataStorageTableV2, PK metadataKey / SK databaseId,
    * GSI DatabaseIdIndex(databaseId, metadataKey); listing shape from
    * `metadataService.py:3806-3890` — the per-database listing runs on
    * the GSI, key-descending, then enriches each row against the
    * aggregated [databaseId, GLOBAL] metadata schemas). */
  val databaseMetadata: StructType = StructType(Seq(
    StructField("metadataKey", StringType, nullable = false),
    StructField("databaseId", StringType, nullable = false),
    StructField("metadataValue", StringType),
    StructField("metadataValueType", StringType)))

  /** Feature-flag rows (storageBuilder :699-709 —
    * AppFeatureEnabledStorageTable, PK featureName; scanned whole by
    * `handlers/config/configService.py:19-78`, which emits the enabled
    * set as one concatenated `featuresEnabled` string). */
  val appFeatures: StructType = StructType(Seq(
    StructField("featureName", StringType, nullable = false)))

  /** User directory rows (storageBuilder :1077-1083 — UserStorageTable,
    * PK userId; attribute shape from
    * `handlers/auth/cognitoUserService.py:71-92`). */
  val users: StructType = StructType(Seq(
    StructField("userId", StringType, nullable = false),
    StructField("email", StringType),
    StructField("phone", StringType),
    StructField("enabled", BooleanType),
    StructField("mfaEnabled", BooleanType)))

  /** The 13 metadata value types (metadata.py:21-35). */
  val MetadataValueTypes: Seq[String] = Seq(
    "string", "multiline_string", "inline_controlled_list", "number",
    "boolean", "date", "json", "xyz", "wxyz", "matrix4x4", "geopoint",
    "geojson", "lla")

  /** Parse schemas for the structured metadata value types (§1.2;
    * metadata.py:96-214) — `from_json` targets for typed access. */
  val XyzSchema: StructType = StructType(Seq(
    StructField("x", DoubleType), StructField("y", DoubleType),
    StructField("z", DoubleType)))

  val WxyzSchema: StructType = StructType(Seq(
    StructField("w", DoubleType), StructField("x", DoubleType),
    StructField("y", DoubleType), StructField("z", DoubleType)))

  val Matrix4x4Schema: DataType = ArrayType(ArrayType(DoubleType))

  /** GeoJSON Point (metadata.py:159-172). */
  val GeoPointSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("coordinates", ArrayType(DoubleType))))

  /** {lat ∈ [-90,90], long ∈ [-180,180], alt} (metadata.py:183-214). */
  val LlaSchema: StructType = StructType(Seq(
    StructField("lat", DoubleType), StructField("long", DoubleType),
    StructField("alt", DoubleType)))
}
