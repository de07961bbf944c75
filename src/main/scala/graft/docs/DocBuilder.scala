package graft.docs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Codecs

/** Search-document materialization — the batch equivalent of the
  * reference's indexer lambdas.
  *
  * Reference: asset docs `backend/backend/handlers/indexing/assetIndexer.py`
  * (orchestration :602-737, doc build :469-528, metadata pivot :339-377,
  * current version :379-403, link flags :405-454); file docs
  * `fileIndexer.py:436-499,960-1100`; typed-prefix field generation
  * `backend/backend/models/indexing.py:58-121,221-257`.
  *
  * Plan shape (the J1/J2 joins): fact table ⋈ broadcast dims ⋈ grouped
  * details. At 100 TB: assets/files shuffle once on (databaseId, assetId);
  * buckets/databases broadcast; metadata is pre-pivoted with map-side
  * combine before its join. Docs tables are written partitioned by
  * `databaseId` so the F10 access filter prunes partitions.
  */
object DocBuilder {

  private val entityKeys = Seq("databaseId", "assetId")

  /** A7 — pivot long-form metadata rows into one map per entity
    * (assetIndexer.py:339-377). Asset-level rows only (filePath "/"),
    * keys sanitized (C2). */
  def pivotMetadata(metadata: DataFrame, assetLevelOnly: Boolean = true): DataFrame = {
    val md = if (assetLevelOnly) metadata.filter(col("filePath") === "/") else metadata
    // a NULL metadata key cannot index (and map_from_entries throws
    // NULL_MAP_KEY) — an attribute without a name does not exist on the
    // doc, exactly as in the reference's pivot
    md.filter(col("metadataKey").isNotNull)
      .groupBy(entityKeys.map(col): _*)
      .agg(map_from_entries(collect_list(struct(
        Codecs.sanitizeFieldName(col("metadataKey")).as("k"),
        col("metadataValue").as("v")))).as("MD"))
  }

  /** File-level pivot keyed by (db, asset, filePath) for the file docs.
    * NULL keys are dropped (see [[pivotMetadata]]). */
  def pivotFileKv(kv: DataFrame, keyCol: String, valCol: String, out: String): DataFrame =
    kv.filter(col(keyCol).isNotNull)
      .groupBy(col("databaseId"), col("assetId"), col("filePath"))
      .agg(map_from_entries(collect_list(struct(
        Codecs.sanitizeFieldName(col(keyCol)).as("k"),
        col(valCol).as("v")))).as(out))

  /** O8 — current-version top-1 per asset (assetIndexer.py:379-403). */
  def currentVersion(versions: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    versions
      .withColumn("rn", row_number().over(
        Window.partitionBy(entityKeys.map(col): _*)
          .orderBy(col("isCurrentVersion").desc, col("dateCreated").desc,
            col("assetVersionId").desc)))
      .filter(col("rn") === 1)
      .select(col("databaseId"), col("assetId"),
        col("assetVersionId").as("str_asset_version_id"),
        date_format(col("dateCreated"), "yyyy-MM-dd'T'HH:mm:ss")
          .as("date_asset_version_createdate"),
        col("comment").as("str_asset_version_comment"))
  }

  /** J3/A6 — per-asset relationship flags from the edge table
    * (assetIndexer.py:405-454). */
  def linkFlags(links: DataFrame): DataFrame = {
    val out = links.groupBy(
        col("fromDatabaseId").as("databaseId"), col("fromAssetId").as("assetId"))
      .agg(max(when(col("relationshipType") === "parentChild", 1).otherwise(0))
          .as("child_edges"),
        max(when(col("relationshipType") === "related", 1).otherwise(0))
          .as("rel_out"))
    val in = links.groupBy(
        col("toDatabaseId").as("databaseId"), col("toAssetId").as("assetId"))
      .agg(max(when(col("relationshipType") === "parentChild", 1).otherwise(0))
          .as("parent_edges"),
        max(when(col("relationshipType") === "related", 1).otherwise(0))
          .as("rel_in"))
    out.join(in, entityKeys, "full_outer")
      .select(col("databaseId"), col("assetId"),
        (coalesce(col("child_edges"), lit(0)) === 1).as("bool_has_asset_children"),
        (coalesce(col("parent_edges"), lit(0)) === 1).as("bool_has_asset_parents"),
        ((coalesce(col("rel_out"), lit(0)) === 1) ||
          (coalesce(col("rel_in"), lit(0)) === 1)).as("bool_has_assets_related"))
  }

  /** §1.2 — dynamic typed-field derivation for hot metadata keys: the
    * reference's index-time value inspection (models/indexing.py:58-121)
    * lands each metadata value in a type-prefixed field
    * (`MD_num_*` double, `MD_date_*`, `MD_bool_*`, `MD_str_*` text) via
    * dynamic templates; here each requested key becomes typed top-level
    * columns with the same detection rules — sortable/filterable with
    * parquet stats, while the MD map stays the lossless catch-all. */
  def typedMetadataColumns(docs: DataFrame, keys: Seq[String]): DataFrame =
    keys.foldLeft(docs) { (df, k0) =>
      val k = k0.toLowerCase
      val v = element_at(col("MD"), k)
      df.withColumn(s"MD_str_$k", v)
        .withColumn(s"MD_num_$k", v.try_cast("double"))
        .withColumn(s"MD_bool_$k",
          when(lower(v).isin("true", "1", "yes", "on"), true)
            .when(lower(v).isin("false", "0", "no", "off"), false))
        .withColumn(s"MD_date_$k",
          when(v.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}"), try_to_timestamp(v)))
    }

  /** J1 — the asset search-doc table with the typed-prefix columns of
    * models/indexing.py:221-257. */
  def buildAssetDocs(
      assets: DataFrame,
      buckets: DataFrame,
      metadata: DataFrame,
      versions: DataFrame,
      links: DataFrame): DataFrame = {
    assets
      .join(broadcast(buckets.select(col("bucketId"), col("bucketName"))),
        Seq("bucketId"), "left")
      .join(pivotMetadata(metadata), entityKeys, "left")
      .join(currentVersion(versions), entityKeys, "left")
      .join(linkFlags(links), entityKeys, "left")
      .select(
        concat_ws("#", col("databaseId"), col("assetId")).as("_docId"),
        lit("asset").as("_rectype"),
        col("databaseId").as("str_databaseid"),
        col("assetId").as("str_assetid"),
        col("assetName").as("str_assetname"),
        col("bucketName").as("str_bucketname"),
        col("assetType").as("str_assettype"),
        col("description").as("str_description"),
        coalesce(col("isDistributable"), lit(false)).as("bool_isdistributable"),
        col("tags").as("list_tags"),
        col("str_asset_version_id"),
        col("date_asset_version_createdate"),
        col("str_asset_version_comment"),
        coalesce(col("bool_has_asset_children"), lit(false))
          .as("bool_has_asset_children"),
        coalesce(col("bool_has_asset_parents"), lit(false))
          .as("bool_has_asset_parents"),
        coalesce(col("bool_has_assets_related"), lit(false))
          .as("bool_has_assets_related"),
        coalesce(col("archived"), lit(false)).as("bool_archived"),
        col("assetLocationKey").as("str_assetlocationkey"),
        col("previewLocationKey").as("str_previewfilekey"),
        coalesce(col("MD"), map()).as("MD"))
  }

  /** J2 — the file search-doc table (fileIndexer.py:960-1100,
    * models/indexing.py:125-149). */
  def buildFileDocs(
      files: DataFrame,
      assets: DataFrame,
      buckets: DataFrame,
      fileMetadata: DataFrame,
      attributes: DataFrame): DataFrame = {
    val fileKeys = Seq("databaseId", "assetId", "fileKey")
    val md = pivotFileKv(fileMetadata, "metadataKey", "metadataValue", "MD")
      .withColumnRenamed("filePath", "fileKey")
    val ab = pivotFileKv(attributes, "attributeKey", "attributeValue", "AB")
      .withColumnRenamed("filePath", "fileKey")
    files
      .join(broadcast(assets.select(col("databaseId"), col("assetId"),
        col("assetName"), col("assetType"))), entityKeys, "left")
      .join(broadcast(buckets.select(col("bucketName"), col("bucketId"))),
        files("bucketName") === buckets("bucketName"), "left")
      .drop(buckets("bucketName"))
      .join(md, fileKeys, "left")
      .join(ab, fileKeys, "left")
      .select(
        concat_ws("#", col("databaseId"), col("assetId"), col("fileKey"))
          .as("_docId"),
        lit("file").as("_rectype"),
        col("databaseId").as("str_databaseid"),
        col("assetId").as("str_assetid"),
        col("assetName").as("str_assetname"),
        col("fileKey").as("str_key"),
        coalesce(col("fileExt"), Codecs.fileExtension(col("fileKey")))
          .as("str_fileext"),
        date_format(col("lastModified"), "yyyy-MM-dd'T'HH:mm:ss")
          .as("date_lastmodified"),
        col("fileSize").as("num_filesize"),
        Codecs.stripEtagQuotes(col("etag")).as("str_etag"),
        col("s3VersionId").as("str_s3_version_id"),
        coalesce(col("isPrimary"), lit(false)).as("bool_isprimary"),
        coalesce(col("archived"), lit(false)).as("bool_archived"),
        coalesce(col("MD"), map()).as("MD"),
        coalesce(col("AB"), map()).as("AB"))
  }
}
