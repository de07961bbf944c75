package graft.docs

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class DocBuilderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val assets = Seq(
    ("db1", "a1", "Model One", "a 3d model", "gltf", "b1", true,
      Seq("prod"), "assets/a1", null.asInstanceOf[String], "v2", false),
    ("db1", "a2", "Model Two", "raw scan", "obj", "b1", false,
      Seq.empty[String], "assets/a2", "prev/a2.png", null.asInstanceOf[String], true))
    .toDF("databaseId", "assetId", "assetName", "description", "assetType",
      "bucketId", "isDistributable", "tags", "assetLocationKey",
      "previewLocationKey", "currentVersionId", "archived")

  private lazy val buckets =
    Seq(("b1", "vams-bucket", "/", true))
      .toDF("bucketId", "bucketName", "baseAssetsPrefix", "isVersioningEnabled")

  private lazy val metadata = Seq(
    ("db1", "a1", "/", "Author!", "alice", "string"),
    ("db1", "a1", "/", "polyCount", "1200", "number"),
    ("db1", "a1", "/file.gltf", "fileOnly", "skip-me", "string"))
    .toDF("databaseId", "assetId", "filePath", "metadataKey",
      "metadataValue", "metadataValueType")

  private lazy val versions = Seq(
    ("db1", "a1", "v1", null.asInstanceOf[String], "first",
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), false, "alice"),
    ("db1", "a1", "v2", "latest", "second",
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), true, "bob"))
    .toDF("databaseId", "assetId", "assetVersionId", "versionAlias",
      "comment", "dateCreated", "isCurrentVersion", "createdBy")

  private lazy val links = Seq(
    ("l1", "db1", "a1", "db1", "a2", "parentChild", null.asInstanceOf[String]),
    ("l2", "db1", "a2", "db1", "a1", "related", null.asInstanceOf[String]))
    .toDF("assetLinkId", "fromDatabaseId", "fromAssetId", "toDatabaseId",
      "toAssetId", "relationshipType", "assetLinkAliasId")

  private lazy val docs = DocBuilder.buildAssetDocs(
    assets, buckets, metadata, versions, links).cache()

  test("typed-prefix columns are present (models/indexing.py:221-257)") {
    val expect = Seq("_docId", "_rectype", "str_databaseid", "str_assetid",
      "str_assetname", "str_bucketname", "str_assettype", "str_description",
      "bool_isdistributable", "list_tags", "str_asset_version_id",
      "date_asset_version_createdate", "str_asset_version_comment",
      "bool_has_asset_children", "bool_has_asset_parents",
      "bool_has_assets_related", "bool_archived", "str_assetlocationkey",
      "str_previewfilekey", "MD")
    assert(docs.columns.toSeq == expect)
  }

  test("doc id is deterministic db#asset; bucket name joined in") {
    val r = docs.filter($"str_assetid" === "a1").head()
    assert(r.getAs[String]("_docId") == "db1#a1")
    assert(r.getAs[String]("str_bucketname") == "vams-bucket")
  }

  test("metadata pivots to a sanitized-key map, asset-level rows only") {
    val md = docs.filter($"str_assetid" === "a1")
      .select("MD").head().getAs[Map[String, String]]("MD")
    assert(md == Map("author" -> "alice", "polycount" -> "1200"))
    val md2 = docs.filter($"str_assetid" === "a2")
      .select("MD").head().getAs[Map[String, String]]("MD")
    assert(md2.isEmpty)
  }

  test("current version is the isCurrentVersion row (O8 top-1)") {
    val r = docs.filter($"str_assetid" === "a1").head()
    assert(r.getAs[String]("str_asset_version_id") == "v2")
    assert(r.getAs[String]("date_asset_version_createdate")
      == "2024-02-01T00:00:00")
  }

  test("link flags: direction + relationship type classified (J3)") {
    val a1 = docs.filter($"str_assetid" === "a1").head()
    assert(a1.getAs[Boolean]("bool_has_asset_children"))
    assert(!a1.getAs[Boolean]("bool_has_asset_parents"))
    assert(a1.getAs[Boolean]("bool_has_assets_related"))
    val a2 = docs.filter($"str_assetid" === "a2").head()
    assert(!a2.getAs[Boolean]("bool_has_asset_children"))
    assert(a2.getAs[Boolean]("bool_has_asset_parents"))
    assert(a2.getAs[Boolean]("bool_has_assets_related"))
  }

  test("archived flag carried (F9 source of truth)") {
    assert(docs.filter($"bool_archived").select("str_assetid")
      .as[String].collect().toSeq == Seq("a2"))
  }

  test("typed metadata columns derive per the index-time detection rules (§1.2)") {
    val typed = DocBuilder.typedMetadataColumns(docs, Seq("polyCount", "author"))
      .filter($"str_assetid" === "a1").head()
    assert(typed.getAs[String]("MD_str_polycount") == "1200")
    assert(typed.getAs[Double]("MD_num_polycount") == 1200.0)
    assert(typed.getAs[Any]("MD_date_polycount") == null)
    assert(typed.getAs[String]("MD_str_author") == "alice")
    assert(typed.getAs[Any]("MD_num_author") == null)
    assert(typed.getAs[Any]("MD_bool_author") == null)
  }
}
