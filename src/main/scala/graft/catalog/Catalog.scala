package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.query.QueryCompiler

/** Catalog access paths over the entity tables — the S-series operators.
  *
  * Reference: `backend/backend/handlers/assets/assetService.py`
  * (point get :694-725, partition scan :727-806, full scan :808-886),
  * token pagination `backend/backend/common/dynamodb.py:98-144`.
  *
  * Every path is a filter/orderBy/limit over the partitioned table —
  * Catalyst partition pruning + parquet predicate pushdown replace the
  * reference's manual PK/GSI index selection (SURVEY §4).
  */
object Catalog {

  /** S1 — point lookup by full key; partition-pruned. */
  def getAsset(assets: DataFrame, databaseId: String, assetId: String): DataFrame =
    assets.filter(col("databaseId") === databaseId && col("assetId") === assetId)

  /** S2 + O6/O7 — assets of one database, newest key first, keyset-paged.
    * `afterToken` is an OPAQUE continuation token (url-safe base64 of
    * the last assetId, the reference's LastEvaluatedKey encoding —
    * common/dynamodb.py:98-144); produce one with [[nextToken]]. */
  def listAssets(
      assets: DataFrame,
      databaseId: String,
      afterToken: Option[String] = None,
      pageSize: Int = 3000,
      includeArchived: Boolean = false,
      descending: Boolean = true): DataFrame = {
    require(pageSize <= 10000, "pageSize must be <= 10000")
    val base = assets
      .filter(col("databaseId") === databaseId)
      .filter(QueryCompiler.archivedExclusion(col("archived"), includeArchived))
    val paged = afterToken.map(graft.core.Layout.decodeToken) match {
      case Some(t) if descending  => base.filter(col("assetId") < t)
      case Some(t)                => base.filter(col("assetId") > t)
      case None                   => base
    }
    val key = if (descending) col("assetId").desc else col("assetId").asc
    paged.orderBy(key).limit(pageSize)
  }

  /** Continuation token for the page that ended at `lastKey`. */
  def nextToken(lastKey: String): String = graft.core.Layout.encodeToken(lastKey)

  /** S3 — governed full scan (never returns archived unless asked). */
  def scanAssets(assets: DataFrame, includeArchived: Boolean = false): DataFrame =
    assets.filter(QueryCompiler.archivedExclusion(col("archived"), includeArchived))

  /** S5 — file listing with archive status, ordered + keyset-paged. */
  def listFiles(
      files: DataFrame,
      databaseId: String,
      assetId: String,
      afterToken: Option[String] = None,
      pageSize: Int = 1000,
      includeArchived: Boolean = false): DataFrame = {
    val base = files
      .filter(col("databaseId") === databaseId && col("assetId") === assetId)
      .filter(QueryCompiler.archivedExclusion(col("archived"), includeArchived))
    val paged = afterToken.map(graft.core.Layout.decodeToken) match {
      case Some(t) => base.filter(col("fileKey") > t)
      case None    => base
    }
    paged.orderBy(col("fileKey").asc).limit(pageSize)
  }

  /** A5 — count of accessible (non-archived, policy-visible) assets. */
  def countAssets(assets: DataFrame, policyFilter: Column): DataFrame =
    scanAssets(assets).filter(policyFilter)
      .agg(count(lit(1)).as("count"))
}
