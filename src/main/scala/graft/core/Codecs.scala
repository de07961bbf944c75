package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level codecs mirroring the reference's glue helpers.
  *
  * - Field-name sanitization: reference `backend/backend/models/indexing.py:16-54`
  *   (lowercase, strip `[^a-z0-9_-]`, no leading underscore, <=255 chars).
  * - Composite keys `db:asset:path` build/split: reference
  *   `backend/backend/handlers/indexing/assetIndexer.py:345-353,548,879-890`.
  * - Type coercion (string -> typed with autodetect fallback): reference
  *   `backend/backend/handlers/indexing/assetIndexer.py:184-276`.
  *
  * All of these are pure `Column` expressions (whole-stage-codegen friendly;
  * no UDFs), so they stay inside the generated plan at any scale.
  */
object Codecs {

  /** indexing.py:16-54 — sanitize a dynamic field name. */
  def sanitizeFieldName(c: Column): Column =
    substring(
      regexp_replace(regexp_replace(lower(c), "[^a-z0-9_-]", ""), "^_+", ""),
      1, 255)

  /** assetIndexer.py:345-353 — build `a:b:c` composite key. */
  def compositeKey(parts: Column*): Column = concat_ws(":", parts: _*)

  /** assetIndexer.py:879-890 — split composite key, 0-based part index.
    * `get` (not `element_at`): a malformed/short key — e.g. one built by
    * `concat_ws` from a NULL component, which silently skips it — reads
    * the missing part as NULL instead of throwing the ANSI
    * out-of-bounds error mid-job. Well-formed keys are unaffected. */
  def keyPart(key: Column, idx: Int): Column =
    get(split(key, ":"), lit(idx))

  /** assetIndexer.py:184-276 — type autodetect: bool set, int-then-float,
    * ISO date, string fallback. Pure regex + `when` chain (codegen'd). */
  def detectType(c: Column): Column =
    when(lower(c).isin("true", "false", "yes", "no", "on", "off"), lit("boolean"))
      .when(c.rlike("^[+-]?[0-9]+$"), lit("integer"))
      .when(c.rlike("^[+-]?[0-9]+\\.[0-9]+$"), lit("float"))
      .when(c.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}([T ][0-9]{2}:[0-9]{2}:[0-9]{2})?"),
        lit("date"))
      .otherwise(lit("string"))

  /** fileIndexer.py:1023-1038 — file extension from a key/path. */
  def fileExtension(c: Column): Column = regexp_extract(c, "\\.([^.]+)$", 1)

  /** assetIndexer.py:496-505 — version label `v{id} ({alias})`. */
  def versionLabel(id: Column, alias: Column): Column =
    concat(lit("v"), id, lit(" ("), alias, lit(")"))

  /** fileIndexer.py:511,555 — strip quotes from an ETag. */
  def stripEtagQuotes(c: Column): Column = regexp_replace(c, "\"", "")

  /** S11 — the S3 multipart composite ETag (public algorithm: the MD5
    * of the CONCATENATED BINARY MD5 digests of the parts, suffixed with
    * `-{numParts}`), over an array of per-part lowercase hex MD5 strings
    * already in part order. uploadFile.py completes multipart uploads
    * against per-part ETags (:897-941 verifies the part inventory,
    * :1583-1658 calls complete_multipart_upload) — S3 computes this
    * value server-side; a reconciliation pipeline recomputes it to
    * verify assembled objects. Pure Column expression (concat the hex
    * digests, `unhex` back to the binary digest stream, md5) — codegen
    * friendly, no UDF. */
  def multipartETag(partMd5Hex: Column): Column =
    concat(md5(unhex(array_join(partMd5Hex, ""))),
      lit("-"), size(partMd5Hex).cast("string"))

  /** C5 — validity of a typed metadata value per its declared type tag
    * (metadata.py:44-221): structured types parse against their schema
    * (Schemas.XyzSchema etc.), `lla` additionally range-checks
    * lat ∈ [-90,90] / long ∈ [-180,180], scalars coerce. One `when`
    * chain — usable as a write-path CHECK or a validation report
    * predicate, fully codegen'd. */
  def typedValueValid(v: Column, t: Column): Column = {
    import graft.core.{Schemas => S}
    val xyz = from_json(v, S.XyzSchema)
    val wxyz = from_json(v, S.WxyzSchema)
    val m = from_json(v, S.Matrix4x4Schema)
    val gp = from_json(v, S.GeoPointSchema)
    val lla = from_json(v, S.LlaSchema)
    when(t === "number", v.try_cast("double").isNotNull)
      .when(t === "boolean",
        lower(v).isin("true", "false", "1", "0", "yes", "no", "on", "off"))
      .when(t === "date", try_to_timestamp(v).isNotNull)
      .when(t === "json", get_json_object(v, "$").isNotNull)
      .when(t === "xyz", xyz.isNotNull && xyz.getField("x").isNotNull &&
        xyz.getField("y").isNotNull && xyz.getField("z").isNotNull)
      .when(t === "wxyz", wxyz.isNotNull && wxyz.getField("w").isNotNull &&
        wxyz.getField("x").isNotNull && wxyz.getField("y").isNotNull &&
        wxyz.getField("z").isNotNull)
      .when(t === "matrix4x4", m.isNotNull && size(m) === 4 &&
        forall(m, r => r.isNotNull && size(r) === 4 &&
          !exists(r, x => x.isNull)))
      .when(t === "geopoint", gp.isNotNull &&
        gp.getField("type") === "Point" &&
        size(gp.getField("coordinates")) === 2)
      .when(t === "geojson", gp.isNotNull && gp.getField("type").isNotNull)
      .when(t === "lla", lla.isNotNull &&
        lla.getField("lat").between(-90.0, 90.0) &&
        lla.getField("long").between(-180.0, 180.0))
      .otherwise(v.isNotNull) // string / multiline / controlled list
  }
}
