package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Field-name resolution and classification for the search surface.
  *
  * Reference: prefix/type-prefix parsing `backend/backend/handlers/search/
  * search.py:504-538,913-947` (F8); core-vs-metadata-vs-excluded field
  * classification `:406-467` with exclusions from
  * `backend/backend/models/indexing.py:70-72` (F14); per-hit match
  * explanation `:1569-1621` (F16).
  */
object Fields {

  sealed trait FieldRef
  /** A concrete typed doc column like `str_assetname`. */
  final case class CoreField(name: String) extends FieldRef
  /** A metadata map entry: `MD_str_product` / `MD_.product` → key. */
  final case class MetadataField(key: String) extends FieldRef
  /** A file-attribute map entry (`AB_` prefix). */
  final case class AttributeField(key: String) extends FieldRef

  private val TypePrefixes = Seq("str_", "num_", "bool_", "date_", "list_",
    "gp_", "gs_")

  /** F8 — resolve a user-supplied field name, honoring the back-compat
    * `MD_<typeprefix><key>` and `MD_.<key>` forms. */
  def resolve(name: String): FieldRef = {
    def stripType(s: String): String =
      TypePrefixes.find(s.startsWith).map(p => s.stripPrefix(p)).getOrElse(s)
    if (name.startsWith("MD_.")) MetadataField(name.stripPrefix("MD_."))
    else if (name.startsWith("MD_")) MetadataField(stripType(name.stripPrefix("MD_")))
    else if (name.startsWith("AB_.")) AttributeField(name.stripPrefix("AB_."))
    else if (name.startsWith("AB_")) AttributeField(stripType(name.stripPrefix("AB_")))
    else CoreField(name)
  }

  /** F14 — classify doc columns: excluded system fields (`VAMS_`, `_`
    * internals), metadata/attribute containers, core typed fields. */
  def classify(columns: Seq[String]): (Seq[String], Seq[String], Seq[String]) = {
    val (excluded, rest) = columns.partition(c =>
      c.startsWith("VAMS_") || c.startsWith("_"))
    val (containers, core) = rest.partition(c => c == "MD" || c == "AB")
    (core, containers, excluded)
  }

  /** F16 — match-explanation struct: which searched fields matched the
    * query, plus the score contribution, as a derived column. */
  def explanation(fields: Seq[(String, Double)], q: String): Column = {
    val matched = filter(
      array(fields.map { case (f, _) =>
        when(QueryCompiler.wildcard(col(f), q), lit(f))
          .otherwise(lit(null).cast("string"))
      }: _*),
      _.isNotNull)
    struct(
      matched.as("matched_fields"),
      QueryCompiler.score(fields.map { case (f, w) => (col(f), w) }, q)
        .as("score"))
  }
}
