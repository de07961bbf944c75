package graft.query

/** Typed search-request model, the Spark-side equivalent of the reference's
  * Pydantic request IR (`backend/backend/models/search.py:110-206`).
  *
  * The reference compiles this IR into OpenSearch bool-DSL; our compiler
  * ([[QueryCompiler]]) compiles it into a Catalyst `Column` tree, so the
  * whole predicate is pushed into the scan instead of evaluated remotely.
  */

/** models/search.py:110-115 — one token predicate.
  * `operator` ∈ `=` (exact), `:` (contains), `!=`, `!:`;
  * `propertyKey` is a field name or `"all"`. */
final case class Token(propertyKey: String, operator: String, value: String)

/** models/search.py:149-206 — the advanced-search request. */
final case class SearchRequest(
    tokens: Seq[Token] = Nil,
    operation: String = "AND",                 // AND | OR across tokens
    query: Option[String] = None,              // free-text, all fields
    filters: Map[String, String] = Map.empty,  // exact term filters (F2)
    accessibleDatabases: Option[Seq[String]] = None, // F10; None = unrestricted
    includeArchived: Boolean = false,          // F9
    sort: Seq[SortField] = Nil,                // O1
    from: Int = 0,                             // O4
    size: Int = 100,
    explain: Boolean = false)                  // F15/F16 highlight+explanation

/** handlers/search/search.py:1305-1371 — one sort key. */
final case class SortField(field: String, descending: Boolean = false)
