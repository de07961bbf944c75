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
    explain: Boolean = false,                  // F15/F16 highlight+explanation
    scorer: String = "weighted")               // O3: weighted | bm25

/** handlers/search/search.py:1305-1371 — one sort key. */
final case class SortField(field: String, descending: Boolean = false)

/** Request guards of models/search.py:126-147,170-181 — the reference
  * rejects out-of-envelope pages before touching the engine; so do we
  * (cheap correctness-compat, SURVEY §4 "rate/size guards"). */
object SearchLimits {
  val MaxWindow = 10000 // from + size ≤ 10 000 (OpenSearch window limit)
  val MaxSize   = 2000  // size ∈ [1, 2000]
  val FacetBuckets = 1000 // terms-agg bucket cap (search.py:1409)

  /** Throws IllegalArgumentException exactly where the reference's
    * Pydantic validators reject. */
  def validate(req: SearchRequest): SearchRequest = {
    require(req.size >= 1 && req.size <= MaxSize,
      s"size must be in [1, $MaxSize], got ${req.size}")
    require(req.from >= 0, s"from must be >= 0, got ${req.from}")
    require(req.from + req.size <= MaxWindow,
      s"from + size must be <= $MaxWindow, got ${req.from + req.size}")
    req
  }
}
