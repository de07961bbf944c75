package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Search-request → Catalyst `Column` compiler.
  *
  * Reference equivalent: `backend/backend/handlers/search/search.py`
  * (`DualIndexQueryBuilder`, :626-1121), which emits OpenSearch bool-DSL.
  * We emit declarative `Column` trees instead, so Catalyst pushes the whole
  * predicate down to the parquet scan — including row security, which the
  * reference can only post-filter (search.py:1711-1737). That removes the
  * reference's ×2 over-fetch buffer (search.py:969-976) entirely.
  *
  * Scale: everything here is a scalar expression inside whole-stage codegen;
  * no UDFs, no shuffles are introduced by predicate compilation itself.
  */
object QueryCompiler {

  /** F1 — bool composition (search.py:1002-1072): must AND'd, mustNot
    * negated, should OR'd with minimum_should_match=1, filter AND'd
    * (non-scoring in the reference; identical semantics here). */
  def boolQuery(
      must: Seq[Column] = Nil,
      mustNot: Seq[Column] = Nil,
      should: Seq[Column] = Nil,
      filter: Seq[Column] = Nil): Column = {
    val clauses =
      must ++ filter ++
        mustNot.map(c => !c) ++
        (if (should.nonEmpty) Seq(should.reduce(_ || _)) else Nil)
    if (clauses.isEmpty) lit(true) else clauses.reduce(_ && _)
  }

  /** F2 — exact term on a keyword field (search.py:566-571). */
  def term(c: Column, value: String): Column = c === lit(value)

  /** F3 — wildcard/substring text match (search.py:540-582,1074-1121).
    * If the user pattern contains `*`/`?` they are honored (translated to
    * SQL LIKE `%`/`_`, other LIKE metachars escaped); otherwise the query
    * is an implicit case-insensitive substring match. */
  def wildcard(c: Column, pattern: String): Column =
    if (pattern.contains('*') || pattern.contains('?')) {
      val like = pattern
        .replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
        .replace('*', '%').replace('?', '_')
      lower(c).like(like.toLowerCase)
    } else lower(c).contains(pattern.toLowerCase)

  /** F6 pair semantics — exact match unless the value carries wildcards
    * (search.py:1201-1255). */
  def wildcardOrExact(c: Column, value: String): Column =
    if (value.contains('*') || value.contains('?')) wildcard(c, value)
    else term(c, value)

  /** F3 multi-field — one query over a field list, OR-folded. */
  def multiField(cols: Seq[Column], pattern: String): Column =
    cols.map(wildcard(_, pattern)).reduce(_ || _)

  /** F5 — field-exists (search.py:774-780). */
  def exists(c: Column): Column = c.isNotNull

  /** F12 — token predicate list (models/search.py:110-115), combined with
    * `operation` ∈ AND|OR (search.py:626-755). `resolve` maps a
    * propertyKey to the column(s) it addresses ("all" → every field). */
  def tokens(
      ts: Seq[Token],
      operation: String,
      resolve: String => Seq[Column]): Column = {
    if (ts.isEmpty) return lit(true)
    val per = ts.map { t =>
      val cols = resolve(t.propertyKey)
      t.operator match {
        case "="  => cols.map(term(_, t.value)).reduce(_ || _)
        case ":"  => cols.map(wildcard(_, t.value)).reduce(_ || _)
        case "!=" => !cols.map(term(_, t.value)).reduce(_ || _)
        case "!:" => !cols.map(wildcard(_, t.value)).reduce(_ || _)
        case op   => throw new IllegalArgumentException(s"bad operator $op")
      }
    }
    if (operation.equalsIgnoreCase("OR")) per.reduce(_ || _)
    else per.reduce(_ && _)
  }

  /** F9 — archived exclusion (search.py:649-651). */
  def archivedExclusion(archived: Column, includeArchived: Boolean): Column =
    if (includeArchived) lit(true) else !coalesce(archived, lit(false))

  /** F10 — accessible-database restriction (search.py:634-647):
    * empty set compiles to match-nothing. */
  def accessibleDatabases(dbCol: Column, dbs: Option[Seq[String]]): Column =
    dbs match {
      case None                 => lit(true)
      case Some(s) if s.isEmpty => lit(false)
      case Some(s)              => dbCol.isInCollection(s)
    }

  /** O3 — deterministic relevance score (documented deviation from BM25,
    * SURVEY §2.5/O3): Σ weight × matchIndicator over searched fields. */
  def score(fields: Seq[(Column, Double)], q: String): Column =
    fields.map { case (c, w) =>
      when(wildcard(c, q), lit(w)).otherwise(lit(0.0))
    }.reduce(_ + _)

  /** F13 — min-score cut (search.py:993-995). */
  val MinScore = 0.01

  /** F15 — highlight fragments with sentinel tags (search.py:869-886). */
  def highlight(c: Column, q: String, open: String = "[", close: String = "]"): Column =
    when(wildcard(c, q),
      regexp_replace(c, s"(?i)(${java.util.regex.Pattern.quote(q)})", s"$open$$1$close"))
      .otherwise(c)

  /** O1 — sort compilation (search.py:1305-1371). */
  def sortCols(specs: Seq[SortField], resolve: String => Column): Seq[Column] =
    specs.map(s => if (s.descending) resolve(s.field).desc else resolve(s.field).asc)

  /** O4 — offset/size pagination with reference bounds
    * (models/search.py:126-147: from+size ≤ 10000, size ≤ 2000). The plan
    * uses the native global-limit/offset operators (no row_number shuffle). */
  def paginate(df: DataFrame, from: Int, size: Int): DataFrame = {
    require(from + size <= 10000, "from + size must be <= 10000")
    require(size <= 2000, "size must be <= 2000")
    (if (from > 0) df.offset(from) else df).limit(size)
  }

  /** O6 — keyset pagination (common/dynamodb.py:98-144): strictly-after
    * `token` on a total-ordered key; scales (no global offset skip). */
  def keysetPage(df: DataFrame, key: Column, token: Option[Column], pageSize: Int): DataFrame = {
    val filtered = token match {
      case Some(t) => df.filter(key > t)
      case None    => df
    }
    filtered.orderBy(key.asc).limit(pageSize)
  }

  /** O5 — authorization over-fetch pagination, reproduced as a
    * REFERENCE-COMPATIBILITY shim (search.py:969-976: buffer_multiplier
    * = 2.0, opensearch_size = min((from+size)*2, 10000); Casbin
    * post-filter at search.py:1520-1536; page slice at :1739-1748 with
    * total = the filtered count WITHIN the fetched window). The default
    * graft path pushes authorization into the scan (F11) and pages the
    * exact result — O5 is obsolete there — but the reference's shape has
    * two OBSERVABLE artifacts a compatibility consumer may depend on:
    * a page can come back short when auth rejects more than the 2×
    * buffer allowed for, and `total_hits` counts only survivors of the
    * over-fetched window, not the true corpus total. This reproduces
    * both, deterministically. Scale: the pre-auth window is a bounded
    * top-K (TakeOrderedAndProject — never a global sort), and the
    * post-filter + count run on ≤ 10 000 rows. */
  def overfetchPage(df: DataFrame, sortKey: Seq[Column], auth: Column,
      from: Int, size: Int, bufferMultiplier: Double = 2.0): DataFrame = {
    require(from >= 0 && size > 0, "from must be >= 0 and size > 0")
    val window = math.min(((from + size) * bufferMultiplier).toInt, 10000)
    val filtered = df.orderBy(sortKey: _*).limit(window).filter(auth)
    // total_hits via an unpartitioned window COUNT over the filtered
    // frame: ≤ `window` (10k) rows by construction, and it keeps the
    // whole shim ONE pass over the top-k scan — a separate count
    // aggregate cross-joined back would execute the ordered window
    // twice
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val page = filtered
      .withColumn("total_hits", count(lit(1)).over(w).cast("long"))
      .orderBy(sortKey: _*)
    (if (from > 0) page.offset(from) else page).limit(size)
  }

  /** A1 — faceted term counts (search.py:1392-1486): bucket cap 1000,
    * count-desc with key tiebreak for determinism (SURVEY §7.5.4). */
  def facet(df: DataFrame, field: Column,
      cap: Int = SearchLimits.FacetBuckets): DataFrame =
    df.groupBy(field.as("facet_value")).count()
      .orderBy(col("count").desc, col("facet_value").asc)
      .limit(cap)
}
