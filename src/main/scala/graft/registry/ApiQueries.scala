package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.SearchApi
import graft.core.Tables
import graft.query.{SearchRequest, SortField}

/** End-to-end advanced search (lifecycle SURVEY §3.1) through the
  * SearchApi façade: docs built from orders⋈customer, full predicate
  * stack (archived, accessible set, term filter, free text), scoring,
  * min-score cut, deterministic sort, offset pagination — one plan.
  */
object ApiQueries {
  import QueryDef.sql

  // NOT session-cached (r15 measured both ways): a memo here saves the
  // BM25 scan route's duplicated orders ⋈ customer subtree (idf stats +
  // scored target) but DESTROYS the parquet filter pushdown every facade
  // query's predicate stack relies on — search_advanced went from a
  // pushed-filter fraction-scan to materialize-everything-then-filter
  // (0.16 → 0.84 s at sf0.1), more than the bm25 route saved. The
  // un-memoized join stays: pushdown is worth more than subtree reuse.
  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(
        col("o_orderkey").cast("string").as("_docId"),
        col("c_name").as("str_assetname"),
        col("o_orderstatus").as("str_assettype"),
        col("o_orderpriority").as("str_databaseid"),
        col("c_mktsegment").as("str_description"),
        col("o_orderkey").cast("string").as("str_assetid"),
        (col("o_orderstatus") === "F").as("bool_archived"))

  private val Q = "customer#00000012"

  /** Oracle SQL of the BM25 facade — shared by the corpus-scan gate
    * (`search_advanced_bm25`) and the index-served twin
    * (`search_advanced_bm25_indexed`): identical expected output proves
    * index-served ≡ scan-served at the facade level too. */
  private val Bm25FacadeOracle: String = {
      val fields = Seq("str_assetname", "str_description", "str_assetid",
        "str_databaseid", "str_assettype")
      val catSql = fields.mkString(" || ' ' || ")
      s"""WITH docs AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS _docid,
        |         c_name AS str_assetname,
        |         o_orderstatus AS str_assettype,
        |         o_orderpriority AS str_databaseid,
        |         c_mktsegment AS str_description,
        |         CAST(o_orderkey AS VARCHAR) AS str_assetid,
        |         (o_orderstatus = 'F') AS bool_archived
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |), toks AS (
        |  SELECT *, regexp_split_to_array(trim(lower($catSql)), '\\s+') AS tk
        |  FROM docs
        |), stats AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(len(tk)) AS BIGINT) AS sumdl
        |  FROM toks
        |), terms(term) AS (VALUES ('building'), ('2-high')),
        |tdf AS (
        |  SELECT t.term,
        |         CAST(SUM(CASE WHEN list_contains(d.tk, t.term)
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS df
        |  FROM terms t CROSS JOIN toks d GROUP BY t.term
        |),
        |${graft.query.Bm25.idfSeedSql},
        |${graft.query.Bm25.idfStepsSql},
        |idf AS (SELECT term, (e << 20) + f AS idf_fp FROM l20),
        |f AS (
        |  SELECT * FROM toks
        |  WHERE NOT bool_archived
        |    AND str_databaseid IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
        |    AND str_assettype = 'O'
        |), scored AS (
        |  SELECT d._docid, d.str_assetname, d.str_databaseid,
        |         CAST(SUM(
        |           (i.idf_fp * 44
        |             * len(list_filter(d.tk, x -> x = i.term)) * 1024) //
        |           ((len(list_filter(d.tk, x -> x = i.term)) * 20 + 6) * 1024
        |             + len(d.tk) * ((s.n * 18432) // s.sumdl)
        |             + (len(d.tk) * ((s.n * 18432) % s.sumdl)) // s.sumdl)
        |         ) AS BIGINT) AS score_fp
        |  FROM f d CROSS JOIN idf i, stats s
        |  GROUP BY 1, 2, 3
        |)
        |SELECT _docid, str_assetname, str_databaseid,
        |       CAST(score_fp AS DOUBLE) AS _score
        |FROM scored WHERE score_fp >= 1
        |ORDER BY _score DESC, _docid
        |LIMIT 20 OFFSET 5"""}

  val defs: Seq[QueryDef] = Seq(
    sql("search_advanced",
      s"""WITH docs AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS _docid,
        |         c_name AS str_assetname,
        |         o_orderstatus AS str_assettype,
        |         o_orderpriority AS str_databaseid,
        |         c_mktsegment AS str_description,
        |         CAST(o_orderkey AS VARCHAR) AS str_assetid,
        |         (o_orderstatus = 'F') AS bool_archived
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |), f AS (
        |  SELECT * FROM docs
        |  WHERE NOT bool_archived
        |    AND str_databaseid IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
        |    AND str_assettype = 'O'
        |    AND (lower(str_assetname) LIKE '%$Q%'
        |         OR lower(str_description) LIKE '%$Q%'
        |         OR lower(str_assetid) LIKE '%$Q%'
        |         OR lower(str_databaseid) LIKE '%$Q%'
        |         OR lower(str_assettype) LIKE '%$Q%')
        |), s AS (
        |  SELECT _docid, str_assetname, str_assettype, str_databaseid,
        |    (CASE WHEN lower(str_assetname) LIKE '%$Q%'
        |          THEN CAST(3.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
        |   + CASE WHEN lower(str_description) LIKE '%$Q%'
        |          THEN CAST(2.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
        |   + CASE WHEN lower(str_assetid) LIKE '%$Q%'
        |          THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
        |   + CASE WHEN lower(str_databaseid) LIKE '%$Q%'
        |          THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
        |   + CASE WHEN lower(str_assettype) LIKE '%$Q%'
        |          THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
        |      AS _score
        |  FROM f
        |)
        |SELECT * FROM s WHERE _score > 0.01
        |ORDER BY str_assetname, _score DESC, _docid
        |LIMIT 20 OFFSET 10""")(
      (s, d) => {
        val req = SearchRequest(
          query = Some(Q),
          filters = Map("str_assettype" -> "O"),
          accessibleDatabases = Some(Seq("1-URGENT", "2-HIGH", "3-MEDIUM")),
          sort = Seq(SortField("str_assetname")),
          from = 10, size = 20)
        SearchApi.search(docs(s, d), req).hits
          .select("_docId", "str_assetname", "str_assettype",
            "str_databaseid", "_score")
      }),

    // ── The same façade under the BM25 scorer (search.py's actual
    //    `_score` ordering): multi-term match semantics (terms OR'd,
    //    membership by relevance), corpus stats from the FULL doc table
    //    like OpenSearch's index-wide idf, fixed-point arithmetic so
    //    the oracle hash-matches (see query/Bm25.scala). The oracle
    //    replays the identical integer idf recurrence over the docs CTE.
    sql("search_advanced_bm25", Bm25FacadeOracle)(
      (s, d) => {
        val req = SearchRequest(
          query = Some("building 2-high"),
          filters = Map("str_assettype" -> "O"),
          accessibleDatabases = Some(Seq("1-URGENT", "2-HIGH", "3-MEDIUM")),
          scorer = "bm25",
          from = 5, size = 20)
        SearchApi.search(docs(s, d), req).hits
          .select("_docId", "str_assetname", "str_databaseid", "_score")
      }),

    // ── The facade served from the INVERTED INDEX (query/TermIndex)
    //    under the SAME oracle — and through the facade's AUTOMATIC
    //    route chooser: the query passes a FRESH [[SearchApi
    //    .IndexBinding]] and `SearchApi.search` itself decides to score
    //    from the postings of the query's two terms (shard-pruned read,
    //    never a corpus tokenize) joined onto the pushed-down hit set.
    //    This is the reference's actual split of labor — OpenSearch
    //    filters AND scores from its index (`search.py:197-292`) — with
    //    hash-identical scores to the scan route gated one row above,
    //    and the route choice is the engine's, not the caller's
    //    (`SearchApiSpec` pins choice, fallback-on-stale, and pruning).
    sql("search_advanced_bm25_indexed", Bm25FacadeOracle)(
      (s, d) => {
        val fields = Seq("str_assetname", "str_description", "str_assetid",
          "str_databaseid", "str_assettype")
        val corpus = docs(s, d)
        val tk = split(trim(lower(concat_ws(" ", fields.map(col): _*))),
          "\\s+")
        val root = graft.query.TermIndex.attach(s, s"facade:$d",
          corpus.select(col("_docId").cast("long").as("doc_id"), tk.as("tk")))
        val req = SearchRequest(
          query = Some("building 2-high"),
          filters = Map("str_assettype" -> "O"),
          accessibleDatabases = Some(Seq("1-URGENT", "2-HIGH", "3-MEDIUM")),
          scorer = "bm25",
          from = 5, size = 20)
        SearchApi.search(corpus, req,
            index = Some(SearchApi.IndexBinding(root, 0L, 0L)))
          .hits
          .select("_docId", "str_assetname", "str_databaseid", "_score")
      })
  )
}
