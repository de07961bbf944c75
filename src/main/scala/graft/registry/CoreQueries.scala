package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Codecs, Tables}
import graft.query.{MetadataLang, QueryCompiler => QC, SortField, Token}
import graft.authz.Abac

/** SURVEY §2 operator inventory — scans, filters, predicates, sorts,
  * pagination and scalar codecs (S/F/O/C series), each exercised through
  * the graft library modules over the driver's TPC-H-ish tables, with a
  * DuckDB oracle twin.
  */
object CoreQueries {
  import QueryDef.sql

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Deterministic near-superkey ordering for lineitem (the table holds
    * exact-duplicate rows, so (orderkey, linenumber) alone is not unique). */
  private val liOrder: Seq[Column] = Seq(
    col("l_orderkey").asc, col("l_linenumber").asc, col("l_partkey").asc,
    col("l_suppkey").asc, col("l_extendedprice").asc)

  val defs: Seq[QueryDef] = Seq(

    // ── S1: point get by PK(+SK) — partition-pruned point lookup.
    sql("s1_point_lookup",
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey = 42""")(
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderkey") === 42)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")),

    // ── S2: partition scan: all rows of one partition key range, ordered,
    //    page-limited (DynamoDB Query-on-PK shape).
    sql("s2_partition_scan",
      """SELECT l_orderkey, l_linenumber, l_partkey,
        |       CAST(l_quantity AS INTEGER) AS quantity
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber DESC, l_partkey, l_suppkey,
        |         l_extendedprice
        |LIMIT 200""")(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity").cast("int").as("quantity"),
          col("l_suppkey"), col("l_extendedprice"))
        .orderBy(col("l_orderkey").asc, col("l_linenumber").desc,
          col("l_partkey").asc, col("l_suppkey").asc, col("l_extendedprice").asc)
        .limit(200)
        .select("l_orderkey", "l_linenumber", "l_partkey", "quantity")),

    // ── S3: full scan + NOT-CONTAINS filter (assetService.py:808-886).
    sql("s3_scan_filter",
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderpriority NOT LIKE '%URGENT%'
        |ORDER BY o_orderkey LIMIT 500""")(
      (s, d) => t(s, d, "orders")
        .filter(!col("o_orderpriority").contains("URGENT"))
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey").limit(500)),

    // ── S5: object listing with archive-status filter + ordered paging
    //    (assetFiles.py:1029-1236); archived modeled as l_returnflag='R'.
    sql("s5_file_listing",
      """SELECT CAST(l_orderkey AS VARCHAR) || ':' ||
        |         CAST(l_linenumber AS VARCHAR) AS file_key,
        |       strftime(l_shipdate, '%Y-%m-%d') AS modified,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS file_size
        |FROM lineitem WHERE l_returnflag <> 'R'
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         l_extendedprice
        |LIMIT 300""")(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_returnflag") =!= "R")
        .orderBy(liOrder: _*)
        .limit(300)
        .select(
          Codecs.compositeKey(col("l_orderkey"), col("l_linenumber")).as("file_key"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("modified"),
          floor(col("l_extendedprice")).cast("bigint").as("file_size"))),

    // ── F1: bool must/should/must_not composition (search.py:1002-1072).
    sql("f1_bool_compose",
      """SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part
        |WHERE p_size BETWEEN 10 AND 20
        |  AND NOT (p_brand = 'Brand#45')
        |  AND (p_type LIKE '%ECONOMY%' OR p_type LIKE '%SMALL%')
        |ORDER BY p_partkey""")(
      (s, d) => {
        val p = t(s, d, "part")
        p.filter(QC.boolQuery(
            must = Seq(col("p_size").between(10, 20)),
            mustNot = Seq(QC.term(col("p_brand"), "Brand#45")),
            should = Seq(col("p_type").contains("ECONOMY"),
              col("p_type").contains("SMALL"))))
          .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
          .orderBy("p_partkey")
      }),

    // ── F2: exact term match on a keyword field.
    sql("f2_term",
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""")(
      (s, d) => t(s, d, "customer")
        .filter(QC.term(col("c_mktsegment"), "BUILDING"))
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")),

    // ── F3: wildcard/substring text match, multi-field OR fold
    //    (search.py:540-582,1074-1121). `?`→`_`, `*`→`%`.
    sql("f3_wildcard",
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE lower(p_name) LIKE '%b_lt%' OR lower(p_type) LIKE '%small%'
        |ORDER BY p_partkey""")(
      (s, d) => t(s, d, "part")
        .filter(QC.multiField(Seq(col("p_name")), "*b?lt*") ||
          QC.wildcard(col("p_type"), "SMALL"))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")),

    // ── F4: dual-field analyzed/keyword duality (search.py:1085-1121):
    //    one query runs BOTH as a tokenized OR-match over the analyzed
    //    field (standard-analyzer behavior: lowercase, split on
    //    non-token chars — a hyphenated term splits into its parts) and
    //    as a raw match over the `.keyword` variant (hyphens survive, so
    //    'brand#13-7' matches only the exact item); the bool.should
    //    union keeps any row either path hits, provenance flags carried.
    //    Previously documented as designed-out; the analyzer is 2 HOFs.
    sql("f4_analyzer_duality",
      """WITH f AS (
        |  SELECT p_partkey,
        |         lower(p_brand || '-' || CAST(p_size AS VARCHAR)) AS kw,
        |         regexp_split_to_array(
        |           lower(p_brand || '-' || CAST(p_size AS VARCHAR)),
        |           '[^a-z0-9#]+') AS toks
        |  FROM part
        |)
        |SELECT p_partkey,
        |       list_has_any(toks, ['brand#13', '7']) AS m_analyzed,
        |       (kw = 'brand#13-7') AS m_keyword
        |FROM f
        |WHERE list_has_any(toks, ['brand#13', '7']) OR kw = 'brand#13-7'
        |ORDER BY p_partkey""")(
      (s, d) => {
        val kw = lower(concat(col("p_brand"), lit("-"),
          col("p_size").cast("string")))
        val toks = split(kw, "[^a-z0-9#]+")
        val mAnalyzed = arrays_overlap(toks,
          array(lit("brand#13"), lit("7")))
        val mKeyword = kw === "brand#13-7"
        t(s, d, "part")
          .select(col("p_partkey"), mAnalyzed.as("m_analyzed"),
            mKeyword.as("m_keyword"))
          .filter(col("m_analyzed") || col("m_keyword"))
          .orderBy("p_partkey")
      }),

    // ── F5: field-exists predicate over dynamic (JSON) properties.
    sql("f5_exists",
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE json_extract_string(props, '$.k') IS NOT NULL
        |  AND event_type = 'view'
        |ORDER BY event_id LIMIT 500""")(
      (s, d) => t(s, d, "events")
        .filter(QC.term(col("event_type"), "view"))
        // project the JSON path once; the exists filter and the output
        // column share the parse (the reference parses per access)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .filter(QC.exists(col("k")))
        .orderBy("event_id").limit(500)),

    // ── F6: metadata mini-language `k:v AND k2:v2` (search.py:1123-1303),
    //    parsed by MetadataLang, wildcard-vs-exact per pair.
    sql("f6_metadata_minilang",
      """SELECT p_partkey, p_brand, p_type FROM part
        |WHERE lower(p_type) LIKE '%economy%' AND lower(p_brand) LIKE 'brand#1_'
        |ORDER BY p_partkey""")(
      (s, d) => {
        val expr0 = MetadataLang.parse("type:*ECONOMY* AND brand:Brand#1?")
        val resolve: String => Column = {
          case "brand" => col("p_brand")
          case "type"  => col("p_type")
          case k       => throw new IllegalArgumentException(k)
        }
        t(s, d, "part").filter(MetadataLang.compile(expr0, resolve))
          .select("p_partkey", "p_brand", "p_type").orderBy("p_partkey")
      }),

    // ── F9+F10: archived exclusion + accessible-set restriction
    //    (search.py:634-651). Archived modeled as o_orderstatus='F'.
    sql("f9_f10_archived_accessible",
      """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
        |WHERE NOT (o_orderstatus = 'F')
        |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |ORDER BY o_orderkey LIMIT 1000""")(
      (s, d) => t(s, d, "orders")
        .filter(QC.archivedExclusion(col("o_orderstatus") === "F",
          includeArchived = false))
        .filter(QC.accessibleDatabases(col("o_orderpriority"),
          Some(Seq("1-URGENT", "2-HIGH"))))
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .orderBy("o_orderkey").limit(1000)),

    // ── F12: token predicates with AND/OR operation (models/search.py:110-115).
    sql("f12_tokens",
      """SELECT p_partkey, p_name, p_brand FROM part
        |WHERE lower(p_name) LIKE '%widget%' AND NOT (p_brand = 'Brand#2')
        |ORDER BY p_partkey""")(
      (s, d) => {
        val resolve: String => Seq[Column] = {
          case "name"  => Seq(col("p_name"))
          case "brand" => Seq(col("p_brand"))
          case "all"   => Seq(col("p_name"), col("p_brand"))
          case k       => throw new IllegalArgumentException(k)
        }
        t(s, d, "part").filter(QC.tokens(
            Seq(Token("name", ":", "widget"), Token("brand", "!=", "Brand#2")),
            "AND", resolve))
          .select("p_partkey", "p_name", "p_brand").orderBy("p_partkey")
      }),

    // ── F11: ABAC policy compiled to a pushed-down predicate; deny
    //    dominates (authz/__init__.py:387-423, constants.py:127).
    sql("f11_abac",
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE (c_mktsegment IN ('BUILDING', 'MACHINERY')
        |       OR c_name LIKE 'Customer#0000001%')
        |  AND NOT (c_name LIKE '%7')
        |ORDER BY c_custkey""")(
      (s, d) => {
        val policy = Abac.Policy(
          allow = Seq(
            Seq(Abac.Criterion("c_mktsegment", "is_one_of",
              values = Seq("BUILDING", "MACHINERY"))),
            Seq(Abac.Criterion("c_name", "starts_with", "Customer#0000001"))),
          deny = Seq(Seq(Abac.Criterion("c_name", "ends_with", "7"))))
        Abac.enforce(t(s, d, "customer"), policy)
          .select("c_custkey", "c_name", "c_mktsegment").orderBy("c_custkey")
      }),

    // ── O3+F13+F15: deterministic relevance score, min-score cut,
    //    highlight tagging (search.py:869-886,993-995; SURVEY O3 deviation).
    sql("o3_score_highlight",
      """SELECT p_partkey, p_name,
        |       (CASE WHEN lower(p_name) LIKE '%red%'
        |             THEN CAST(3.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END +
        |        CASE WHEN lower(p_type) LIKE '%red%'
        |             THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
        |         AS score,
        |       CASE WHEN lower(p_name) LIKE '%red%'
        |            THEN regexp_replace(p_name, '(?i)(red)', '[\1]', 'g')
        |            ELSE p_name END AS highlighted
        |FROM part
        |WHERE (CASE WHEN lower(p_name) LIKE '%red%'
        |            THEN CAST(3.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END +
        |       CASE WHEN lower(p_type) LIKE '%red%'
        |            THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) > 0.01
        |ORDER BY score DESC, p_partkey""")(
      (s, d) => {
        val sc = QC.score(Seq(col("p_name") -> 3.0, col("p_type") -> 1.0), "red")
        t(s, d, "part")
          .withColumn("score", sc)
          .filter(col("score") > QC.MinScore)
          .withColumn("highlighted", QC.highlight(col("p_name"), "red"))
          .select("p_partkey", "p_name", "score", "highlighted")
          .orderBy(col("score").desc, col("p_partkey").asc)
      }),

    // ── O3 upgraded: deterministic fixed-point BM25 ranking
    //    (search.py:614,994,1311 consume OpenSearch _score;
    //    test_search.py:490-588 assert sort-by-score). All-integer
    //    tf/idf/length-norm — see query/Bm25.scala; the oracle replays
    //    the identical integer recurrences, so scores hash-match. The
    //    query mixes a rare term (dup, high idf) with common ones.
    sql("o3_bm25_rank",
      graft.query.Bm25.oracleSql(Seq("dup", "merge", "scan"), 100))(
      (s, d) => graft.query.Bm25.rank(
        // the shared token cache IS this input (same filter, same
        // tokenize) — the scan route's corpus pass rides it instead of
        // re-tokenizing per invocation
        LlmQueries.tokenArrays(s, d).select("doc_id", "tk"),
        "doc_id", "tk", Seq("dup", "merge", "scan"), 100)),

    // ── O3 served from the INVERTED INDEX (query/TermIndex): same
    //    oracle as o3_bm25_rank — proving index-served ≡ scan-served —
    //    but query cost is Θ(postings of the query's terms): term-shard
    //    partition pruning + pushed term filter, corpus stats from the
    //    incrementally-maintained one-row stats table, idf from the
    //    pruned postings themselves. This is the OpenSearch shape the
    //    reference actually queries (search.py:614,994,1311).
    sql("o3_bm25_rank_indexed",
      graft.query.Bm25.oracleSql(Seq("dup", "merge", "scan"), 100))(
      (s, d) => {
        val root = graft.query.TermIndex.attach(s, s"docs:$d",
          t(s, d, "documents").filter(length(trim(col("text"))) > 0)
            .select(col("doc_id"),
              graft.llmops.Text.tokens(col("text")).as("tk")))
        graft.query.TermIndex.rank(s, root, Seq("dup", "merge", "scan"), 100)
      }),

    // ── O1: multi-field sort compilation (search.py:1305-1371).
    sql("o1_multisort",
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey LIMIT 100""")(
      (s, d) => t(s, d, "customer")
        .orderBy(QC.sortCols(
          Seq(SortField("c_acctbal", descending = true), SortField("c_custkey")),
          col): _*)
        .limit(100)
        .select("c_custkey", "c_name", "c_acctbal")),

    // ── O4: offset/size pagination with reference bounds
    //    (models/search.py:126-147) — native global offset+limit, no
    //    row_number shuffle.
    sql("o4_offset_pagination",
      """SELECT c_custkey, c_name FROM customer
        |ORDER BY c_custkey LIMIT 50 OFFSET 100""")(
      (s, d) => QC.paginate(
        t(s, d, "customer").orderBy("c_custkey").select("c_custkey", "c_name"),
        from = 100, size = 50)),

    // ── O5: auth over-fetch pagination, as a reference-compatibility
    //    shim (search.py:969-976 over-fetch 2×/10k cap; :1520-1536
    //    post-auth filter; :1739-1748 slice with window-local total).
    //    from=20,size=30 ⇒ window=100; the ABAC gate passes well under
    //    70 of those 100, so the page comes back SHORT and total_hits
    //    undercounts — the two artifacts the shim exists to reproduce
    //    (the default graft path pushes auth down, F11, and never
    //    exhibits them).
    sql("o5_auth_overfetch",
      """WITH win AS (
        |  SELECT c_custkey, c_name, c_mktsegment FROM customer
        |  ORDER BY c_custkey LIMIT 100
        |), filt AS (
        |  SELECT * FROM win WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
        |), tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS total_hits FROM filt
        |)
        |SELECT f.c_custkey, f.c_name, f.c_mktsegment, t.total_hits
        |FROM filt f CROSS JOIN tot t
        |ORDER BY f.c_custkey LIMIT 30 OFFSET 20""")(
      (s, d) => {
        val base = t(s, d, "customer")
          .select("c_custkey", "c_name", "c_mktsegment")
        val policy = Abac.Policy(
          allow = Seq(Seq(Abac.Criterion("c_mktsegment", "is_one_of",
            values = Seq("BUILDING", "AUTOMOBILE")))),
          deny = Seq.empty)
        QC.overfetchPage(base, Seq(col("c_custkey").asc),
          Abac.compile(base, policy), from = 20, size = 30)
      }),

    // ── O6: keyset (token) pagination (common/dynamodb.py:98-144) — the
    //    100 TB-safe pagination: no global skip, filter + limit only.
    sql("o6_keyset_pagination",
      """SELECT c_custkey, c_name FROM customer WHERE c_custkey > 100
        |ORDER BY c_custkey LIMIT 50""")(
      (s, d) => QC.keysetPage(
        t(s, d, "customer").select("c_custkey", "c_name"),
        col("c_custkey"), Some(lit(100)), pageSize = 50)),

    // ── O8: top-1 by ranked preference list (assetFiles.py:1419-1441):
    //    per nation, the customer whose segment ranks best.
    sql("o8_top1_ranked",
      """SELECT c_nationkey, c_custkey, c_mktsegment FROM customer
        |QUALIFY row_number() OVER (
        |  PARTITION BY c_nationkey
        |  ORDER BY CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 1
        |           WHEN 'BUILDING' THEN 2 WHEN 'FURNITURE' THEN 3
        |           WHEN 'HOUSEHOLD' THEN 4 ELSE 5 END, c_custkey) = 1
        |ORDER BY c_nationkey""")(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val rank = when(col("c_mktsegment") === "AUTOMOBILE", 1)
          .when(col("c_mktsegment") === "BUILDING", 2)
          .when(col("c_mktsegment") === "FURNITURE", 3)
          .when(col("c_mktsegment") === "HOUSEHOLD", 4).otherwise(5)
        t(s, d, "customer")
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("c_nationkey"))
              .orderBy(rank.asc, col("c_custkey").asc)))
          .filter(col("rn") === 1)
          .select("c_nationkey", "c_custkey", "c_mktsegment")
          .orderBy("c_nationkey")
      }),

    // ── C2: dynamic field-name sanitization (models/indexing.py:16-54).
    sql("c2_sanitize",
      """SELECT p_partkey,
        |       substring(regexp_replace(regexp_replace(lower(p_name),
        |         '[^a-z0-9_-]', '', 'g'), '^_+', '', 'g'), 1, 255) AS field
        |FROM part ORDER BY p_partkey LIMIT 500""")(
      (s, d) => t(s, d, "part")
        .select(col("p_partkey"), Codecs.sanitizeFieldName(col("p_name")).as("field"))
        .orderBy("p_partkey").limit(500)),

    // ── C3: string→typed coercion with autodetect fallback
    //    (assetIndexer.py:184-276).
    sql("c3_type_coercion",
      """SELECT event_id, v,
        |       CASE WHEN lower(v) IN ('true','false','yes','no','on','off')
        |              THEN 'boolean'
        |            WHEN regexp_matches(v, '^[+-]?[0-9]+$') THEN 'integer'
        |            WHEN regexp_matches(v, '^[+-]?[0-9]+\.[0-9]+$') THEN 'float'
        |            WHEN regexp_matches(v,
        |              '^[0-9]{4}-[0-9]{2}-[0-9]{2}([T ][0-9]{2}:[0-9]{2}:[0-9]{2})?')
        |              THEN 'date'
        |            ELSE 'string' END AS detected
        |FROM (SELECT event_id, json_extract_string(props, '$.k') AS v FROM events)
        |ORDER BY event_id LIMIT 1000""")(
      (s, d) => t(s, d, "events")
        // top-k FIRST, parse AFTER (r16, guide §1.2: don't compute what
        // you throw away): the old shape ran the JSON extract + 4-regex
        // detect on EVERY event row below the TakeOrdered; event_id is
        // the events table's unique key, so the 1000 smallest ids are
        // the same rows either way and only they pay the parse. The
        // trailing 1000-row re-sort keeps the output order contractual
        // rather than relying on limit's partition layout.
        .select(col("event_id"), col("props"))
        .orderBy("event_id").limit(1000)
        // ONE projection (not select-then-withColumn): the stacked
        // projects blocked the sort elimination and the planner
        // re-merged the two sorts into a full range sort of all events
        // carrying props; this shape plans TakeOrderedAndProject with
        // the parse in its post-take project list, like c5
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("v"),
          Codecs.detectType(get_json_object(col("props"), "$.k"))
            .as("detected"))
        .orderBy("event_id")),

    // ── C6: composite-key build/split round trip
    //    (assetIndexer.py:345-353,879-890).
    sql("c6_composite_key",
      """SELECT CAST(l_orderkey AS VARCHAR) || ':' ||
        |         CAST(l_linenumber AS VARCHAR) AS key,
        |       CAST(split_part(CAST(l_orderkey AS VARCHAR) || ':' ||
        |         CAST(l_linenumber AS VARCHAR), ':', 1) AS BIGINT) AS k_order,
        |       CAST(split_part(CAST(l_orderkey AS VARCHAR) || ':' ||
        |         CAST(l_linenumber AS VARCHAR), ':', 2) AS INTEGER) AS k_line
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber, l_partkey""")(
      (s, d) => {
        val key = Codecs.compositeKey(col("l_orderkey"), col("l_linenumber"))
        t(s, d, "lineitem")
          .filter(col("l_orderkey") < 100)
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
          .select(key.as("key"),
            Codecs.keyPart(key, 0).cast("bigint").as("k_order"),
            Codecs.keyPart(key, 1).cast("int").as("k_line"))
      }),

    // ── C7+C8: extension extraction + version-label formatting
    //    (fileIndexer.py:1023-1038; assetIndexer.py:496-505).
    sql("c7_c8_ext_label",
      """SELECT o_orderkey,
        |       'v' || CAST(o_orderkey AS VARCHAR) || ' (' || o_orderstatus || ')'
        |         AS label,
        |       regexp_extract(o_orderpriority, '([A-Z]+)$', 1) AS ext
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""")(
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          Codecs.versionLabel(col("o_orderkey"), col("o_orderstatus")).as("label"),
          regexp_extract(col("o_orderpriority"), "([A-Z]+)$", 1).as("ext"))
        .orderBy("o_orderkey"))
  )
}
