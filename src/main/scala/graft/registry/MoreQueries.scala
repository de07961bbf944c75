package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.authz.Abac
import graft.core.{Caching, Tables}
import graft.llmops.Similarity
import graft.query.{Fields, QueryCompiler}

/** Remaining SURVEY §2 rows as first-class gate queries: the file-doc
  * enrichment join (J2), workflow-execution status listing (J9), union
  * re-sort + reverse scan (O2/O7), authorized-total accounting (A4),
  * the residual scalar codecs (C9-C15), match explanation (F16), and
  * the embedding-cosine near-dup dedup (BASELINE addition).
  */
object MoreQueries {
  import QueryDef.sql

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** The exact cosine-threshold pair scan over the embeddings corpus at
    * τ=0.45, SHARED by llm_dedup_embed (its result modulo the
    * first-keeper window) and llm_dedup_embed_sem (its recall
    * baseline): the O(n²) work runs once per (session, dir) and both
    * consumers read the small persisted pair set. Norms are computed
    * once per vector, not per pair. The STREAM side (left, under
    * BuildRight) is what the repartition must spread — the corpus
    * parquet is one split at bench SFs, and repartitioning the build
    * side (as this helper once did) is a wasted exchange feeding a
    * broadcast while the whole n² loop runs in ONE task. The sim
    * threshold is authored INSIDE the join condition AFTER the cheap
    * id inequality, so the conjunct short-circuits half the dots; as a
    * pushed-down filter Catalyst prepends it and every ordered pair
    * pays the kernel twice. */
  private def exactEmbedPairs(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val dot = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
      call_function("graft_dot", x, y)
    Caching.memoDf(s, s"exactEmbedPairs:$d") {
      val v = t(s, d, "embeddings")
        .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("e"))
        .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
      val a = v.select(col("vec_id").as("keep_id"), col("e").as("ea"),
        col("nrm").as("na")).repartition(col("keep_id"))
      val b = v.select(col("vec_id").as("dup_id"), col("e").as("eb"),
        col("nrm").as("nb"))
      // same arithmetic as the projected sim (dot / (na*nb) vs 0.45) —
      // an algebraic rewrite (dot >= 0.45*na*nb) could flip rounding at
      // the boundary and diverge from the oracle's division form
      a.join(b, col("keep_id") < col("dup_id") &&
          dot(col("ea"), col("eb")) / (col("na") * col("nb")) >= 0.45)
        .withColumn("sim", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
        .select("dup_id", "keep_id", "sim")
    }
  }

  val defs: Seq[QueryDef] = Seq(

    // ── C13 phase-2b: point-in-POLYGON over gp_ points (ray casting,
    //    concave "dart" polygon). The polygon expands to a fixed sum of
    //    per-edge CASE terms — pure double arithmetic, reproduced term
    //    by term in the oracle, so the predicate is hash-gated (unlike
    //    trig-based haversine, which is spec-gated).
    {
      // (lon, lat) ring of a concave dart
      val ring = Seq((-60.0, -30.0), (0.0, 45.0), (60.0, -30.0), (0.0, 0.0))
      val sqlTerms = ring.zip(ring.tail :+ ring.head).map {
        case ((xi, yi), (xj, yj)) =>
          s"""CASE WHEN (($yi > gp_lat) <> ($yj > gp_lat))
             |  AND gp_lon < (${xj - xi}) * (gp_lat - $yi) / (${yj - yi}) + $xi
             |THEN 1 ELSE 0 END""".stripMargin.replace("\n", " ")
      }.mkString(" + ")
      sql("c13b_geo_polygon",
        s"""WITH pts AS (
          |  SELECT c_custkey,
          |         CAST(c_custkey % 180 - 90 AS DOUBLE) + 0.25 AS gp_lat,
          |         CAST((c_custkey * 13) % 360 - 180 AS DOUBLE) AS gp_lon
          |  FROM customer
          |)
          |SELECT c_custkey, gp_lat, gp_lon FROM pts
          |WHERE ($sqlTerms) % 2 = 1
          |ORDER BY c_custkey""")(
        (s, d) => {
          val pts = t(s, d, "customer").select(col("c_custkey"),
            ((col("c_custkey") % 180 - 90).cast("double") + 0.25).as("gp_lat"),
            ((col("c_custkey") * 13) % 360 - 180).cast("double").as("gp_lon"))
          pts.filter(graft.query.Geo.inPolygon(col("gp_lat"), col("gp_lon"), ring))
            .select("c_custkey", "gp_lat", "gp_lon")
            .orderBy("c_custkey")
        })
    },

    // ── J2: file-doc enrichment — file ⋈ asset ⋈ owner dim ⋈ pivoted
    //    metadata map ⋈ attribute dim (fileIndexer.py:436-499,960-1100).
    //    Both dims broadcast; the metadata pivot is the only shuffle and
    //    it pre-aggregates on the join key (map-side combine). The MD map
    //    is surfaced through element_at, the map-typed access path.
    sql("j2_file_doc",
      """WITH md AS (
        |  SELECT l_orderkey,
        |         CAST(MAX(CAST(l_quantity AS INTEGER)) AS VARCHAR) AS v
        |  FROM lineitem WHERE l_linenumber = 1 GROUP BY l_orderkey
        |)
        |SELECT CAST(l.l_orderkey AS VARCHAR) || ':' ||
        |         CAST(l.l_linenumber AS VARCHAR) AS file_key,
        |       c.c_name AS owner, o.o_orderpriority AS asset_pri,
        |       md.v AS md_line1, p.p_brand AS ab_brand, p.p_type AS ab_type
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |LEFT JOIN md ON md.l_orderkey = l.l_orderkey
        |LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_orderkey < 300
        |ORDER BY file_key, l.l_partkey""")(
      (s, d) => {
        val files = t(s, d, "lineitem").filter(col("l_orderkey") < 300)
        // (orderkey, linenumber) is not unique in the synthetic data —
        // last-writer-wins dedup (max) before the map build, as in the
        // reference's metadata pivot semantics (and f7).
        val mdp = files
          // NULL map keys throw NULL_MAP_KEY — a kv row without a key
          // cannot index (DocBuilder pivot contract)
          .filter(col("l_linenumber").isNotNull)
          .groupBy(col("l_orderkey"), col("l_linenumber"))
          .agg(max(col("l_quantity").cast("int")).cast("string").as("v"))
          .groupBy("l_orderkey")
          .agg(map_from_entries(collect_list(struct(
            col("l_linenumber").cast("string"), col("v")))).as("MD"))
        files
          // the join key is bounded (< 300) on the lineitem side, so the
          // SAME bound applies to o_orderkey through the equi-join —
          // filter + broadcast the orders side explicitly instead of a
          // corpus-wide shuffle join (the optimizer infers the filter
          // but keeps a sort-merge join on size estimates; the bound
          // makes the side broadcast-safe at ANY scale)
          .join(broadcast(t(s, d, "orders").filter(col("o_orderkey") < 300)),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")),
            col("o_custkey") === col("c_custkey"))
          .join(mdp, Seq("l_orderkey"), "left")
          .join(broadcast(t(s, d, "part")
            .select(col("p_partkey"), col("p_brand"), col("p_type"))),
            col("l_partkey") === col("p_partkey"), "left")
          // output is bounded by the < 300 key filter (a point listing,
          // not corpus-sized) — single-partition sort, no sampler job
          .repartition(1)
          .sortWithinPartitions(
            concat(col("l_orderkey").cast("string"), lit(":"),
              col("l_linenumber").cast("string")), col("l_partkey"))
          .select(
            concat(col("l_orderkey").cast("string"), lit(":"),
              col("l_linenumber").cast("string")).as("file_key"),
            col("c_name").as("owner"),
            col("o_orderpriority").as("asset_pri"),
            element_at(col("MD"), "1").as("md_line1"),
            col("p_brand").as("ab_brand"), col("p_type").as("ab_type"))
      }),

    // ── J9: workflow-execution listing ⋈ status source
    //    (executeWorkflow.py:394-488): executions joined to a small
    //    broadcast status dimension (our runner's status table stand-in).
    sql("j9_exec_status",
      """SELECT e.user_id, e.event_type, count(*) AS n_runs,
        |       strftime(max(CAST(e.ts AS TIMESTAMP)),
        |                '%Y-%m-%d %H:%M:%S.%f') AS last_run,
        |       s.status
        |FROM events e
        |JOIN (VALUES ('click', 'RUNNING'), ('view', 'RUNNING'),
        |             ('purchase', 'COMPLETE'), ('signup', 'COMPLETE'),
        |             ('error', 'FAILED')) s(event_type, status)
        |  ON e.event_type = s.event_type
        |GROUP BY e.user_id, e.event_type, s.status
        |ORDER BY e.user_id, e.event_type""")(
      (s, d) => {
        import s.implicits._
        val status = Seq(
          ("click", "RUNNING"), ("view", "RUNNING"),
          ("purchase", "COMPLETE"), ("signup", "COMPLETE"),
          ("error", "FAILED")).toDF("event_type", "status")
        // persist before the global sort: the range sampler otherwise
        // re-executes the scan+join+aggregate tail (the r14 recipe; the
        // result is (user × event_type)-sized — grows with the corpus,
        // so a single-partition sort would be wrong at scale)
        graft.core.Caching.persistOnce(
          t(s, d, "events")
            .join(broadcast(status), Seq("event_type"))
            .groupBy("user_id", "event_type", "status")
            .agg(count(lit(1)).as("n_runs"),
              date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .as("last_run"))
            .select("user_id", "event_type", "n_runs", "last_run", "status"))
          .orderBy("user_id", "event_type")
      }),

    // ── O2+O7: merged-listing re-sort (search.py:127-178) — two
    //    independently ordered/limited scans (the second reversed,
    //    ScanIndexForward=False ≙ .desc) unioned and re-sorted under one
    //    global total order, direction taken from the first sort key.
    sql("o2_o7_union_resort",
      """WITH f AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |             FROM orders WHERE o_orderstatus = 'F'
        |             ORDER BY o_orderkey LIMIT 100),
        |     o AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |             FROM orders WHERE o_orderstatus = 'O'
        |             ORDER BY o_orderkey DESC LIMIT 100)
        |SELECT o_orderkey, o_orderstatus,
        |       CAST(o_totalprice AS DOUBLE) AS total
        |FROM (SELECT * FROM f UNION ALL SELECT * FROM o)
        |ORDER BY o_orderkey DESC""")(
      (s, d) => {
        val base = t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val first = base.filter(col("o_orderstatus") === "F")
          .orderBy(col("o_orderkey").asc).limit(100)
        val second = base.filter(col("o_orderstatus") === "O")
          .orderBy(col("o_orderkey").desc).limit(100)
        first.unionByName(second)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice").cast("double").as("total"))
          .orderBy(col("o_orderkey").desc)
      }),

    // ── A4: hit-total accounting (search.py:236-281,1550) — raw total vs
    //    post-ABAC authorized total in ONE aggregation pass (the
    //    reference needs two passes because its auth filter runs client-
    //    side; ours is a Column, so it can also be an agg condition).
    sql("a4_auth_total",
      """SELECT count(*) AS total_hits,
        |       count(CASE WHEN (c_mktsegment IN ('BUILDING', 'MACHINERY')
        |                        OR c_name LIKE 'Customer#0000001%')
        |                   AND NOT (c_name LIKE '%7')
        |             THEN 1 END) AS authorized_hits
        |FROM customer""")(
      (s, d) => {
        val cust = t(s, d, "customer")
        val policy = Abac.Policy(
          allow = Seq(
            Seq(Abac.Criterion("c_mktsegment", "is_one_of",
              values = Seq("BUILDING", "MACHINERY"))),
            Seq(Abac.Criterion("c_name", "starts_with", "Customer#0000001"))),
          deny = Seq(Seq(Abac.Criterion("c_name", "ends_with", "7"))))
        cust.agg(count(lit(1)).as("total_hits"),
          count(when(Abac.compile(cust, policy), 1)).as("authorized_hits"))
      }),

    // ── C9-C15 residual codecs in one projection (url decode, tag list
    //    coercion, #deleted suffix round-trip, etag quote strip, geo
    //    struct fields, email validation). Pure row-level expressions —
    //    codegen'd, no shuffle, pushdown-friendly. The oracle's
    //    url_decode is replace('%20') because the inputs are constrained
    //    to that escape (DuckDB 1.0 has no url_decode).
    sql("c9_c15_codecs",
      """SELECT p_partkey,
        |       replace('loc%20' || p_type, '%20', ' ') AS decoded_path,
        |       CAST(p_size AS VARCHAR) || ',' || lower(p_brand) AS tags,
        |       replace(p_brand ||
        |         CASE WHEN p_size % 2 = 0 THEN '#deleted' ELSE '' END,
        |         '#deleted', '') AS clean_key,
        |       (p_size % 2 = 0) AS bool_archived,
        |       regexp_replace('"' || md5(p_name) || '"', '"', '', 'g') AS etag,
        |       CAST(p_partkey % 180 - 90 AS DOUBLE) + 0.5 AS gp_lat,
        |       CAST((p_size * 7) % 360 - 180 AS DOUBLE) AS gp_lon,
        |       regexp_matches(lower(replace(p_brand, '#', '')) ||
        |         '@example.com', '^[a-z0-9]+@[a-z]+\.[a-z]+$') AS email_ok
        |FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""")(
      (s, d) => t(s, d, "part")
        .filter(col("p_partkey") <= 500)
        .select(
          col("p_partkey"),
          url_decode(concat(lit("loc%20"), col("p_type"))).as("decoded_path"),
          array_join(array(col("p_size").cast("string"),
            lower(col("p_brand"))), ",").as("tags"),
          regexp_replace(
            concat(col("p_brand"),
              when(col("p_size") % 2 === 0, "#deleted").otherwise("")),
            "#deleted", "").as("clean_key"),
          (col("p_size") % 2 === 0).as("bool_archived"),
          regexp_replace(concat(lit("\""), md5(col("p_name")), lit("\"")),
            "\"", "").as("etag"),
          ((col("p_partkey") % 180 - 90).cast("double") + 0.5).as("gp_lat"),
          ((col("p_size") * 7) % 360 - 180).cast("double").as("gp_lon"),
          (lower(regexp_replace(col("p_brand"), "#", ""))
            .rlike("^[a-z0-9]+$")).as("email_ok"))
        .orderBy("p_partkey")),

    // ── F16: match explanation — per hit, which fields matched and the
    //    score contribution (search.py:1569-1621), as a derived struct
    //    (flattened to hash-comparable columns).
    sql("f16_explain",
      """SELECT p_partkey,
        |       CASE WHEN lower(p_name) LIKE '%red%' AND lower(p_type) LIKE '%red%'
        |            THEN 'p_name,p_type'
        |            WHEN lower(p_name) LIKE '%red%' THEN 'p_name'
        |            WHEN lower(p_type) LIKE '%red%' THEN 'p_type'
        |            ELSE '' END AS matched_fields,
        |       (CASE WHEN lower(p_name) LIKE '%red%'
        |             THEN CAST(3.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END +
        |        CASE WHEN lower(p_type) LIKE '%red%'
        |             THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
        |         AS score
        |FROM part
        |WHERE lower(p_name) LIKE '%red%' OR lower(p_type) LIKE '%red%'
        |ORDER BY p_partkey""")(
      (s, d) => {
        val exp = Fields.explanation(
          Seq("p_name" -> 3.0, "p_type" -> 1.0), "red")
        t(s, d, "part")
          .withColumn("_exp", exp)
          .filter(size(col("_exp.matched_fields")) > 0)
          .select(col("p_partkey"),
            array_join(col("_exp.matched_fields"), ",").as("matched_fields"),
            col("_exp.score").as("score"))
          .orderBy("p_partkey")
      }),

    // ── J5 authz accounting: the reference's adjacency endpoint returns
    //    visible neighbors plus a COUNT of the ones the user may not see
    //    (assetLinksService.py:207-335 unauthorizedCount) — here both
    //    sides of the policy come out of one aggregation pass over the
    //    classified neighbor union.
    sql("j5_authz_counts",
      """WITH me AS (SELECT * FROM nation WHERE n_nationkey = 5),
        |neigh AS (
        |  SELECT 'related' AS rel, nation.n_name AS node_name
        |  FROM nation, me
        |  WHERE nation.n_regionkey = me.n_regionkey AND nation.n_nationkey <> 5
        |  UNION ALL
        |  SELECT 'child', c_name FROM customer WHERE c_nationkey = 5
        |)
        |SELECT rel,
        |       count(CASE WHEN node_name NOT LIKE '%7' THEN 1 END) AS n_visible,
        |       count(CASE WHEN node_name LIKE '%7' THEN 1 END) AS n_unauthorized
        |FROM neigh GROUP BY rel ORDER BY rel""")(
      (s, d) => {
        val me = t(s, d, "nation").filter(col("n_nationkey") === 5)
          .select(col("n_regionkey").as("my_region"))
        val siblings = t(s, d, "nation")
          .join(broadcast(me), col("n_regionkey") === col("my_region"))
          .filter(col("n_nationkey") =!= 5)
          .select(lit("related").as("rel"), col("n_name").as("node_name"))
        val children = t(s, d, "customer")
          .filter(col("c_nationkey") === 5)
          .select(lit("child").as("rel"), col("c_name").as("node_name"))
        val neigh = siblings.unionByName(children)
        val visible = Abac.compile(neigh, Abac.Policy(
          allow = Seq(Seq(Abac.Criterion("node_name", "does_not_contain", "x-none"))),
          deny = Seq(Seq(Abac.Criterion("node_name", "ends_with", "7")))))
        neigh.groupBy("rel")
          .agg(count(when(visible, 1)).as("n_visible"),
            count(when(!visible, 1)).as("n_unauthorized"))
          .orderBy("rel")
      }),

    // ── C13 phase-2: geo bounding-box + nearest-k over gp_ point fields
    //    derived deterministically from entity keys. Exact-arithmetic
    //    distance (squared degrees) keeps the ranking engine-stable; the
    //    trig haversine is spec-verified instead (Geo.scala).
    sql("c13_geo_bbox",
      """WITH pts AS (
        |  SELECT c_custkey,
        |         CAST(c_custkey % 180 - 90 AS DOUBLE) + 0.25 AS gp_lat,
        |         CAST((c_custkey * 13) % 360 - 180 AS DOUBLE) AS gp_lon
        |  FROM customer
        |)
        |SELECT c_custkey, gp_lat, gp_lon,
        |       (gp_lat - 10.0) * (gp_lat - 10.0)
        |         + (gp_lon - 20.0) * (gp_lon - 20.0) AS dist2
        |FROM pts
        |WHERE gp_lat BETWEEN -45.0 AND 45.0 AND gp_lon BETWEEN -90.0 AND 90.0
        |ORDER BY dist2, c_custkey LIMIT 20""")(
      (s, d) => {
        val pts = t(s, d, "customer").select(col("c_custkey"),
          ((col("c_custkey") % 180 - 90).cast("double") + 0.25).as("gp_lat"),
          ((col("c_custkey") * 13) % 360 - 180).cast("double").as("gp_lon"))
        pts
          .filter(graft.query.Geo.inBBox(col("gp_lat"), col("gp_lon"),
            -45.0, 45.0, -90.0, 90.0))
          .withColumn("dist2", graft.query.Geo.sqDegreeDist(
            col("gp_lat"), col("gp_lon"), 10.0, 20.0))
          .orderBy(col("dist2"), col("c_custkey"))
          .limit(20)
          .select("c_custkey", "gp_lat", "gp_lon", "dist2")
      }),

    // ── §1.3 metadata-schema validation: required-key and
    //    controlled-list violations over the long-form metadata table
    //    (metadataSchemaService.py:343-494). Required = anti-join on the
    //    required key; controlled list = value-set filter; one union of
    //    violation rows.
    sql("md_schema_validate",
      """WITH kv AS (
        |  SELECT l_orderkey AS entity,
        |         'line_' || CAST(l_linenumber AS VARCHAR) AS k,
        |         CAST(CAST(l_quantity AS INTEGER) AS VARCHAR) AS v
        |  FROM lineitem WHERE l_orderkey < 2000
        |), ents AS (SELECT DISTINCT entity FROM kv),
        |missing AS (
        |  SELECT entity, 'missing_required:line_1' AS violation FROM ents
        |  WHERE entity NOT IN (SELECT entity FROM kv WHERE k = 'line_1')
        |), badvalue AS (
        |  SELECT DISTINCT entity,
        |         'not_in_controlled_list:' || k || '=' || v AS violation
        |  FROM kv
        |  WHERE k = 'line_1' AND CAST(v AS INTEGER) > 45
        |)
        |SELECT entity, violation FROM missing
        |UNION ALL SELECT entity, violation FROM badvalue
        |ORDER BY entity, violation""")(
      (s, d) => {
        // kv feeds three plan branches (ents, having, badValue) —
        // persist the bounded (< 2000) slice so the scan+project runs
        // once, not per branch
        val kv = graft.core.Caching.persistOnce(
          t(s, d, "lineitem").filter(col("l_orderkey") < 2000)
            .select(col("l_orderkey").as("entity"),
              concat(lit("line_"), col("l_linenumber")).as("k"),
              col("l_quantity").cast("int").cast("string").as("v")))
        val ents = kv.select("entity").distinct()
        val having = kv.filter(col("k") === "line_1").select("entity").distinct()
        val missing = ents.join(having, Seq("entity"), "left_anti")
          .withColumn("violation", lit("missing_required:line_1"))
        val badValue = kv
          .filter(col("k") === "line_1" && col("v").cast("int") > 45)
          .select(col("entity"),
            concat(lit("not_in_controlled_list:"), col("k"), lit("="), col("v"))
              .as("violation"))
          .distinct()
        // output bounded by the < 2000 key filter — single-partition
        // sort, no sampler job
        missing.unionByName(badValue)
          .repartition(1).sortWithinPartitions("entity", "violation")
      }),

    // ── Embedding-cosine near-dup dedup (BASELINE addition): exact
    //    pairwise baseline — every pair ≥ τ, each duplicate assigned to
    //    its lowest-id partner (earliest copy wins). The pair join
    //    broadcasts one side and streams the other through the tight-loop
    //    cosine Expression; at 100 TB the candidate set comes from the
    //    LSH bucket join (Similarity.lshTopK) instead of the full cross.
    sql("llm_dedup_embed",
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS keep_id, b.vec_id AS dup_id,
        |         list_dot_product(a.e, b.e) /
        |           (sqrt(list_dot_product(a.e, a.e)) *
        |            sqrt(list_dot_product(b.e, b.e))) AS sim
        |  FROM v a JOIN v b ON a.vec_id < b.vec_id
        |)
        |SELECT dup_id, keep_id, sim FROM p
        |WHERE sim >= 0.45
        |QUALIFY row_number() OVER (PARTITION BY dup_id ORDER BY keep_id) = 1
        |ORDER BY dup_id""")(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // EXACT threshold-join at τ=0.45 (a 63° cone) admits no useful
        // metric pruning, so the pair scan is inherently O(n²) WORK —
        // the scale question is only whether it is O(n²) on one node or
        // distributed. No broadcast is forced in exactEmbedPairs:
        // Catalyst plans a BroadcastNestedLoopJoin while one side is
        // genuinely under the broadcast threshold and a partitioned
        // CartesianProduct beyond it (tasks = |A-parts| × |B-parts|,
        // each streaming one block pair, spillable) — never an
        // O(corpus) single-node structure. The sub-quadratic SCALE path
        // is llm_dedup_embed_lsh below, whose candidate screen is part
        // of its contract. The scan itself is shared with
        // llm_dedup_embed_sem's recall baseline via the session cache.
        exactEmbedPairs(s, d)
          .withColumn("rn", row_number().over(
            Window.partitionBy("dup_id").orderBy("keep_id")))
          .filter(col("rn") === 1)
          .select("dup_id", "keep_id", "sim")
          // persist before the global sort (r14 recipe: the range
          // sampler otherwise re-executes the uncached tail)
          .transform(graft.core.Caching.persistOnce)
          .orderBy("dup_id")
      }),

    // ── Embedding near-dup dedup, LSH-SCREENED (the 100 TB path). The
    //    candidate screen — collide in ≥1 of the 10 random-hyperplane
    //    tables — is part of the operator's CONTRACT, not an invisible
    //    approximation: the hyperplanes are pure integer arithmetic
    //    ((i·131+d)·2654435761 mod 1000003, scaled), so the oracle
    //    reproduces the exact same candidate set and the result is
    //    hash-exact. Screen recall vs the exact baseline is the
    //    documented sketch tradeoff (measured in LlmOpsSpec): ≈1 for
    //    true duplicates (sim ≥ 0.9 ⇒ per-table hit p ≥ 0.53,
    //    miss ≤ 0.47^10 ≈ 5e-4) and intentionally lossy near the 0.45
    //    floor, where exhaustive search is the only exact option.
    //    Plan shape: bucket arrays are one narrow codegen'd pass;
    //    candidates = equi-join on (table, bucket) — only (id, bucket)
    //    pairs ever shuffle; exact re-rank joins fetch vectors for the
    //    candidate pairs only, candidate side as shuffle-hash build.
    sql("llm_dedup_embed_lsh",
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |proj AS (
        |  SELECT vec_id, i // 6 AS t,
        |         SUM(CASE WHEN list_dot_product(e,
        |               [CAST((i*131 + d) * 2654435761 % 1000003 AS DOUBLE)
        |                  / 1000003.0 - 0.5 for d in range(0, 64)]) >= 0
        |             THEN CAST(1 AS BIGINT) << (i % 6) ELSE 0 END) AS bucket
        |  FROM v CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS i)
        |  GROUP BY 1, 2
        |), ${graft.llmops.SkewGuard.oracleCandSql(
             "proj", Seq("t", "bucket"), "vec_id", "keep_id", "dup_id")}, p AS (
        |  SELECT c.keep_id, c.dup_id,
        |         list_dot_product(va.e, vb.e) /
        |           (sqrt(list_dot_product(va.e, va.e)) *
        |            sqrt(list_dot_product(vb.e, vb.e))) AS sim
        |  FROM cand c
        |  JOIN v va ON va.vec_id = c.keep_id
        |  JOIN v vb ON vb.vec_id = c.dup_id
        |)
        |SELECT dup_id, keep_id, sim FROM p
        |WHERE sim >= 0.45
        |QUALIFY row_number() OVER (PARTITION BY dup_id ORDER BY keep_id) = 1
        |ORDER BY dup_id""")(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        graft.functions.GraftFunctions.register(s)
        val dot = (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
          call_function("graft_dot", x, y)
        val v = t(s, d, "embeddings")
          .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("e"))
          .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
        val cand = Similarity.lshCollisionPairs(v.select("vec_id", "e"))
        cand.hint("shuffle_hash")
          .join(v.select(col("vec_id").as("keep_id"), col("e").as("ea"),
            col("nrm").as("na")), "keep_id")
          .hint("shuffle_hash")
          .join(v.select(col("vec_id").as("dup_id"), col("e").as("eb"),
            col("nrm").as("nb")), "dup_id")
          .withColumn("sim", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
          .filter(col("sim") >= 0.45)
          .withColumn("rn", row_number().over(
            Window.partitionBy("dup_id").orderBy("keep_id")))
          .filter(col("rn") === 1)
          .select("dup_id", "keep_id", "sim")
          // persist before the global sort (r14 recipe: the range
          // sampler otherwise re-executes the uncached tail)
          .transform(graft.core.Caching.persistOnce)
          .orderBy("dup_id")
      }),

    // ── SemDeDup-style cluster-scoped embedding dedup (Abbas et al.
    //    2023): pairs scanned ONLY within each vector's 3 nearest IVF
    //    clusters — k local n/k problems instead of the n² corpus scan,
    //    the published semantic-dedup shape. Cluster means fold floats
    //    in shuffle order, so (like llm_sim_ivf) the pair LIST is not
    //    row-gateable; the row is SELF-CHECKING instead: emitted pairs
    //    must be an exact-cosine SUBSET of the full pairwise result and
    //    recall vs that baseline must clear the floor named in the
    //    metric (measured 0.86-1.0 across SFs; the baseline join is
    //    gate harness only — at corpus scale only the cluster scan
    //    runs).
    sql("llm_dedup_embed_sem",
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |p AS (
        |  SELECT count(*) AS n FROM v a JOIN v b ON a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.e, b.e) /
        |        (sqrt(list_dot_product(a.e, a.e)) *
        |         sqrt(list_dot_product(b.e, b.e))) >= 0.45
        |)
        |SELECT 'semdedup_subset_and_recall_vs_exact_ge_0.6' AS metric,
        |       CAST(n AS BIGINT) AS n_exact_pairs,
        |       TRUE AS subset_ok, TRUE AS recall_ok
        |FROM p""")(
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val e = t(s, d, "embeddings")
        // the cluster-scoped pair set memoizes per (session, dir) like
        // the exact baseline below — a production SemDeDup run persists
        // its pair table; re-deriving it per consumer would re-run the
        // per-cluster scans each time
        val sem = Caching.memoDf(s, s"semPairs:$d") {
          Similarity.semDedupPairs(e, 0.45, cacheKey = Some(s"ivfCents:$d"))
        }.select(col("dup_id"), col("keep_id"), lit(1).as("sm"))
        // recall baseline = the SAME cached exact pair scan
        // llm_dedup_embed consumes (identical keep_id < dup_id
        // orientation)
        val exact = exactEmbedPairs(s, d)
          .select(col("dup_id"), col("keep_id"), lit(1).as("ex"))
        exact.join(sem, Seq("dup_id", "keep_id"), "full_outer")
          .agg(
            coalesce(sum("ex"), lit(0)).cast("long").as("n_exact_pairs"),
            coalesce(sum(when(col("ex") === 1 && col("sm") === 1, 1)),
              lit(0)).as("n_both"),
            coalesce(sum(when(col("ex").isNull, 1)), lit(0)).as("n_extra"))
          .select(
            lit("semdedup_subset_and_recall_vs_exact_ge_0.6").as("metric"),
            col("n_exact_pairs"),
            (col("n_extra") === 0).as("subset_ok"),
            (col("n_both").cast("double") /
              greatest(col("n_exact_pairs"), lit(1)) >= 0.6).as("recall_ok"))
      })
  )
}
