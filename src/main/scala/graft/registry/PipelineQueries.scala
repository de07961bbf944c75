package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llmops.Text
import graft.operators.AsOfJoin
import graft.sources.Bucketing

/** Round-3 additions: the training-data-pipeline operators a 100 TB
  * corpus build runs between dedup and training — sequence packing,
  * chunking, eval-set contamination, split assignment — plus two
  * whole-operator scale demonstrations (as-of join, bucketed co-located
  * join). Every query is oracle-gated.
  */
object PipelineQueries {
  import QueryDef.sql

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Context-window length for sequence packing (tokens). */
  val PackLen = 512
  /** Chunk window / stride (tokens) for overlapping chunking. */
  val ChunkLen = 64
  val ChunkStride = 48

  /** Whitespace token count with the empty-document guard (same formula
    * as `llm_text_tokens`' n_ws). */
  private def nTokens(text: org.apache.spark.sql.Column) =
    graft.llmops.Text.nTokens(text)

  val defs: Seq[QueryDef] = Seq(

    // ── As-of (point-in-time) join: each purchase event picks up the
    //    same user's most recent signup at-or-before it. The Spark side
    //    is the union-merge temporal join (ONE shuffle on user_id,
    //    linear per partition — see AsOfJoin); the oracle states the
    //    same semantics as the quadratic inequality-join + QUALIFY,
    //    which only an oracle-scale engine can afford.
    sql("ev1_asof_attribution",
      """SELECT p.event_id, p.user_id,
        |       strftime(CAST(p.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        |       p.value,
        |       s.event_id AS signup_event_id,
        |       epoch_us(CAST(s.ts AS TIMESTAMP)) AS signup_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON s.user_id = p.user_id
        | AND CAST(s.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        |QUALIFY row_number() OVER (PARTITION BY p.event_id
        |  ORDER BY s.ts DESC, s.event_id DESC) = 1
        |ORDER BY p.event_id""")(
      (s, d) => {
        // ASYMMETRIC as-of: the right side (signups) is dimension-like —
        // bounded rows per user — while purchases are the fact stream.
        // Folding each user's signups into ONE sorted array row and
        // probing it per purchase replaces the corpus-wide
        // partition-sort + running-window of the generic as-of with a
        // small aggregate + hash join + per-row array search: the big
        // side is never sorted on (user, ts) at all. The general
        // unbounded-both-sides operator remains AsOfJoin.asOfTagged
        // (ev5/spec surface); this is the shape to pick when one side
        // aggregates to per-key arrays that fit a row (at 100 TB:
        // signups per user are account-lifecycle-bounded, so the array
        // row stays KB-sized however big the corpus grows).
        val ev = t(s, d, "events")
        AsOfJoin.asOfArrayProbe(
            left = ev.filter(col("event_type") === "purchase")
              .select("event_id", "user_id", "ts", "value"),
            right = ev.filter(col("event_type") === "signup"),
            keys = Seq("user_id"),
            leftTime = col("ts"), rightTime = col("ts"),
            rightPayload = Seq(
              "signup_event_id" -> col("event_id"),
              "signup_us" -> unix_micros(col("ts"))),
            rightTiebreak = col("event_id"))
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
            col("value"), col("signup_event_id"), col("signup_us"))
          // persist before the global sort (range-sampler re-execution)
          .transform(df => graft.core.Caching.persistOnce(df))
          .orderBy("event_id")
      }),

    // ── Interval attribution PAIRS (the stream-stream join surface):
    //    every view each purchase can credit within the preceding hour,
    //    same user, half-open (p.ts − 1h, p.ts]. The Spark side is
    //    EventOps.attributionJoin — on watermarked streams the SAME
    //    expression is Spark's stream-stream inner join with state
    //    bounded to watermark + horizon (StreamingSpec drives that twin
    //    over the real fixture); this batch form is the oracle check.
    sql("ev5_attribution_pairs",
      """WITH ev AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
        |  FROM events
        |)
        |SELECT p.event_id AS conv_event_id, v.event_id AS src_event_id,
        |       p.user_id AS user_id,
        |       strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS src_ts,
        |       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS conv_ts,
        |       epoch_us(p.ts) - epoch_us(v.ts) AS lag_us
        |FROM (SELECT * FROM ev WHERE event_type = 'view') v
        |JOIN (SELECT * FROM ev WHERE event_type = 'purchase') p
        |  ON v.user_id = p.user_id
        | AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL 1 HOUR
        |ORDER BY conv_event_id, src_event_id""")(
      (s, d) => {
        val ev = t(s, d, "events")
        // persist before the global sort: the sampler otherwise
        // re-executes the attribution join (the r14 recipe)
        graft.core.Caching.persistOnce(
          graft.streaming.EventOps.attributionJoin(
              ev.filter(col("event_type") === "view"),
              ev.filter(col("event_type") === "purchase"),
              horizon = "1 HOUR")
            .select(col("conv_event_id"), col("src_event_id"), col("user_id"),
              date_format(col("src_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .as("src_ts"),
              date_format(col("conv_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .as("conv_ts"),
              col("lag_us")))
          .orderBy("conv_event_id", "src_event_id")
      }),

    // ── Point-in-interval RANGE join: events labeled by every campaign
    //    window containing them (overlaps allowed, half-open [ws, we)).
    //    The Spark side is the bucketed range join (operators/RangeJoin:
    //    intervals replicate to their ≤ len/bin+1 time bins, points map
    //    to one bin, ONE equi-shuffle each + exact post-filter — never a
    //    BroadcastNestedLoop/cartesian); the oracle states the naive
    //    non-equi join only an oracle-scale engine can afford. Windows
    //    derive from orders: start = Jan 2024 epoch + (key%720) h,
    //    length = key%7+1 h; bin width 8 h ≥ the longest interval, so
    //    replication ≤ 2 rows per window.
    sql("ev4_range_label",
      """WITH w AS (
        |  SELECT 'w' || CAST(o_orderkey AS VARCHAR) AS label,
        |         TIMESTAMP '2024-01-01 00:00:00'
        |           + (o_orderkey % 720) * INTERVAL 1 HOUR AS ws,
        |         TIMESTAMP '2024-01-01 00:00:00'
        |           + (o_orderkey % 720 + o_orderkey % 7 + 1) * INTERVAL 1 HOUR AS we
        |  FROM orders WHERE o_orderkey < 200
        |)
        |SELECT e.event_id, w.label
        |FROM events e JOIN w
        |  ON CAST(e.ts AS TIMESTAMP) >= w.ws
        | AND CAST(e.ts AS TIMESTAMP) < w.we
        |ORDER BY e.event_id, w.label""")(
      (s, d) => {
        val HourUs = 3600L * 1000000L
        val baseUs = 1704067200L * 1000000L // 2024-01-01T00:00:00Z
        val w = t(s, d, "orders").filter(col("o_orderkey") < 200)
          .select(concat(lit("w"), col("o_orderkey").cast("string")).as("label"),
            timestamp_micros(lit(baseUs)
              + (col("o_orderkey") % 720) * HourUs).as("ws"),
            timestamp_micros(lit(baseUs)
              + (col("o_orderkey") % 720 + col("o_orderkey") % 7 + 1) * HourUs)
              .as("we"))
        // persist before the global sort: the range sampler otherwise
        // re-executes the bucketed bin join (the r14 recipe)
        graft.core.Caching.persistOnce(
            graft.operators.RangeJoin.pointInInterval(
              t(s, d, "events").select("event_id", "ts"), col("ts"),
              w, col("ws"), col("we"), binMicros = 8 * HourUs)
            .select("event_id", "label"))
          .orderBy("event_id", "label")
      }),

    // ── Retention cohorts: users grouped by first-activity day, counted
    //    on each later activity day — the product-analytics matrix every
    //    event warehouse serves. Shape: ONE events scan and ONE
    //    map-side-combined shuffle — per user, min(day) and the distinct
    //    day set come out of the same aggregate (partial collect_sets
    //    merge, so the exchange carries day-sets, not events), the
    //    explode back to (cohort, day) is narrow, and the closing
    //    (cohort, offset) agg is matrix-sized. The join-back + 3-column
    //    distinct this replaced cost two extra corpus-sized exchanges.
    //    Per-user day sets are bounded by the calendar (≤ timespan
    //    days), never by event volume, so the aggregate state is safe
    //    at any corpus size.
    sql("ev2_retention_cohorts",
      """WITH e AS (
        |  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
        |  FROM events
        |), firstday AS (
        |  SELECT user_id, min(day) AS cohort FROM e GROUP BY user_id
        |), act AS (
        |  SELECT DISTINCT f.cohort, e.day, e.user_id
        |  FROM e JOIN firstday f USING (user_id)
        |)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
        |       CAST(date_diff('day', cohort, day) AS BIGINT) AS day_offset,
        |       CAST(count(*) AS BIGINT) AS n_users
        |FROM act GROUP BY cohort, date_diff('day', cohort, day)
        |ORDER BY cohort_day, day_offset""")(
      (s, d) => {
        val e = t(s, d, "events")
          .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        e.groupBy("user_id")
          .agg(min("day").as("cohort"), collect_set("day").as("days"))
          .select(col("cohort"), explode(col("days")).as("day"))
          .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
            datediff(col("day"), col("cohort")).cast("long").as("day_offset"))
          .groupBy("cohort_day", "day_offset")
          .agg(count(lit(1)).as("n_users"))
          // persist before the global sort (r14 recipe): the sampler
          // otherwise re-executes the two-aggregate tail; the result is
          // (cohort × offset)-sized — grows with the event window, so
          // it keeps a range sort rather than a single-partition one
          .transform(graft.core.Caching.persistOnce)
          .orderBy("cohort_day", "day_offset")
      }),

    // ── Funnel conversion: users progressing view → click → purchase
    //    with STRICTLY later timestamps at each step (first-touch
    //    chaining: the first view, the first click after it, the first
    //    purchase after that). ONE conditional-aggregation pass per
    //    user (the oracle's staged CTEs are the SPEC, not the plan),
    //    then a single 1-row summary; the final frame is three literal
    //    rows. Timestamp comparisons happen at microsecond
    //    grain on BOTH engines (DuckDB's CAST(ns AS TIMESTAMP) and the
    //    engine's nanos→micros load are the same truncation).
    sql("ev3_funnel_conversion",
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events
        |), s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
        |), n AS (
        |  SELECT (SELECT count(*) FROM s1) AS n1,
        |         (SELECT count(*) FROM s2) AS n2,
        |         (SELECT count(*) FROM s3) AS n3
        |)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'view' AS step,
        |         CAST(n1 AS BIGINT) AS n_users, 1.0 AS conversion FROM n
        |  UNION ALL
        |  SELECT 2, 'click', CAST(n2 AS BIGINT),
        |         CAST(n2 AS DOUBLE) / nullif(n1, 0) FROM n
        |  UNION ALL
        |  SELECT 3, 'purchase', CAST(n3 AS BIGINT),
        |         CAST(n3 AS DOUBLE) / nullif(n1, 0)
        |  FROM n)
        |ORDER BY stage""")(
      (s, d) => {
        // ONE conditional-aggregation pass per user replaces the three
        // dependent stage-aggregates (+2 joins, +2 crossJoins) this ran
        // as: t1 is min view ts; the later stages come from per-type
        // timestamp arrays filtered IN-ROW (first click > t1, first
        // purchase > t2) — a null t-k propagates, so users missing a
        // stage drop out exactly as the join chain dropped them. Array
        // state is per-user click/purchase counts (bounded by per-user
        // activity, not corpus size). Cost: one corpus shuffle + one
        // 1-row summary vs six stage-chained jobs — the sf0.1 flag was
        // job-launch floor x job count, and this is also the 100 TB
        // shape (three corpus shuffles fused into one).
        val e = t(s, d, "events")
          .select(col("user_id"), col("event_type"), col("ts"))
          .filter(col("event_type").isin("view", "click", "purchase"))
        val n = e.groupBy("user_id")
          .agg(
            min(when(col("event_type") === "view", col("ts"))).as("t1"),
            collect_list(when(col("event_type") === "click", col("ts")))
              .as("cks"),
            collect_list(when(col("event_type") === "purchase", col("ts")))
              .as("pks"))
          .withColumn("t2",
            array_min(filter(col("cks"), c => c > col("t1"))))
          .withColumn("t3",
            array_min(filter(col("pks"), c => c > col("t2"))))
          .agg(count(col("t1")).as("n1"), count(col("t2")).as("n2"),
            count(col("t3")).as("n3"))
        n.select(explode(array(
            struct(lit(1L).as("stage"), lit("view").as("step"),
              col("n1").as("n_users"), lit(1.0).as("conversion")),
            // nullif guard: Spark's Divide yields NULL on a zero
            // divisor where DuckDB's IEEE mode yields NaN — pin both
            // engines to NULL for the no-view-users corpus
            struct(lit(2L).as("stage"), lit("click").as("step"),
              col("n2").as("n_users"),
              (col("n2").cast("double") / nullif(col("n1"), lit(0)))
                .as("conversion")),
            struct(lit(3L).as("stage"), lit("purchase").as("step"),
              col("n3").as("n_users"),
              (col("n3").cast("double") / nullif(col("n1"), lit(0)))
                .as("conversion"))))
            .as("r"))
          .select(col("r.stage").as("stage"), col("r.step").as("step"),
            col("r.n_users").as("n_users"), col("r.conversion").as("conversion"))
          .orderBy("stage")
      }),

    // ── User-journey transition matrix (first-order Markov sheet):
    //    per-user event sequences → (from, to) transition counts and
    //    probabilities. ONE shuffle on user_id for the lead() window
    //    (ties broken by event_id for a total order), then a
    //    map-side-combined pair aggregation; the normalizer is a window
    //    sum over the matrix-sized pair frame (no corpus-side join-back).
    sql("ev6_transition_matrix",
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events
        |), seq AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |             ORDER BY ts, event_id) AS to_type
        |  FROM e
        |), pair AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
        |), tot AS (
        |  SELECT from_type, CAST(sum(n) AS BIGINT) AS t FROM pair GROUP BY 1
        |)
        |SELECT p.from_type, p.to_type, p.n AS n_transitions,
        |       CAST(p.n AS DOUBLE) / t.t AS p_transition
        |FROM pair p JOIN tot t USING (from_type)
        |ORDER BY from_type, to_type""")(
      (s, d) => {
        // MEASURED NON-FIX: replacing the window with a per-user
        // sort_array(collect_list) + in-row zip_with pair walk ran
        // 0.555 s vs 0.469 s at sf0.1 — the HOF pair walk leaves
        // whole-stage codegen while lead() stays inside it. The
        // sort-based window IS the right plan; the residual cost is
        // the per-stage floor on a 100k-row table.
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val e = t(s, d, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        // the window's sort parallelism is derived, not the global
        // shuffle.partitions constant: at least the scan's split count
        // (cluster scale: thousands of splits → the sort stays wide),
        // at least a quarter of the cores (small inputs: p=1
        // serializes the sort — measured 0.60 s vs 0.30 s at p=8 on
        // the 1-split sf0.1 scan, while 32 tasks on 1 split is pure
        // launch overhead). This is AQE-coalescing behavior, hand-
        // derived because the driver benches with AQE off.
        val p = math.max(e.rdd.getNumPartitions,
          s.sparkContext.defaultParallelism / 4)
        val pair = e.repartition(p, col("user_id"))
          .withColumn("to_type", lead("event_type", 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        // the tail runs on the ALREADY-AGGREGATED pair frame
        // (|event_types|^2 rows — matrix-sized, never corpus-sized):
        // coalesce(1) reports SinglePartition, which satisfies the
        // normalizer window's ClusteredDistribution AND the final
        // sort's ordering requirement, so normalizer + projection +
        // total order fuse into ONE exchange-free stage — where the
        // old groupBy + join-back + orderBy ran two extra exchanges
        // plus the range-partitioner's sampling job
        pair.coalesce(1)
          .withColumn("t", sum("n").over(Window.partitionBy("from_type")))
          .select(col("from_type"), col("to_type"),
            col("n").as("n_transitions"),
            (col("n").cast("double") / col("t")).as("p_transition"))
          .sortWithinPartitions("from_type", "to_type")
      }),

    // ── Sequence packing: assign each document its span of fixed-length
    //    context windows in the concatenated token stream. Packing is
    //    per SOURCE (real pipelines pack per input shard), and the
    //    per-source running total is computed with the two-level
    //    stitched prefix scan — source is low-cardinality, so the naive
    //    `SUM OVER (PARTITION BY source ORDER BY doc_id)` would still
    //    serialize each source's corpus share through one reducer; the
    //    oracle states it that way because oracle scale can afford to.
    sql("llm_pack_windows",
      s"""WITH toks AS (
        |  SELECT doc_id, source,
        |         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
        |           AS BIGINT) AS n_tokens
        |  FROM documents
        |), packed AS (
        |  SELECT doc_id, source, n_tokens,
        |         -- CAST: DuckDB SUM(BIGINT) is HUGEINT, which pandas
        |         -- renders as float64 and fails the driver's hash compare
        |         CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source
        |           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
        |           AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |  FROM toks WHERE n_tokens > 0
        |)
        |SELECT doc_id, source, n_tokens,
        |       cum_before // $PackLen AS window_start,
        |       (cum_before + n_tokens - 1) // $PackLen AS window_end,
        |       (cum_before + n_tokens - 1) // $PackLen
        |         - cum_before // $PackLen + 1 AS n_windows
        |FROM packed ORDER BY doc_id""")(
      (s, d) => {
        // persist the NARROW token-count frame: PrefixSum's two passes
        // (local window + shard totals) would otherwise each re-run the
        // regex token count over the full text column — the query's
        // dominant cost paid twice (three times with the sort sampler)
        val docs = graft.core.Caching.persistOnce(
          t(s, d, "documents")
            .select(col("doc_id"), col("source"),
              nTokens(col("text")).as("n_tokens"))
            .filter(col("n_tokens") > 0))
        // the per-source running total via the two-level stitched scan:
        // `source` is low-cardinality, so a window partitioned by it
        // alone would serialize each source's corpus share through one
        // task at 100× — PrefixSum range-shards on doc_id, scans each
        // (source, shard) locally, and stitches shard offsets through
        // the shard-totals-sized frame (core/PrefixSum.scala)
        graft.core.Caching.persistOnce(
          graft.core.PrefixSum.exclusive(docs, "n_tokens", "doc_id",
              groupCols = Seq("source"),
              snapshot = false) // upstream = the pinned narrow frame
            .select(col("doc_id"), col("source"), col("n_tokens"),
              expr(s"cum_before DIV $PackLen").as("window_start"),
              expr(s"(cum_before + n_tokens - 1) DIV $PackLen").as("window_end"),
              expr(s"(cum_before + n_tokens - 1) DIV $PackLen" +
                s" - cum_before DIV $PackLen + 1").as("n_windows")))
          // persist before the global sort (sampler re-execution)
          .orderBy("doc_id")
      }),

    // ── Overlapping chunking: split each document into ChunkLen-token
    //    windows every ChunkStride tokens (RAG / long-context
    //    preprocessing). Perfectly narrow — chunk count and content are
    //    per-row expressions, no shuffle anywhere; the chunk text rides
    //    as an md5 so the output stays compact.
    sql("llm_chunk_overlap",
      s"""WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS tk
        |  FROM documents WHERE length(trim(text)) > 0
        |), sized AS (
        |  SELECT doc_id, tk, len(tk) AS n FROM toks
        |), chunks AS (
        |  SELECT doc_id, n, tk,
        |         unnest(generate_series(0,
        |           CASE WHEN n > $ChunkLen
        |                THEN (n - $ChunkLen + $ChunkStride - 1) // $ChunkStride
        |                ELSE 0 END)) AS chunk_idx
        |  FROM sized
        |)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |       CAST(chunk_idx * $ChunkStride AS BIGINT) AS start_tok,
        |       CAST(least($ChunkLen, n - chunk_idx * $ChunkStride) AS BIGINT)
        |         AS chunk_len,
        |       md5(array_to_string(
        |         tk[chunk_idx * $ChunkStride + 1 :
        |            chunk_idx * $ChunkStride + $ChunkLen], ' ')) AS chunk_md5
        |FROM chunks ORDER BY doc_id, chunk_idx""")(
      (s, d) => {
        val docs = t(s, d, "documents")
          .filter(length(trim(col("text"))) > 0)
          .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
          .withColumn("n", size(col("tk")).cast("long"))
        docs
          .withColumn("chunk_idx", explode(sequence(lit(0L),
            expr(s"CASE WHEN n > $ChunkLen THEN " +
              s"(n - $ChunkLen + $ChunkStride - 1) DIV $ChunkStride " +
              "ELSE 0 END"))))
          .select(col("doc_id"), col("chunk_idx"),
            (col("chunk_idx") * ChunkStride).as("start_tok"),
            least(lit(ChunkLen),
              col("n") - col("chunk_idx") * ChunkStride).as("chunk_len"),
            md5(concat_ws(" ",
              slice(col("tk"),
                (col("chunk_idx") * ChunkStride + 1).cast("int"),
                lit(ChunkLen)))).as("chunk_md5"))
          .orderBy("doc_id", "chunk_idx")
      }),

    // ── Eval-set contamination: for each held-out document (doc_id
    //    divisible by 50), the fraction of its shingles that appear
    //    anywhere in the training split. Scale shape: the train
    //    VOCABULARY (distinct grams, map-side combined) semi-joins the
    //    eval postings on the gram hash — no pairwise doc×doc work at
    //    all, unlike per-pair overlap. Reuses the cached gram stats the
    //    dedup family builds.
    sql("llm_contamination",
      s"""WITH ${LlmQueries.ShingleCtes}, ghd AS (
        |  SELECT DISTINCT doc_id, g FROM gh
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM ghd GROUP BY doc_id
        |), tv AS (
        |  SELECT DISTINCT g FROM ghd WHERE doc_id % 50 <> 0
        |), hits AS (
        |  SELECT doc_id, count(*) AS n_hit FROM ghd
        |  WHERE doc_id % 50 = 0 AND g IN (SELECT g FROM tv)
        |  GROUP BY doc_id
        |)
        |SELECT s.doc_id, CAST(s.n AS BIGINT) AS n_grams,
        |       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
        |       CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / s.n AS contamination
        |FROM sizes s LEFT JOIN hits h ON h.doc_id = s.doc_id
        |WHERE s.doc_id % 50 = 0
        |ORDER BY s.doc_id""")(
      (s, d) => {
        // ONE full shuffle on the gram hash (pure codegen'd max
        // aggregates with map-side partials — no list state, nothing to
        // spill), folding each gram to train/eval presence flags. The
        // semi-join that follows ships only the grams present in BOTH
        // splits plus the eval rows (~2% of docs) — replacing the
        // previous plan's full train-vocab DISTINCT exchange. At sf0.1
        // the three shapes bench equal (the time is docGramStats'
        // shared materialization); this one has the best 100 TB
        // properties.
        val rows = LlmQueries.gramSetRows(s, d)
        val isEval = LlmQueries.isEvalDoc
        // the flag aggregation is the SHARED per-gram vocabulary cache
        // (LlmQueries.gramDfFlags) — the same persisted frame serves the
        // ngram dedup's viral-df cap, so the suite pays this shuffle once
        val sharedGrams = LlmQueries.gramDfFlags(s, d)
          .filter(col("in_train") === 1 && col("in_eval") === 1)
          .select("g")
        val hits = rows.filter(isEval)
          .join(sharedGrams, Seq("g"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
        LlmQueries.docGramStats(s, d)
          .filter(col("doc_id") % 50 === 0)
          .select(col("doc_id"), col("n").as("n_grams"))
          .join(hits, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_grams"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"),
            (coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_grams"))
              .as("contamination"))
          .orderBy("doc_id")
      }),

    // ── Train-side DECONTAMINATION (the removal step llm_contamination
    //    only measures): drop every TRAIN document sharing ≥ 8 distinct
    //    shingles with the eval holdout — the GPT-3-style n-gram filter
    //    a pipeline actually executes before training — and account the
    //    doc/token cost per source. Scale shape: the contaminated
    //    vocabulary comes off the SHARED per-gram flag cache (one
    //    gram-hash shuffle for the whole dedup/contamination family),
    //    the per-doc overlap count is a semi-join + partial-aggregated
    //    groupBy on doc_id (reusing the gram cache's hash partitioning,
    //    no extra exchange), and the rollup partial-aggregates per
    //    source — nothing doc-pair-shaped, nothing corpus-sorted.
    sql("llm_decontaminate_rm",
      s"""WITH ${LlmQueries.ShingleCtes}, ghd AS (
        |  SELECT DISTINCT doc_id, g FROM gh
        |), flags AS (
        |  SELECT g,
        |         max(CASE WHEN doc_id % 50 <> 0 THEN 1 ELSE 0 END) AS in_train,
        |         max(CASE WHEN doc_id % 50 = 0 THEN 1 ELSE 0 END) AS in_eval
        |  FROM ghd GROUP BY g
        |), shared AS (
        |  SELECT doc_id, count(*) AS n_shared FROM ghd
        |  WHERE doc_id % 50 <> 0
        |    AND g IN (SELECT g FROM flags WHERE in_train = 1 AND in_eval = 1)
        |  GROUP BY doc_id
        |), d AS (
        |  SELECT doc_id, source,
        |         CASE WHEN length(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+'))
        |         END AS n_tok,
        |         CASE WHEN COALESCE(
        |           (SELECT n_shared FROM shared s WHERE s.doc_id = documents.doc_id),
        |           0) >= 8 THEN 1 ELSE 0 END AS dropped
        |  FROM documents WHERE doc_id % 50 <> 0
        |)
        |SELECT source,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(dropped) AS BIGINT) AS n_dropped,
        |       CAST(sum(CASE WHEN dropped = 0 THEN n_tok ELSE 0 END) AS BIGINT)
        |         AS tokens_kept,
        |       CAST(sum(CASE WHEN dropped = 1 THEN n_tok ELSE 0 END) AS BIGINT)
        |         AS tokens_dropped
        |FROM d GROUP BY source ORDER BY source""")(
      (s, d) => {
        val contam = LlmQueries.gramDfFlags(s, d)
          .filter(col("in_train") === 1 && col("in_eval") === 1)
          .select("g")
        val nShared = LlmQueries.gramSetRows(s, d)
          .filter(!LlmQueries.isEvalDoc)
          .join(contam, Seq("g"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
        t(s, d, "documents")
          .filter(col("doc_id") % 50 =!= 0)
          .select(col("doc_id"), col("source"), nTokens(col("text")).as("n_tok"))
          .join(nShared, Seq("doc_id"), "left")
          .withColumn("dropped",
            when(coalesce(col("n_shared"), lit(0L)) >= 8, 1L).otherwise(0L))
          .groupBy("source").agg(
            count(lit(1)).as("n_docs"),
            sum(col("dropped")).as("n_dropped"),
            sum(when(col("dropped") === 0, col("n_tok")).otherwise(0L))
              .as("tokens_kept"),
            sum(when(col("dropped") === 1, col("n_tok")).otherwise(0L))
              .as("tokens_dropped"))
          .transform(QueryDef.sortedRollup(_, "source"))
      }),

    // ── Deterministic stratified split assignment: a content-free,
    //    coordination-free train/val/test split from a stable hash of
    //    the key — every engine that re-derives it gets the same answer
    //    (no RNG, no state), and proportions hold within every stratum
    //    in expectation. Narrow per-row expressions; trivially 100 TB.
    sql("llm_split_assign",
      s"""SELECT doc_id, lang,
        |       ${QueryDef.hashBucketSql("CAST(doc_id AS VARCHAR)")} AS bucket,
        |       CASE WHEN ${QueryDef.hashBucketSql("CAST(doc_id AS VARCHAR)")}
        |                 < 0.9 * 2147483647 THEN 'train'
        |            WHEN ${QueryDef.hashBucketSql("CAST(doc_id AS VARCHAR)")}
        |                 < 0.95 * 2147483647 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""")(
      (s, d) => {
        val bucket = Text.hash60(col("doc_id").cast("string"))
        t(s, d, "documents").select(col("doc_id"), col("lang"),
            bucket.as("bucket"),
            when(bucket < 0.9 * 2147483647L, "train")
              .when(bucket < 0.95 * 2147483647L, "val")
              .otherwise("test").as("split"))
          .orderBy("doc_id")
      }),

    // ── Length-grouped inference batching: docs are grouped into
    //    fixed-size model batches of SIMILAR token length so per-batch
    //    padding (to the batch max) is near-minimal — the standard
    //    serving/inference packing step. The batch ORDER sorts by
    //    (n_tokens, doc_id) within a 64-token band, so all docs of one
    //    exact length are interchangeable for the PADDING SHEET — which
    //    means the whole output derives from the (bucket, n_tokens)
    //    HISTOGRAM: each length run occupies positions
    //    [cum, cum + count) in its band, batch membership is interval
    //    arithmetic on those positions, and the per-batch stats are
    //    overlap-weighted sums. ONE map-side-combined corpus pass, a
    //    cumsum over the ≤64-row-per-band histogram, a histogram-sized
    //    explode, and a tiny final agg — no per-doc rank at any scale
    //    (the oracle states the per-doc window because oracle scale can).
    sql("llm_infer_batches",
      """WITH tk AS (
        |  SELECT doc_id,
        |         len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens
        |  FROM documents WHERE length(trim(text)) > 0
        |), ordered AS (
        |  SELECT doc_id, n_tokens, n_tokens // 64 AS bucket,
        |         row_number() OVER (PARTITION BY n_tokens // 64
        |             ORDER BY n_tokens, doc_id) AS rn
        |  FROM tk
        |), batched AS (
        |  SELECT doc_id, n_tokens, bucket, (rn - 1) // 32 AS batch_seq
        |  FROM ordered
        |)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |       CAST(batch_seq AS BIGINT) AS batch_seq,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(max(n_tokens) AS BIGINT) AS max_tokens,
        |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |       CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT) AS padding_waste
        |FROM batched GROUP BY bucket, batch_seq
        |ORDER BY bucket, batch_seq""")(
      (s, d) => {
        val tk = t(s, d, "documents")
          .filter(length(trim(col("text"))) > 0)
          .select(col("doc_id"),
            size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
          .withColumn("bucket", (col("n_tokens") / 64).cast("long"))
        // the one corpus-touching pass
        val hist = tk.groupBy("bucket", "n_tokens")
          .agg(count(lit(1)).as("c"))
        // positions of each length run within its band — a cumsum over
        // the HISTOGRAM (≤64 rows per band; sits above the aggregate)
        val wb = Window.partitionBy("bucket").orderBy("n_tokens")
          .rowsBetween(Window.unboundedPreceding, -1)
        val pos = hist.withColumn("start",
          coalesce(sum("c").over(wb), lit(0L)))
        // batches the run [start, start+c) overlaps, with overlap sizes
        val batches = pos
          .withColumn("batch_seq", explode(sequence(
            expr("start DIV 32"), expr("(start + c - 1) DIV 32"))))
          .withColumn("overlap",
            least(col("start") + col("c"), (col("batch_seq") + 1) * 32) -
              greatest(col("start"), col("batch_seq") * 32))
        batches.groupBy("bucket", "batch_seq")
          .agg(sum("overlap").as("n_docs"),
            max("n_tokens").as("max_tokens"),
            sum(col("n_tokens") * col("overlap")).as("sum_tokens"))
          .select(col("bucket"), col("batch_seq"), col("n_docs"),
            col("max_tokens"), col("sum_tokens"),
            (col("n_docs") * col("max_tokens") - col("sum_tokens")).as("padding_waste"))
          .orderBy("bucket", "batch_seq")
      }),

    // ── W6: the GenAI labeling pipeline's CONSOLIDATION stage
    //    (metadataGenerationPipeline.py:296-370) — the reference hands
    //    a summarization PROMPT a list of per-view labels and asks for
    //    case-insensitive dedup (lowercase unless acronym), a <10%
    //    frequency outlier cut, and one JSON keywords array; those
    //    criteria are exactly relational, so the engine implements
    //    them deterministically (llmops/Inference.consolidateLabels)
    //    and the model boundary shrinks to the per-view label call.
    //    View labels modeled on lineitem (asset = order, view = line):
    //    a category label, a casing-variant label ('Red Car'/'red
    //    car' must merge; 'CAD' must stay upper), per-view 'none'
    //    results (dropped), and rare per-part labels the 10% cut
    //    removes. Scale shape: two map-side-combined aggregations, an
    //    integer-compare cut inside the array fold — no window, no
    //    collect.
    sql("w6_label_consolidate",
      """WITH vl AS (
        |  SELECT 'db' || CAST(l_orderkey % 5 AS VARCHAR) AS db,
        |         'o' || CAST(l_orderkey AS VARCHAR) AS aid,
        |         unnest([
        |           CASE l_partkey % 4 WHEN 0 THEN 'vehicle'
        |                WHEN 1 THEN 'building' WHEN 2 THEN 'terrain'
        |                ELSE 'none' END,
        |           CASE l_suppkey % 3 WHEN 0 THEN 'CAD'
        |                WHEN 1 THEN 'Red Car' ELSE 'red car' END,
        |           CASE WHEN l_partkey % 17 = 0
        |                THEN 'rare-' || CAST(l_partkey AS VARCHAR)
        |                ELSE 'metal' END]) AS label
        |  FROM lineitem WHERE l_orderkey < 300
        |), f AS (
        |  SELECT db, aid,
        |         CASE WHEN label = upper(label) THEN label
        |              ELSE lower(label) END AS norm
        |  FROM vl WHERE lower(label) <> 'none'
        |), c AS (
        |  SELECT db, aid, norm, count(*) AS c FROM f GROUP BY 1, 2, 3
        |), t AS (
        |  SELECT db, aid, SUM(c) AS total FROM c GROUP BY 1, 2
        |)
        |SELECT c.db AS databaseId, c.aid AS assetId,
        |       'aiKeywords' AS metadataKey,
        |       to_json(list(norm ORDER BY norm)
        |         FILTER (WHERE c.c * 10 >= t.total)) AS metadataValue,
        |       'string' AS metadataValueType
        |FROM c JOIN t ON c.db = t.db AND c.aid = t.aid
        |GROUP BY 1, 2 ORDER BY 1, 2""")(
      (s, d) => {
        val vl = t(s, d, "lineitem").filter(col("l_orderkey") < 300)
          .select(
            concat(lit("db"), (col("l_orderkey") % 5).cast("string"))
              .as("databaseId"),
            concat(lit("o"), col("l_orderkey").cast("string")).as("assetId"),
            explode(array(
              when(col("l_partkey") % 4 === 0, "vehicle")
                .when(col("l_partkey") % 4 === 1, "building")
                .when(col("l_partkey") % 4 === 2, "terrain")
                .otherwise("none"),
              when(col("l_suppkey") % 3 === 0, "CAD")
                .when(col("l_suppkey") % 3 === 1, "Red Car")
                .otherwise("red car"),
              when(col("l_partkey") % 17 === 0,
                  concat(lit("rare-"), col("l_partkey").cast("string")))
                .otherwise("metal"))).as("label"))
        // BOUNDED input (the l_orderkey < 300 key-range filter holds at
        // any SF — the j2/gx2/s11 recipe): one narrow exchange clusters
        // the ≤ ~6300 label rows on the asset key, and BOTH of
        // consolidateLabels' aggregations reuse it (hash(databaseId,
        // assetId) satisfies the (db, aid, norm) clustering too — subset
        // rule), where the default width paid 32-task stages per
        // aggregation for a few-hundred-row result (measured 131 tasks /
        // 5 stages → 3 tasks / 4 stages at sf0.1).
        graft.llmops.Inference.consolidateLabels(
            vl.repartition(1, col("databaseId"), col("assetId")))
          .orderBy("databaseId", "assetId")
      }),

    // ── Deterministic per-epoch training order: each epoch salts a
    //    stable hash of the doc id, the hash's low bits pick one of 8
    //    shards, and a window PARTITIONED BY (epoch, shard) assigns the
    //    within-shard position — so the "global shuffle before each
    //    epoch" every trainer needs is a hash + a partitioned window,
    //    never a corpus-wide total-order sort (a single-partition
    //    row_number() would serialize 100 TB through one task; per-shard
    //    numbering is embarrassingly parallel and the reader streams
    //    shards in shard order). Re-derivable by any engine: no RNG, no
    //    state; a new epoch is a new salt, nothing is rewritten.
    sql("llm_shuffle_epoch",
      s"""WITH e AS (
        |  SELECT doc_id, epoch FROM documents, (VALUES (0), (1)) AS ep(epoch)
        |), h AS (
        |  SELECT doc_id, epoch,
        |         ${QueryDef.hashBucketSql("'epoch:' || epoch || ':' || doc_id")} AS h
        |  FROM e
        |)
        |SELECT doc_id, epoch, h % 8 AS shard,
        |       CAST(row_number() OVER (PARTITION BY epoch, h % 8
        |                               ORDER BY h, doc_id) AS BIGINT) AS pos
        |FROM h ORDER BY epoch, shard, pos""")(
      (s, d) => {
        val h = Text.hash60(concat(lit("epoch:"), col("epoch").cast("string"),
          lit(":"), col("doc_id").cast("string")))
        // per-(epoch, shard) positions via the stitched row-number scan:
        // 16 (epoch, shard) cells over the corpus would each be a
        // corpus/16 single-task sort; PrefixSum subshards on the high
        // bits of h (h < 2^31, so >>19 gives 4096 range buckets, weakly
        // monotone in the (h, doc_id) order) and stitches counts
        val base = t(s, d, "documents")
          .select(col("doc_id"), explode(array(lit(0), lit(1))).as("epoch"))
          .select(col("doc_id"), col("epoch"), h.as("h"))
          .withColumn("shard", col("h") % 8)
        graft.core.PrefixSum.rowNumber(base, Seq("epoch", "shard"),
            Seq(col("h"), col("doc_id")), shiftright(col("h"), 19), "pos",
            snapshot = false) // upstream = one narrow id+hash projection
          .select(col("doc_id"), col("epoch"), col("shard"), col("pos"))
          // persist before the global sort: the sampler otherwise
          // re-runs the stitched row-number pass (A/B at sf0.1:
          // 0.70 s persisted vs 1.04 s not)
          .transform(graft.core.Caching.persistOnce)
          .orderBy("epoch", "shard", "pos")
      }),

    // ── Incremental-ingest funnel composing the round's new operators
    //    into the shape a standing 100 TB corpus actually runs nightly:
    //    the incoming batch is Bloom-screened against the corpus head
    //    fingerprints (exact dedup; corpus text never shuffles —
    //    llmops.BloomDedup), then near-dup-screened against the SimHash
    //    pair graph (fuzzy dedup: a batch doc is dropped when it has a
    //    hamming≤3 partner with a smaller id, or any corpus partner —
    //    the shared simhashPairs machinery), survivors pass the quality
    //    gate and the Gopher-style repetition gate (same arithmetic as
    //    llm_text_quality and llm_quality_repetition, so both engines
    //    compare bit-identical doubles), and the kept docs get their
    //    epoch-0 shard + position (partitioned window — no global sort,
    //    as llm_shuffle_epoch). One declarative plan end to end.
    sql("llm_ingest_funnel",
      s"""WITH ${LlmQueries.ShingleCtes}, ${LlmQueries.SimhashPairCtes}, nd AS (
        |  SELECT a_id, b_id FROM pairs WHERE bit_count(xor(sig_a, sig_b)) <= 3
        |), neardup AS (
        |  SELECT b_id AS doc_id FROM nd
        |  UNION
        |  SELECT a_id FROM nd WHERE b_id % 3 <> 0
        |), keyed AS (
        |  SELECT doc_id, text,
        |         array_to_string((regexp_split_to_array(trim(lower(text)), '\\s+'))[1:8], ' ') AS k
        |  FROM documents
        |), fresh AS (
        |  SELECT doc_id, text FROM keyed b
        |  WHERE b.doc_id % 3 = 0
        |    AND b.k NOT IN (SELECT k FROM keyed WHERE doc_id % 3 <> 0)
        |    AND b.doc_id NOT IN (SELECT doc_id FROM neardup)
        |), q AS (
        |  SELECT doc_id, text,
        |         0.5 * (CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
        |                  x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
        |                / len(regexp_split_to_array(trim(lower(text)), '\\s+')))
        |         + 0.5 * (1.0 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
        |                  / length(text)) AS quality
        |  FROM fresh
        |), tk AS (
        |  SELECT doc_id, quality, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
        |  FROM q WHERE quality >= 0.53
        |), occ AS (
        |  SELECT doc_id, unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS g
        |  FROM tk WHERE len(t) >= 2
        |), cnt AS (
        |  SELECT doc_id, g, count(*) AS c FROM occ GROUP BY doc_id, g
        |), rep AS (
        |  SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_frac
        |  FROM cnt GROUP BY doc_id
        |), kept AS (
        |  SELECT t.doc_id, t.quality,
        |         ${QueryDef.hashBucketSql("'epoch:0:' || t.doc_id")} AS h
        |  FROM tk t JOIN rep r USING (doc_id) WHERE r.top_frac < 0.06
        |)
        |SELECT doc_id, h % 8 AS shard,
        |       CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS BIGINT) AS pos,
        |       quality
        |FROM kept ORDER BY shard, pos""")(
      (s, d) => {
        val keyed = t(s, d, "documents").select(col("doc_id"), col("text"),
          array_join(slice(split(trim(lower(col("text"))), "\\s+", 9), 1, 8), " ").as("k"))
        // fuzzy screen: near-dup ids off the shared SimHash pair graph
        // (pair-graph-sized ≪ corpus, so the anti-join broadcasts it)
        val nd = LlmQueries.simhashPairs(s, d).select("a_id", "b_id")
        val nearDupIds = nd.select(col("b_id").as("doc_id"))
          .unionByName(nd.filter(col("b_id") % 3 =!= 0)
            .select(col("a_id").as("doc_id")))
          .distinct()
        val fresh = graft.llmops.BloomDedup.flagDups(
            batch = keyed.filter(col("doc_id") % 3 === 0),
            ref = keyed.filter(col("doc_id") % 3 =!= 0),
            keyCol = "k")
          .filter(!col("is_dup"))
          .join(broadcast(nearDupIds), Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("text"))
        val stops = Seq("the", "a", "of", "and", "to", "in", "is")
        // token array BOUND to a column before anything references it —
        // an expression-level tk inside the fold's lambda would
        // re-tokenize the text per ELEMENT (the Generate/HOF
        // re-evaluation trap documented at llm_quality_repetition;
        // measured here: 2.09 s vs 0.43 s for this query at sf0.1)
        val q = fresh
          .select(col("doc_id"), col("text"), Text.tokens(col("text")).as("tkc"))
          .select(col("doc_id"), col("tkc"),
            (lit(0.5) * (size(filter(col("tkc"), x => x.isInCollection(stops)))
              .cast("double") / size(col("tkc"))) +
              lit(0.5) * (lit(1.0) -
                graft.llmops.Text.nonAlnumCount(col("text")).cast("double") /
                  length(col("text")))).as("quality"))
          .filter(col("quality") >= 0.53)
          // single-token docs have no bigrams: the oracle drops them via
          // len(t) >= 2 + the rep inner join; without this guard,
          // sequence(1, 0) yields the DESCENDING [1, 0] and
          // element_at(tkc, 0) throws INVALID_INDEX_OF_ZERO
          .filter(size(col("tkc")) >= 2)
        // repetition gate as explode → two map-side-combined
        // aggregations (the oracle's own shape). NOT the fold-over-
        // sorted-bigrams form llm_quality_repetition uses: a fold in a
        // FILTER gets pushed below the join with its aliases inlined,
        // and the inlined lambda re-tokenizes the text per bigram
        // element (measured 2.07 s vs 0.43 s for this query at sf0.1).
        // The aggregation is a barrier predicate pushdown cannot cross,
        // and the (doc_id, gram) exchange is batch-sized — the
        // incremental batch, not the corpus. quality rides as a
        // grouping key (functionally dependent on doc_id).
        val bg = transform(sequence(lit(1), size(col("tkc")) - 1), i =>
          concat_ws(" ", element_at(col("tkc"), i), element_at(col("tkc"), i + 1)))
        // explode_OUTER deliberately: plain explode triggers
        // InferFiltersFromGenerate, which pushes an inferred
        // size(bg) > 0 predicate to the scan with the transform lambda
        // inlined — re-splitting the text per bigram element (measured
        // 5.3 s vs 0.14 s for this stage at sf0.1). outer explode is
        // exempt from that inference; the isNotNull filter on the
        // OUTPUT column restores exact explode semantics (it cannot be
        // pushed below the Generate that produces it).
        val kept = q
          .select(col("doc_id"), col("quality"), bg.as("bgc"))
          .select(col("doc_id"), col("quality"), explode_outer(col("bgc")).as("g"))
          .filter(col("g").isNotNull)
          .groupBy("doc_id", "quality", "g").agg(count(lit(1)).as("c"))
          .groupBy("doc_id", "quality").agg(max("c").as("mx"), sum("c").as("tot"))
          .filter(col("mx").cast("double") / col("tot") < 0.06)
          .withColumn("h", Text.hash60(concat(lit("epoch:0:"), col("doc_id").cast("string"))))
          .withColumn("shard", col("h") % 8)
        // stitched row numbers (8 shard cells would otherwise each be a
        // batch-fraction single-task sort — same fix as llm_shuffle_epoch)
        graft.core.PrefixSum.rowNumber(kept, Seq("shard"),
            Seq(col("h"), col("doc_id")), shiftright(col("h"), 19), "pos")
          .select(col("doc_id"), col("shard"), col("pos"), col("quality"))
          // persist before the global sort (r14 recipe: the range
          // sampler otherwise re-executes the uncached tail)
          .transform(graft.core.Caching.persistOnce)
          .orderBy("shard", "pos")
      }),

    // ── Bucketed co-located join: orders ⋈ customer on custkey over
    //    tables WRITTEN bucketed by the key — the join and the
    //    aggregation both run exchange-free (BucketingSpec pins zero
    //    ShuffleExchange in the plan). The oracle is the plain join:
    //    identical rows, different physics.
    sql("bk1_bucketed_join",
      """SELECT c.c_custkey, c.c_mktsegment,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_spend
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY 1, 2 ORDER BY c_custkey""")(
      (s, d) => {
        val (oT, cT) = Bucketing.colocatedOrdersCustomer(s, d)
        val o = s.table(oT)
        val c = s.table(cT)
        c.join(o, c("c_custkey") === o("o_custkey"))
          .groupBy(c("c_custkey"), c("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
              .as("total_spend"))
          .orderBy("c_custkey")
      }),

    // ── The transactional table format under the value gate (not just
    //    specs): documents MERGE into a TxLog table once per (JVM, sf)
    //    — partitioned by source, keys zero-padded so string order ==
    //    numeric order — then a key-RANGE lookup reads back through
    //    `spark.read.format("txlog")`. The pushed filters prune at the
    //    LOG level (partition + footer-stats keyRange: the bk1 of the
    //    table format — identical rows, different physics); the oracle
    //    is the plain predicate over the source parquet.
    sql("tx1_txlog_point_lookup",
      """SELECT source || '#' || lpad(CAST(doc_id AS VARCHAR), 8, '0')
        |         AS doc_key,
        |       lang, CAST(n_chars AS BIGINT) AS n_chars
        |FROM documents
        |WHERE source = 'src3' AND doc_id BETWEEN 100 AND 120
        |ORDER BY doc_key""")(
      (s, d) => {
        val dir = TxSideTables.docs(s, d)
        s.read.format("txlog").option("partitionColumn", "str_databaseid")
          .load(dir)
          .filter(col("str_databaseid") === "src3" &&
            col("_docId") >= "src3#00000100" &&
            col("_docId") <= "src3#00000120")
          .select(col("_docId").as("doc_key"), col("lang"),
            col("n_chars").cast("long").as("n_chars"))
          .orderBy("doc_key")
      }),

    // ── Transactional predicate UPDATE (Delta's UPDATE WHERE, the DML
    //    piece beside merge/deleteWhere): a fresh txlog copy takes one
    //    conflict-checked updateWhere — SET evaluated over the OLD row,
    //    commit refused if the head moved (TxLog.updateWhere) — and the
    //    read-back must equal the oracle's CASE over the source fixture.
    //    Idempotent across bench passes (re-running re-applies the same
    //    values). Change-feed visibility + the serializability race are
    //    spec'd in TxLogStatsSpec.
    sql("tx3_update_where",
      """SELECT source || '#' || lpad(CAST(doc_id AS VARCHAR), 8, '0')
        |         AS doc_key,
        |       CASE WHEN source = 'src3' AND doc_id % 7 = 0
        |            THEN 'xx' ELSE lang END AS lang,
        |       CAST(CASE WHEN source = 'src3' AND doc_id % 7 = 0
        |            THEN n_chars + 1000000 ELSE n_chars END AS BIGINT)
        |         AS n_chars
        |FROM documents WHERE source = 'src3'
        |ORDER BY doc_key""")(
      (s, d) => {
        val dir = TxSideTables.updatedDocs(s, d)
        graft.sources.TxLog.read(s, dir, partitions = Some(Set("src3")))
          .select(col("_docId").as("doc_key"), col("lang"),
            col("n_chars").cast("long").as("n_chars"))
          .orderBy("doc_key")
      }),

    // ── Incremental view maintenance, min/max flavor, END TO END: a
    //    txlog source takes three committed mutations (bootstrap
    //    inserts, an update batch that MOVES values, a delete batch
    //    that removes per-group BOUNDS), the (n, min, max) rollup is
    //    maintained from the change feed with group-local rescans
    //    (streaming/IncrementalAgg.applyChangesMinMax), and the gate
    //    reads the MAINTAINED table — the oracle recomputes the same
    //    final state from the source fixture, so the row proves the
    //    delta algebra + rescan logic, not a recompute.
    sql("iv1_minmax_rollup",
      """WITH st AS (
        |  SELECT lang,
        |         CAST(CASE WHEN doc_id % 10 = 0 THEN n_chars + 7
        |              ELSE n_chars END AS DOUBLE) AS v
        |  FROM documents WHERE doc_id % 13 <> 0
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       min(v) AS mn, max(v) AS mx
        |FROM st GROUP BY lang ORDER BY lang""")(
      (s, d) => {
        val roll = TxSideTables.minmaxRollup(s, d)
        graft.sources.TxLog.read(s, roll)
          .select(col("str_databaseid").as("lang"),
            col("n").as("n_docs"), col("mn"), col("mx"))
          .orderBy("lang")
      }),

    // ── Metadata-only table statistics: per-partition row counts, file
    //    counts, and key bounds answered ENTIRELY from the transaction
    //    log — not one data file is opened (TxLogStatsSpec proves it by
    //    deleting every parquet under the table and re-running). The
    //    oracle recomputes the same numbers the expensive way, from the
    //    source fixture. This is the Delta/Iceberg `SELECT count(*)`
    //    fast path surfaced as an operator: at 100 TB the most common
    //    catalog probes become a driver-sized log read.
    sql("tx2_stats_rowcount",
      """SELECT source AS partition, CAST(count(*) AS BIGINT) AS n_rows,
        |       min(source || '#' || lpad(CAST(doc_id AS VARCHAR), 8, '0')) AS min_key,
        |       max(source || '#' || lpad(CAST(doc_id AS VARCHAR), 8, '0')) AS max_key
        |FROM documents GROUP BY source ORDER BY partition""")(
      (s, d) => {
        val dir = TxSideTables.docs(s, d)
        val stats = graft.sources.TxLog.statsAggregate(s, dir)
          .getOrElse(sys.error("txlog files predate row stats"))
        import s.implicits._
        stats.map(p => (p.partition, p.rows,
            p.minKey.getOrElse(sys.error(s"no key bounds for ${p.partition}")),
            p.maxKey.getOrElse(sys.error(s"no key bounds for ${p.partition}"))))
          .toDF("partition", "n_rows", "min_key", "max_key")
          .orderBy("partition")
      }),

    // ── The INCREMENTAL curation funnel END TO END under the value
    //    gate (not just specs): the documents fixture streams through
    //    streaming/CurationStream in three deterministic micro-batches
    //    (doc_id % 3 = 0, 1, 2, in that arrival order) — quality
    //    expectations → Bloom+index exact screen → MinHash store screen
    //    → split merge — and the gate reads the maintained DECISIONS
    //    table. The oracle unrolls the three batches (the llm_bpe_merges
    //    precedent): per batch, candidates against prior batches'
    //    SURVIVORS under the same 64-smallest-per-cell cap and the same
    //    32-of-64 slot verify, self-screen with lower-doc-id-wins,
    //    exact tier as first-(batch, doc_id)-wins per content hash.
    //    So the row proves the streaming state machine — store growth by
    //    novel docs only, stage-order contract, arrival-order firsts —
    //    not a batch recompute.
    sql("st_curate_stream",
      s"""WITH ${LlmQueries.ShingleCtes}, base AS (
        |  SELECT doc_id, source, text, doc_id % 3 AS b,
        |         CASE WHEN length(trim(text)) = 0 THEN 0
        |              ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+'))
        |         END AS n_tokens,
        |         len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
        |             x -> x IN ('the','a','of','and','to','in','is'))) AS n_stop,
        |         ${QueryDef.hashBucketSql("CAST(doc_id AS VARCHAR)")} AS bucket
        |  FROM documents
        |), q AS (
        |  SELECT *, (n_tokens >= 20 AND n_stop * 50 >= n_tokens) AS q_pass
        |  FROM base
        |), ek AS (
        |  SELECT doc_id, b FROM (
        |    SELECT doc_id, b,
        |           row_number() OVER (PARTITION BY md5(text)
        |                              ORDER BY b, doc_id) AS rn
        |    FROM q WHERE q_pass) WHERE rn = 1
        |), sig AS (
        |  SELECT gh.doc_id, j,
        |         min((((((j+1)*2654435761) % 2147483647) * g)
        |              + (((j+17)*40503) % 2147483647)) % 2147483647) AS h
        |  FROM gh JOIN ek ON ek.doc_id = gh.doc_id
        |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j)
        |  GROUP BY gh.doc_id, j
        |), bands AS (
        |  SELECT s.doc_id, e.b, j // 4 AS band,
        |         string_agg(CAST(h AS VARCHAR), '_' ORDER BY j) AS bkey
        |  FROM sig s JOIN ek e USING (doc_id) GROUP BY s.doc_id, e.b, j // 4
        |), ${curateBatchSql(0)}, ${curateBatchSql(1)}, ${curateBatchSql(2)},
        |nd AS (
        |  SELECT doc_id FROM nd0 UNION ALL SELECT doc_id FROM nd1
        |  UNION ALL SELECT doc_id FROM nd2
        |)
        |SELECT q.doc_id, q.source, CAST(q.n_tokens AS BIGINT) AS n_tokens,
        |       CASE WHEN NOT q.q_pass THEN 'quality_fail'
        |            WHEN e.doc_id IS NULL THEN 'exact_dup'
        |            WHEN n.doc_id IS NOT NULL THEN 'near_dup'
        |            WHEN q.bucket < 0.9 * 2147483647 THEN 'train'
        |            WHEN q.bucket < 0.95 * 2147483647 THEN 'val'
        |            ELSE 'test' END AS stage
        |FROM q LEFT JOIN ek e ON e.doc_id = q.doc_id
        |       LEFT JOIN nd n ON n.doc_id = q.doc_id
        |ORDER BY q.doc_id""")(
      (s, d) => {
        val root = TxSideTables.curationRun(s, d)
        graft.sources.TxLog.read(s,
            graft.streaming.CurationStream.decisionsPath(root))
          .select(col("doc_id"), col("source"),
            col("n_tokens").cast("long").as("n_tokens"), col("stage"))
          // persist the narrow ledger read before the global sort: the
          // range sampler otherwise re-reads the state table (r14 recipe)
          .transform(graft.core.Caching.persistOnce)
          .orderBy("doc_id")
      }),

    // ── STREAMING image dedup (llmops/PhashDedup): the arrival-time
    //    perceptual-hash screen — the image twin of st_curate_stream's
    //    near tier, on the same band-store contract (pruned probe,
    //    append-only folds, growth-free replay; PhashDedupSpec drills
    //    the crash windows). Three deterministic micro-batches
    //    (doc_id % 3) run the REAL processBatch against a persistent
    //    band store; the gate reads the maintained verdict ledger. The
    //    oracle unrolls the batches: per round, aHash band candidates
    //    against prior rounds' NOVEL docs (64-smallest-per-cell cap)
    //    plus the batch self-screen (lower id wins), exact 64-bit
    //    hamming verify ≤ 10, closest-twin tiebreak (hamming, id) — so
    //    the row proves arrival-order firsts and store growth, not a
    //    batch recompute.
    sql("st_mm_phash_stream",
      s"""WITH m2 AS (
        |  SELECT doc_id, text, length(text) AS len, doc_id % 3 AS b
        |  FROM documents
        |), sb2 AS (
        |  SELECT doc_id, b,
        |         [ascii(substring(text, CAST((len * i) // 64 AS INT) + 1, 1))
        |          for i in range(0, 64)] AS s
        |  FROM m2 WHERE len >= 64
        |), mh AS (
        |  SELECT doc_id, b, s, list_sum(s) // 64 AS mean FROM sb2
        |), ph2 AS (
        |  SELECT doc_id, b,
        |         list_sum([CASE WHEN s[i + 1]  > mean THEN 1 << i ELSE 0 END
        |                   for i in range(0, 16)]) AS b0,
        |         list_sum([CASE WHEN s[i + 17] > mean THEN 1 << i ELSE 0 END
        |                   for i in range(0, 16)]) AS b1,
        |         list_sum([CASE WHEN s[i + 33] > mean THEN 1 << i ELSE 0 END
        |                   for i in range(0, 16)]) AS b2,
        |         list_sum([CASE WHEN s[i + 49] > mean THEN 1 << i ELSE 0 END
        |                   for i in range(0, 16)]) AS b3
        |  FROM mh
        |), pbands AS (
        |  SELECT doc_id, b, 0 AS j, b0 AS band FROM ph2 UNION ALL
        |  SELECT doc_id, b, 1, b1 FROM ph2 UNION ALL
        |  SELECT doc_id, b, 2, b2 FROM ph2 UNION ALL
        |  SELECT doc_id, b, 3, b3 FROM ph2
        |), ${phashBatchSql(0)}, ${phashBatchSql(1)}, ${phashBatchSql(2)},
        |vd AS (
        |  SELECT * FROM vd0 UNION ALL SELECT * FROM vd1
        |  UNION ALL SELECT * FROM vd2
        |)
        |SELECT m2.doc_id, vd.doc_id IS NOT NULL AS is_dup,
        |       vd.dup_of, vd.hamming
        |FROM m2 LEFT JOIN vd USING (doc_id)
        |ORDER BY m2.doc_id""")(
      (s, d) => {
        val root = TxSideTables.phashRun(s, d)
        s.read.parquet(s"$root/verdicts")
          .select(col("doc_id"), col("is_dup"), col("dup_of"),
            col("hamming"))
          // persist the narrow ledger read before the global sort: the
          // range sampler otherwise re-reads the state table (r14 recipe)
          .transform(graft.core.Caching.persistOnce)
          .orderBy("doc_id")
      }),

    // ── STREAMING embedding dedup (llmops/EmbedDedup): arrival-time
    //    near-dup screening for VECTORS — the third band-store member
    //    (text MinHash, image aHash, now embeddings), candidates from
    //    the SAME integer-hyperplane LSH tables as the batch operator
    //    (llm_dedup_embed_lsh) so the oracle reproduces bucket
    //    assignment exactly, verify = exact cosine >= 0.45. Three
    //    deterministic micro-batches (vec_id % 3) run the REAL
    //    processBatch against a persistent band store; the oracle
    //    unrolls the rounds (prior novel vecs per cell capped at the
    //    SkewGuard bound, batch self-screen with lower-id-wins,
    //    most-similar-twin tiebreak by (sim DESC, id)). The row proves
    //    arrival-order firsts and growth-free folds, not a recompute.
    sql("st_embed_dedup_stream",
      s"""WITH ev AS (
        |  SELECT vec_id, vec_id % 3 AS b, embedding::DOUBLE[] AS e
        |  FROM embeddings
        |), eproj AS (
        |  SELECT vec_id, i // 6 AS t,
        |         SUM(CASE WHEN list_dot_product(e,
        |               [CAST((i*131 + d) * 2654435761 % 1000003 AS DOUBLE)
        |                  / 1000003.0 - 0.5 for d in range(0, 64)]) >= 0
        |             THEN CAST(1 AS BIGINT) << (i % 6) ELSE 0 END) AS bucket
        |  FROM ev CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS i)
        |  GROUP BY 1, 2
        |), ebands AS (
        |  SELECT p.vec_id, v.b, p.t, p.bucket FROM eproj p
        |  JOIN ev v USING (vec_id)
        |), ${embedBatchSql(0)}, ${embedBatchSql(1)}, ${embedBatchSql(2)},
        |evd AS (
        |  SELECT * FROM evd0 UNION ALL SELECT * FROM evd1
        |  UNION ALL SELECT * FROM evd2
        |)
        |SELECT ev.vec_id, evd.vec_id IS NOT NULL AS is_dup,
        |       evd.dup_of, evd.sim
        |FROM ev LEFT JOIN evd USING (vec_id)
        |ORDER BY ev.vec_id""")(
      (s, d) => {
        val root = TxSideTables.embedRun(s, d)
        s.read.parquet(s"$root/verdicts")
          .select(col("vec_id"), col("is_dup"), col("dup_of"), col("sim"))
          // persist the narrow ledger read before the global sort: the
          // range sampler otherwise re-reads the state table (r14 recipe)
          .transform(graft.core.Caching.persistOnce)
          .orderBy("vec_id")
      })
  )

  /** One unrolled batch of the `st_embed_dedup_stream` oracle: batch
    * `k`'s LSH-cell candidates against prior rounds' novel vectors
    * (`es$k`) and the batch self-screen (`eb$k`), cells capped at the
    * SkewGuard bound, exact-cosine verify >= 0.45, most-similar-twin
    * verdict — and the novel set (`en$k`) the band store grows by. */
  private def embedBatchSql(k: Int): String = {
    val cap = graft.llmops.SkewGuard.MaxCellSize
    val store =
      if (k == 0) ""
      else {
        val union = (0 until k).map(i => s"SELECT vec_id FROM en$i")
          .mkString(" UNION ALL ")
        s"""es$k AS (
           |  SELECT vec_id AS c_id, t, bucket FROM ebands
           |  WHERE vec_id IN ($union)
           |  QUALIFY row_number() OVER (PARTITION BY t, bucket
           |                             ORDER BY vec_id) <= $cap
           |), """.stripMargin
      }
    val storePairs =
      if (k == 0) ""
      else s"""
           |    UNION
           |    SELECT x.vec_id, c.c_id
           |    FROM ebands x JOIN es$k c USING (t, bucket)
           |    WHERE x.b = $k""".stripMargin
    s"""${store}eb$k AS (
       |  SELECT vec_id AS c_id, t, bucket FROM ebands WHERE b = $k
       |  QUALIFY row_number() OVER (PARTITION BY t, bucket
       |                             ORDER BY vec_id) <= $cap
       |), ep$k AS (
       |  SELECT DISTINCT b_id, c_id FROM (
       |    SELECT x.vec_id AS b_id, c.c_id
       |    FROM ebands x JOIN eb$k c USING (t, bucket)
       |    WHERE x.b = $k AND x.vec_id > c.c_id$storePairs)
       |), evd$k AS (
       |  SELECT vec_id, dup_of, sim FROM (
       |    SELECT hh.b_id AS vec_id, hh.c_id AS dup_of, hh.sim,
       |           row_number() OVER (PARTITION BY hh.b_id
       |                              ORDER BY hh.sim DESC, hh.c_id) AS rn
       |    FROM (
       |      SELECT p.b_id, p.c_id,
       |             list_dot_product(va.e, vb.e) /
       |               (sqrt(list_dot_product(va.e, va.e)) *
       |                sqrt(list_dot_product(vb.e, vb.e))) AS sim
       |      FROM ep$k p
       |      JOIN ev va ON va.vec_id = p.b_id
       |      JOIN ev vb ON vb.vec_id = p.c_id) hh
       |    WHERE hh.sim >= 0.45
       |  ) WHERE rn = 1
       |), en$k AS (
       |  SELECT vec_id FROM ev WHERE b = $k
       |    AND vec_id NOT IN (SELECT vec_id FROM evd$k)
       |)""".stripMargin
  }

  /** One unrolled batch of the `st_mm_phash_stream` oracle: batch
    * `k`'s candidates against prior batches' NOVEL docs (`ps$k`) and
    * the batch self-screen (`pb$k`), both 64-smallest-per-cell capped,
    * exact 64-bit hamming verify (4 × 16-bit band xors) ≤ 10,
    * closest-twin verdict via (hamming, c_id) rank — and the novel set
    * (`nv$k`) the streaming band store grows by. */
  private def phashBatchSql(k: Int): String = {
    val store =
      if (k == 0) ""
      else {
        val union = (0 until k).map(i => s"SELECT doc_id FROM nv$i")
          .mkString(" UNION ALL ")
        s"""ps$k AS (
           |  SELECT doc_id AS c_id, j, band FROM pbands
           |  WHERE doc_id IN ($union)
           |  QUALIFY row_number() OVER (PARTITION BY j, band
           |                             ORDER BY doc_id) <= 64
           |), """.stripMargin
      }
    val storePairs =
      if (k == 0) ""
      else s"""
           |    UNION
           |    SELECT x.doc_id, c.c_id
           |    FROM pbands x JOIN ps$k c USING (j, band)
           |    WHERE x.b = $k""".stripMargin
    s"""${store}pb$k AS (
       |  SELECT doc_id AS c_id, j, band FROM pbands WHERE b = $k
       |  QUALIFY row_number() OVER (PARTITION BY j, band
       |                             ORDER BY doc_id) <= 64
       |), pp$k AS (
       |  SELECT DISTINCT b_id, c_id FROM (
       |    SELECT x.doc_id AS b_id, c.c_id
       |    FROM pbands x JOIN pb$k c USING (j, band)
       |    WHERE x.b = $k AND x.doc_id > c.c_id$storePairs)
       |), vd$k AS (
       |  SELECT doc_id, dup_of, CAST(hamming AS BIGINT) AS hamming FROM (
       |    SELECT hh.b_id AS doc_id, hh.c_id AS dup_of, hh.hm AS hamming,
       |           row_number() OVER (PARTITION BY hh.b_id
       |                              ORDER BY hh.hm, hh.c_id) AS rn
       |    FROM (
       |      SELECT p.b_id, p.c_id,
       |             bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1)) +
       |             bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3)) AS hm
       |      FROM pp$k p
       |      JOIN ph2 ha ON ha.doc_id = p.b_id
       |      JOIN ph2 hb ON hb.doc_id = p.c_id) hh
       |    WHERE hh.hm <= 10
       |  ) WHERE rn = 1
       |), nv$k AS (
       |  SELECT doc_id FROM m2 WHERE b = $k AND len >= 64
       |    AND doc_id NOT IN (SELECT doc_id FROM vd$k)
       |)""".stripMargin
  }

  /** One unrolled batch of the `st_curate_stream` oracle: batch `k`'s
    * near-dup screen — candidates against prior batches' survivors
    * (`cs$k`) and the batch self-screen (`cb$k`), both under the
    * 64-smallest-per-cell cap, slot-verified at ≥ 32 of 64 with
    * lower-doc-id-wins on the self pairs — and its survivor set
    * (`sv$k`), which is exactly what the streaming signature store
    * grows by. */
  private def curateBatchSql(k: Int): String = {
    val store =
      if (k == 0) ""
      else {
        val union = (0 until k).map(i => s"SELECT doc_id FROM sv$i")
          .mkString(" UNION ALL ")
        s"""cs$k AS (
           |  SELECT doc_id AS c_id, band, bkey FROM bands
           |  WHERE doc_id IN ($union)
           |  QUALIFY row_number() OVER (PARTITION BY band, bkey
           |                             ORDER BY doc_id) <= 64
           |), """.stripMargin
      }
    val storePairs =
      if (k == 0) ""
      else s"""
           |    UNION
           |    SELECT x.doc_id, c.c_id, FALSE
           |    FROM bands x JOIN cs$k c USING (band, bkey)
           |    WHERE x.b = $k""".stripMargin
    s"""${store}cb$k AS (
       |  SELECT doc_id AS c_id, band, bkey FROM bands WHERE b = $k
       |  QUALIFY row_number() OVER (PARTITION BY band, bkey
       |                             ORDER BY doc_id) <= 64
       |), pr$k AS (
       |  SELECT DISTINCT * FROM (
       |    SELECT x.doc_id AS b_id, c.c_id, TRUE AS self
       |    FROM bands x JOIN cb$k c USING (band, bkey)
       |    WHERE x.b = $k$storePairs)
       |), nd$k AS (
       |  SELECT DISTINCT b_id AS doc_id FROM (
       |    SELECT p.b_id, p.c_id
       |    FROM pr$k p
       |    JOIN sig sa ON sa.doc_id = p.b_id
       |    JOIN sig sb ON sb.doc_id = p.c_id AND sb.j = sa.j
       |    WHERE (NOT p.self) OR p.b_id > p.c_id
       |    GROUP BY p.b_id, p.c_id
       |    HAVING SUM(CASE WHEN sa.h = sb.h THEN 1 ELSE 0 END) >= 32)
       |), sv$k AS (
       |  SELECT e.doc_id FROM ek e WHERE e.b = $k
       |    AND e.doc_id NOT IN (SELECT doc_id FROM nd$k)
       |)""".stripMargin
  }
}

/** Side TxLog tables built from the fixtures, once per (JVM, sf dir) —
  * the bk1 pattern for the table format. The build is a single MERGE
  * commit; readers then exercise the full log path (snapshot resolve,
  * partition pruning, footer-stats key skipping) under the value gate. */
private[registry] object TxSideTables {
  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def docs(s: SparkSession, d: String): String =
    built.computeIfAbsent(d, _ => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-txq").toString
      graft.sources.TxLog.merge(s, dir, docRows(s, d))
      dir
    })

  /** The incremental curation funnel driven over the fixture in three
    * deterministic micro-batches (doc_id % 3 = 0, 1, 2 — arrival order
    * matters: it defines who is "first" for both dedup tiers), once per
    * (process, sf dir). Replaying the run converges (CurationStreamSpec),
    * so repeated bench passes read identical decision state. Returns
    * the stream's root directory. */
  def curationRun(s: SparkSession, d: String): String =
    built.computeIfAbsent(s"cur:$d", _ => {
      val root = java.nio.file.Files
        .createTempDirectory("graft-curgate").toString
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      for (k <- 0 until 3)
        graft.streaming.CurationStream.processBatch(s, root,
          docs.filter(pmod(col("doc_id"), lit(3)) === k), k.toLong)
      root
    })

  /** The streaming phash-dedup run for `st_mm_phash_stream`: three
    * deterministic micro-batches (doc_id % 3) through the REAL
    * [[graft.llmops.PhashDedup.processBatch]] against a persistent
    * band store; verdicts append to `root/verdicts`. Once per
    * (JVM, sf dir) — replay-convergent, so repeated bench passes read
    * identical state. */
  def phashRun(s: SparkSession, d: String): String =
    built.computeIfAbsent(s"ph:$d", _ => {
      val root = java.nio.file.Files
        .createTempDirectory("graft-phgate").toString
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"))
      for (k <- 0 until 3)
        graft.llmops.PhashDedup.processBatch(s, s"$root/hashes",
          docs.filter(pmod(col("doc_id"), lit(3)) === k),
          // one verdict file per micro-batch, not one per upstream task
          // (guide §6: un-coalesced, 32 tasks × 3 batches = 96 tiny
          // files the gate re-lists and re-opens every read; a verdict
          // set is batch-bounded, so a single file per batch is the
          // right sink sizing — a production sink would size by bytes)
          flagged => flagged.repartition(1).write.mode("append")
            .parquet(s"$root/verdicts"))
      root
    })

  /** The streaming embedding-dedup run for `st_embed_dedup_stream`
    * (same shape as [[phashRun]], over the embeddings table). */
  def embedRun(s: SparkSession, d: String): String =
    built.computeIfAbsent(s"em:$d", _ => {
      val root = java.nio.file.Files
        .createTempDirectory("graft-emgate").toString
      val vecs = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"))
      for (k <- 0 until 3)
        graft.llmops.EmbedDedup.processBatch(s, s"$root/vecs",
          vecs.filter(pmod(col("vec_id"), lit(3)) === k),
          // one verdict file per micro-batch (see phashRun's note)
          flagged => flagged.repartition(1).write.mode("append")
            .parquet(s"$root/verdicts"))
      root
    })

  private def docRows(s: SparkSession, d: String) =
    Tables.load(s, d, "documents")
      // TxLog KEY SHAPE CONTRACT: partition values must be non-null
      // (merge refuses them) — a source row without one has no
      // addressable key and stays out of the fixture table
      .filter(col("source").isNotNull)
      .select(
        concat(col("source"), lit("#"),
          lpad(col("doc_id").cast("string"), 8, "0")).as("_docId"),
        col("source").as("str_databaseid"),
        col("doc_id"), col("lang"), col("n_chars"))

  /** A SEPARATE table copy carrying one committed predicate update
    * (tx3_update_where) — its own dir so the read-only tx1/tx2 gates
    * keep seeing the pristine fixture; the update runs once per
    * (process, sf dir) inside the memo, so repeated bench passes read
    * the same committed state. */
  /** Source + MAINTAINED min/max rollup for iv1_minmax_rollup: three
    * committed mutations on a fresh source table, then the rollup
    * maintained version-by-version from the change feed (bound-breaking
    * deletes exercise the group-local rescan path). Built once per
    * (process, sf dir); returns the ROLLUP table path. */
  def minmaxRollup(s: SparkSession, d: String): String =
    built.computeIfAbsent(s"ivm:$d", _ => {
      val src = java.nio.file.Files
        .createTempDirectory("graft-ivm-src").toString
      val roll = java.nio.file.Files
        .createTempDirectory("graft-ivm-roll").toString + "/r"
      def rows(df: org.apache.spark.sql.DataFrame) = df
        // non-null partition per the TxLog KEY SHAPE CONTRACT
        .filter(col("lang").isNotNull)
        .select(
          concat(col("lang"), lit("#"),
            lpad(col("doc_id").cast("string"), 8, "0")).as("_docId"),
          col("lang").as("str_databaseid"),
          col("n_chars").cast("double").as("v"))
      val docs = Tables.load(s, d, "documents")
      // v0: bootstrap inserts
      graft.sources.TxLog.merge(s, src, rows(docs))
      // v1: an update batch that moves every 10th doc's value
      graft.sources.TxLog.merge(s, src,
        rows(docs.filter(col("doc_id") % 10 === 0)
          .withColumn("n_chars", col("n_chars") + 7)))
      // v2: a delete batch that removes per-group bounds
      graft.sources.TxLog.merge(s, src,
        rows(docs).limit(0),
        removedKeys = docs.filter(col("doc_id") % 13 === 0)
          .select(concat(col("lang"), lit("#"),
            lpad(col("doc_id").cast("string"), 8, "0")).as("_docId")))
      val head = graft.sources.TxLog.snapshot(s, src).version
      graft.streaming.IncrementalAgg.maintainRangeMinMax(
        s, src, roll, -1, head,
        dims = Seq("str_databaseid"), valueCol = "v")
      roll
    })

  def updatedDocs(s: SparkSession, d: String): String =
    built.computeIfAbsent(s"upd:$d", _ => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-txu").toString
      graft.sources.TxLog.merge(s, dir, docRows(s, d))
      graft.sources.TxLog.updateWhere(s, dir,
        col("str_databaseid") === "src3" && col("doc_id") % 7 === 0,
        Seq("lang" -> lit("xx"),
          "n_chars" -> (col("n_chars") + 1000000)))
      dir
    })
}
