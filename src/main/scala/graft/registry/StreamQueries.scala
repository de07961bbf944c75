package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.EventOps

/** SURVEY §2.8 streaming semantics, batch-verified over the `events`
  * table (the streaming twins run the same EventOps code over readStream;
  * see streaming specs). All window starts are epoch-aligned so the
  * DuckDB `date_trunc`-based oracles match exactly.
  *
  * Every query here persists its (narrow) aggregate/window result
  * before the final global sort — the r14 persist-before-sort recipe:
  * the range sampler otherwise re-executes the scan + window/aggregate
  * tail a second time. Results stay range-sorted (they grow with the
  * corpus/time span; never a single-partition sort).
  */
object StreamQueries {
  import QueryDef.sql

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // ── ST5 addition: tumbling 1 h window per event_type.
    sql("st_window_tumbling",
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M') AS ws,
        |       event_type, count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""")(
      (s, d) => EventOps.tumbling(t(s, d, "events"), col("ts"), "1 hour",
          col("event_type"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("ws"),
          col("event_type"), col("n"), col("total"))
        .transform(graft.core.Caching.persistOnce)
        .orderBy("ws", "event_type")),

    // ── ST5 addition: sliding 1 h window, 30 min slide.
    sql("st_window_sliding",
      """WITH slotted AS (
        |  SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 1800000000) * 1800000000 AS slot_us,
        |         event_type, value FROM events
        |), expanded AS (
        |  SELECT make_timestamp(slot_us) AS ws_ts, event_type, value FROM slotted
        |  UNION ALL
        |  SELECT make_timestamp(slot_us - 1800000000), event_type, value
        |  FROM slotted
        |)
        |SELECT strftime(ws_ts, '%Y-%m-%d %H:%M') AS ws, event_type,
        |       count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM expanded GROUP BY 1, 2 ORDER BY ws, event_type""")(
      (s, d) => EventOps.sliding(t(s, d, "events"), col("ts"), "1 hour",
          "30 minutes", col("event_type"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("ws"),
          col("event_type"), col("n"), col("total"))
        .transform(graft.core.Caching.persistOnce)
        .orderBy("ws", "event_type")),

    // ── Sessionization, 30 min gap, per user.
    sql("st_sessionize",
      """WITH marked AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus, value,
        |         CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
        |                   > 1800000000 THEN 1
        |              WHEN lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL THEN 1
        |              ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
        |), sessions AS (
        |  SELECT user_id, value,
        |         SUM(new_session) OVER (PARTITION BY user_id
        |           ORDER BY tus, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS session_seq,
        |         tus
        |  FROM marked
        |)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |       count(*) AS n_events,
        |       CAST(min(tus) AS BIGINT) AS session_start_us,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM sessions GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""")(
      (s, d) => EventOps.sessionize(t(s, d, "events"), col("user_id"),
          col("ts"), gapMicros = 1800000000L)
        .groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"),
          min(unix_micros(col("ts"))).as("session_start_us"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
        .transform(graft.core.Caching.persistOnce)
        .orderBy("user_id", "session_seq")),

    // ── Sessionization via the built-in `session_window` — the most
    //    idiomatic Spark form (EventOps.sessionAgg; the streaming twin
    //    runs it with a watermark, StreamingSpec). Boundary semantics
    //    differ from st_sessionize at EXACT-gap ties only: windows are
    //    half-open [start, last+gap), so the oracle breaks on `>= gap`
    //    where the window-function form breaks on `> gap` (measure-zero
    //    at microsecond event time; both gates run on the same fixture).
    sql("st_session_agg",
      """WITH marked AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus, value,
        |         CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL THEN 1
        |              WHEN epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
        |                   >= 1800000000 THEN 1
        |              ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
        |), sessions AS (
        |  SELECT user_id, value, tus,
        |         SUM(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked
        |)
        |SELECT user_id,
        |       strftime(make_timestamp(CAST(min(tus) AS BIGINT)),
        |                '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |       strftime(make_timestamp(CAST(max(tus) + 1800000000 AS BIGINT)),
        |                '%Y-%m-%d %H:%M:%S.%f') AS session_end,
        |       count(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""")(
      (s, d) => EventOps.sessionAgg(t(s, d, "events"), col("user_id"),
          col("ts"), "30 minutes")
        .select(col("user_id"),
          date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("session_start"),
          date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("session_end"),
          col("n_events"), col("total"))
        .transform(graft.core.Caching.persistOnce)
        .orderBy("user_id", "session_start")),

    // ── ST3: last-writer-wins compaction (idempotent MERGE equivalent):
    //    latest event per user.
    sql("st_cdc_latest",
      """SELECT user_id, event_id, event_type,
        |       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts_str
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id
        |  ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) = 1
        |ORDER BY user_id""")(
      (s, d) => EventOps.latestByKey(t(s, d, "events"), col("user_id"),
          Seq(col("ts").desc, col("event_id").desc))
        .select(col("user_id"), col("event_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"))
        .transform(graft.core.Caching.persistOnce)
        .orderBy("user_id"))
  )
}
