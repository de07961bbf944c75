package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Event-stream transforms. Each works identically on a batch DataFrame
  * (how the DuckDB oracle checks them) and on a streaming DataFrame
  * (`readStream`), except where noted.
  *
  * Reference streaming semantics: SURVEY §2.8 — the indexer pipeline is
  * at-least-once with idempotent upserts keyed on deterministic doc ids
  * (assetIndexer.py:534-596); late data is handled by re-reading current
  * truth (last-writer-wins). Watermarked windows are our addition for the
  * `events` table.
  */
object EventOps {

  /** Tumbling-window aggregate; in streaming prepend
    * `.withWatermark(ts, ...)`. Window starts align to the epoch, same as
    * `date_trunc` in the oracle. */
  def tumbling(df: DataFrame, ts: Column, duration: String, keys: Column*): DataFrame =
    df.groupBy(window(ts, duration) +: keys: _*)

      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))

  /** Sliding-window aggregate (each event lands in duration/slide windows). */
  def sliding(df: DataFrame, ts: Column, duration: String, slide: String,
      keys: Column*): DataFrame =
    df.groupBy(window(ts, duration, slide) +: keys: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))

  /** Gap-based sessionization (batch form): a new session starts when the
    * gap to the previous event of the same key exceeds `gapMicros`. The
    * streaming twin is `session_window(ts, gap)` / flatMapGroupsWithState;
    * this lag+cumsum form is what the SQL oracle can mirror exactly. */
  def sessionize(df: DataFrame, key: Column, ts: Column, gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(unix_micros(ts).asc, col("event_id").asc)
    val newSession = when(
      unix_micros(ts) - lag(unix_micros(ts), 1).over(w) > gapMicros, 1)
      .otherwise(when(lag(unix_micros(ts), 1).over(w).isNull, 1).otherwise(0))
    df.withColumn("session_seq",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Stateful sessionization — the `flatMapGroupsWithState` twin of
    * [[sessionize]]: a per-key state machine `(current seq, last ts)`
    * assigns each event its session number. Runs identically over a
    * batch `Dataset` (how the spec proves it equals the window-function
    * form, which the DuckDB oracle checks) and over `readStream`
    * micro-batches, where the state persists in the state store between
    * batches. Events are ordered (ts, event_id) inside each group/batch;
    * cross-batch order follows arrival, matching the reference's
    * last-writer-wins stance on late data (SURVEY ST5) — add a
    * watermark+timeout to finalize sessions in production streams.
    *
    * At 100 TB: state is 16 bytes per active key, partitioned by the
    * group key — the canonical KeyValueGroupedDataset scale shape. */
  final case class SessionEvent(
      user_id: Long, event_id: Long, tsMicros: Long)
  final case class SessionAssigned(
      user_id: Long, event_id: Long, tsMicros: Long, session_seq: Long)

  def sessionizeStateful(ds: Dataset[SessionEvent], gapMicros: Long)
      : Dataset[SessionAssigned] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long), SessionAssigned](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, events, state) =>
          var (seq, last) = state.getOption.getOrElse((0L, Long.MinValue))
          val out = events.toSeq.sortBy(e => (e.tsMicros, e.event_id)).map { e =>
            if (last == Long.MinValue || e.tsMicros - last > gapMicros) seq += 1
            last = e.tsMicros
            SessionAssigned(uid, e.event_id, e.tsMicros, seq)
          }
          state.update((seq, last))
          out.iterator
      }
  }

  /** Stateful per-user event-transition chaining — the streaming twin
    * of `ev6_transition_matrix`'s lead() window: each user's state is
    * their LAST event `(tsMicros, event_id, event_type)`, and every
    * arriving event emits one `(from, to)` transition against it.
    * Within a group/micro-batch events are ordered (ts, event_id);
    * cross-batch order follows arrival (feed batches in event-time
    * order, or add a watermark+timeout for production late data —
    * same stance as [[sessionizeStateful]]). Cumulative emitted
    * transitions over any in-order replay equal the batch lead() pairs
    * (StreamingSpec asserts equality, single replay and chunked).
    *
    * At 100 TB: state is one small triple per active user, partitioned
    * by the group key; the downstream matrix is a map-side-combined
    * count over the emitted pairs. */
  final case class TypedEvent(
      user_id: Long, event_id: Long, tsMicros: Long, event_type: String)
  final case class Transition(
      user_id: Long, from_type: String, to_type: String, to_event_id: Long)

  def transitionsStateful(ds: Dataset[TypedEvent]): Dataset[Transition] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, String), Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, events, state) =>
          var last = state.getOption.orNull
          val out = Seq.newBuilder[Transition]
          events.toSeq.sortBy(e => (e.tsMicros, e.event_id)).foreach { e =>
            if (last != null)
              out += Transition(uid, last._3, e.event_type, e.event_id)
            last = (e.tsMicros, e.event_id, e.event_type)
          }
          state.update(last)
          out.result().iterator
      }
  }

  /** Session aggregates via Spark's built-in `session_window` — the
    * third (and most idiomatic) sessionization form beside the
    * window-function twin ([[sessionize]], what the SQL oracle mirrors)
    * and the explicit state machine ([[sessionizeStateful]]). In
    * streaming, prepend `.withWatermark(ts, ...)`; state then expires
    * as sessions close — the canonical unbounded-stream shape. Boundary
    * nuance: an event at EXACTLY gap distance starts a new
    * `session_window` (windows are half-open `[start, last+gap)`) but
    * stays in the same [[sessionize]] session (`> gap` test) —
    * identical everywhere except exact-gap ties, which microsecond
    * event time makes measure-zero (spec asserts equality on the events
    * table). */
  def sessionAgg(df: DataFrame, key: Column, ts: Column, gap: String): DataFrame =
    df.groupBy(session_window(ts, gap).as("sw"), key)
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))

  // ── Watermarked streaming entry points (ST5) ─────────────────────────
  //
  // The late-row POLICY is part of the operator surface, not a spec-only
  // convention: in Append mode a window emits exactly once, when the
  // event-time watermark (max event time seen − `delay`) passes its end,
  // and a row older than the watermark is DROPPED — it can never re-open
  // an emitted window. This is the bounded-state dual of the reference's
  // last-writer-wins re-read (SURVEY ST5): the indexer can always re-read
  // current truth because its state IS the table; a windowed stream's
  // state would grow forever without an expiry line, and the watermark is
  // that line. Choose `delay` = the delivery tail you must absorb; rows
  // later than that are late by CONTRACT, observable (and tested) via the
  // dropped-row behavior below.

  /** [[tumbling]] over a streaming frame with a `delay` watermark. */
  def tumblingStream(stream: DataFrame, tsCol: String, delay: String,
      duration: String, keys: Column*): DataFrame =
    tumbling(stream.withWatermark(tsCol, delay), col(tsCol), duration, keys: _*)

  /** [[sliding]] over a streaming frame with a `delay` watermark. */
  def slidingStream(stream: DataFrame, tsCol: String, delay: String,
      duration: String, slide: String, keys: Column*): DataFrame =
    sliding(stream.withWatermark(tsCol, delay), col(tsCol), duration, slide,
      keys: _*)

  /** [[sessionAgg]] over a streaming frame with a `delay` watermark:
    * sessions merge while open, emit once the watermark passes
    * `last event + gap`, and their state expires — the canonical
    * unbounded-stream sessionization. Late rows drop rather than
    * re-opening a closed session. */
  def sessionAggStream(stream: DataFrame, tsCol: String, delay: String,
      key: Column, gap: String): DataFrame =
    sessionAgg(stream.withWatermark(tsCol, delay), key, col(tsCol), gap)

  /** ST3 — idempotent last-writer-wins upsert compaction: latest record
    * per key (the batch equivalent of the `MERGE` the streaming
    * foreachBatch applies; deterministic tiebreak). */
  /** Interval ATTRIBUTION join: every `src` event paired with each
    * `conv` event of the same user whose timestamp lies in
    * (conv.ts − horizon, conv.ts]. The same expression is Spark's
    * STREAM-STREAM inner join when both inputs are watermarked
    * streams — the time-range condition lets the engine bound each
    * side's join state to watermark + horizon instead of keeping
    * everything (the canonical click→purchase attribution shape); on
    * batch frames it is the identical plain join, which is how the
    * DuckDB oracle checks it. Inputs need (event_id, ts, user_id);
    * output carries both ids, the shared user, and the microsecond
    * lag. */
  def attributionJoin(src: DataFrame, conv: DataFrame,
      horizon: String): DataFrame = {
    val v = src.select(col("event_id").as("src_event_id"),
      col("ts").as("src_ts"), col("user_id").as("src_user"))
    val p = conv.select(col("event_id").as("conv_event_id"),
      col("ts").as("conv_ts"), col("user_id"))
    v.join(p,
      col("src_user") === col("user_id") &&
        col("src_ts") <= col("conv_ts") &&
        col("src_ts") > col("conv_ts") - expr(s"INTERVAL $horizon"))
      .select(col("conv_event_id"), col("src_event_id"), col("user_id"),
        col("src_ts"), col("conv_ts"),
        (unix_micros(col("conv_ts")) - unix_micros(col("src_ts")))
          .as("lag_us"))
  }

  def latestByKey(df: DataFrame, key: Column, ordering: Seq[Column]): DataFrame =
    df.withColumn("rn", row_number().over(
        Window.partitionBy(key).orderBy(ordering: _*)))
      .filter(col("rn") === 1).drop("rn")
}
