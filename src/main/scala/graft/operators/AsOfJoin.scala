package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: each left row picks up the most recent
  * right-side row with the same key at-or-before the left row's time —
  * the temporal join every event-attribution / slowly-changing-dimension
  * query needs (the reference resolves "state as of an event" by
  * re-reading the item per event, e.g. the version lookups in
  * `backend/backend/handlers/assets/assetService.py`; as a set
  * operation this is one as-of join).
  *
  * ALGORITHM (union-merge, not a range join): tag both inputs, union
  * them, sort within each key partition by (time, side), and carry the
  * latest right payload forward with a running `last(ignoreNulls)`
  * window. ONE shuffle on the join key, linear work per partition —
  * the plan a streaming engine's temporal join compiles to. The naive
  * alternatives die at scale: an inequality join `l.t >= r.t` is a
  * per-pair range join (O(n·m) off the equi-key), and a
  * "max-per-group then re-join" pays three shuffles.
  *
  * SEMANTICS: at equal timestamps the right row sorts FIRST, so a left
  * row sees a right row with exactly its timestamp (at-or-BEFORE).
  * Ties among right rows at the same (key, time) resolve by
  * `rightTiebreak` — the largest wins, deterministically. Left rows
  * with no prior right row get nulls (left-outer).
  */
object AsOfJoin {

  /** @param rightPayload output-name → right-side column to carry
    * @param rightTiebreak breaks (key, time) ties on the right; the
    *        MAX tiebreak row wins */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: Column, rightTime: Column,
      rightPayload: Seq[(String, Column)],
      rightTiebreak: Column): DataFrame = {
    val rStruct = struct(rightPayload.map { case (n, c) => c.as(n) }: _*)
    val lStruct = struct(left.columns.map(col): _*)
    val r = right.select(
      keys.map(col) ++ Seq(rightTime.as("__t"), lit(1).as("__side"),
        rightTiebreak.as("__tb"), rStruct.as("__r")): _*)
    val rType = r.schema("__r").dataType
    val lFull = left.select(
      keys.map(col) ++ Seq(leftTime.as("__t"), lit(0).as("__side"),
        lit(null).cast(r.schema("__tb").dataType).as("__tb"),
        lit(null).cast(rType).as("__r"), lStruct.as("__l")): _*)
    val rFull = r.withColumn("__l", lit(null).cast(lFull.schema("__l").dataType))
    val merged = rFull.unionByName(lFull)
    // right before left at equal __t (>= semantics); among right rows at
    // the same instant the largest tiebreak is LAST, so last() picks it
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").desc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = merged
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
    val leftOut = left.columns.map(c => col("__l").getField(c).as(c))
    val rightOut = rightPayload.map { case (n, _) => col("__m").getField(n).as(n) }
    matched.select(leftOut ++ rightOut: _*)
  }

  /** [[asOf]] specialized for the SELF-join shape: both sides are
    * slices of ONE frame, tagged per row by `isRight` (left rows are
    * the rest). Semantically identical to
    * `asOf(events.filter(!isRight), events.filter(isRight), ...)` — but
    * planned as a single scan + tag instead of two scans unioned (the
    * generic form reads the source twice; an event-table as-of is the
    * common case and its input is usually the engine's biggest table).
    * The caller must pre-filter `events` to rows belonging to either
    * side. `leftCols` are the left-side output columns, evaluated on
    * left rows only.
    *
    * A NULL-valued `isRight` tag is normalized to FALSE (left side):
    * without the normalization a nullable tag (e.g. `event_type IS
    * NULL` surviving a caller's predicate) would fall through BOTH
    * `when` branches and emit a corrupt all-null output row — with it,
    * the row is deterministically a left row with its real values,
    * matching what `events.filter(!isRight)` + three-valued-logic would
    * EXCLUDE but corrupting nothing. Callers wanting exclusion filter
    * NULL tags out before calling, per the pre-filter contract. */
  def asOfTagged(events: DataFrame, isRight: Column, keys: Seq[String],
      leftTime: Column, rightTime: Column,
      leftCols: Seq[(String, Column)],
      rightPayload: Seq[(String, Column)],
      rightTiebreak: Column): DataFrame = {
    val tag = coalesce(isRight, lit(false))
    val rStruct = struct(rightPayload.map { case (n, c) => c.as(n) }: _*)
    val lStruct = struct(leftCols.map { case (n, c) => c.as(n) }: _*)
    val merged = events.select(
      keys.map(col) ++ Seq(
        when(tag, rightTime).otherwise(leftTime).as("__t"),
        when(tag, lit(1)).otherwise(lit(0)).as("__side"),
        when(tag, rightTiebreak).as("__tb"),
        when(tag, rStruct).as("__r"),
        when(!tag, lStruct).as("__l")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").desc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = merged
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
    val leftOut = leftCols.map { case (n, _) => col("__l").getField(n).as(n) }
    val rightOut = rightPayload.map { case (n, _) =>
      col("__m").getField(n).as(n) }
    matched.select(leftOut ++ rightOut: _*)
  }

  /** The ASYMMETRIC as-of: fold each key's right rows into ONE sorted
    * `(time, tiebreak, payload…)` array and probe it per left row with
    * `filter` + a null-safe `get`. Picks the same row as [[asOf]]
    * (at-or-before; max tiebreak on time ties; null when no match) —
    * spec-pinned equivalent — but the LEFT side is never sorted on
    * (key, time) at all: one small aggregate on the right, one hash
    * join, one per-row binary-search-sized array scan. Use when the
    * right side is dimension-like (bounded rows per key — signups,
    * dimension versions, config changes): the array row stays KB-sized
    * however big the corpus grows, and the fact stream's only cost is
    * the join exchange. For unbounded-both-sides inputs keep [[asOf]]/
    * [[asOfTagged]] — a key with millions of right rows would buffer
    * them all in one array row here, where the union-merge streams.
    *
    * `rightTiebreak` must be unique per (key, time) on the right (the
    * usual as-of contract) — the array sorts lexicographically on
    * (time, tiebreak, payload…), so a duplicate (time, tiebreak) pair
    * would let payload values decide the order. */
  def asOfArrayProbe(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: Column, rightTime: Column,
      rightPayload: Seq[(String, Column)],
      rightTiebreak: Column): DataFrame = {
    require(!left.columns.contains("__asof_arr"),
      "left side may not have a column named __asof_arr")
    val entry = struct((rightTime.as("__t") +: rightTiebreak.as("__tb") +:
      rightPayload.map { case (n, c) => c.as(n) }): _*)
    val arrays = right.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(entry)).as("__asof_arr"))
    // shuffle_hash: the array table is key-cardinality-sized — usually
    // far smaller than the fact side but NOT broadcast-safe in general
    // (it grows with the key space); the hash join keeps memory bounded
    // and skips the sort the default merge join would pay
    val hits = filter(col("__asof_arr"), e => e("__t") <= leftTime)
    val m = get(hits, size(hits) - 1)
    left.join(arrays.hint("shuffle_hash"), keys, "left")
      .select(left.columns.map(col) ++
        rightPayload.map { case (n, _) => m(n).as(n) }: _*)
  }
}
