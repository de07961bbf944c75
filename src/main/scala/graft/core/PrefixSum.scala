package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT running totals — the two-level scan that replaces
  * `SUM(x) OVER (PARTITION BY group ORDER BY key)` when `group` is
  * low-cardinality: Spark plans that window as one task per group, so a
  * corpus-sized group serializes through a single reducer at 100×.
  *
  * Classic parallel prefix-sum, stitched: rows are RANGE-sharded on the
  * (numeric, unique) order key — `shard = key DIV width`, which keeps
  * shards contiguous in key order, the property hash-sharding destroys —
  * then
  *  1. each (group, shard) computes its LOCAL exclusive running total
  *     (window over a ≤width-key-range frame, corpus-parallel);
  *  2. shard totals aggregate to a rows/width-sized table whose
  *     per-group running total gives each shard its starting offset —
  *     the only ordered scan left, over the SHARD-TOTALS frame, not the
  *     corpus (10^10 docs at width 4096 → 2.4M tiny rows: one task,
  *     seconds; recurse the same trick if that ever dominates);
  *  3. offsets join back on (group, shard) and add to the local total.
  *
  * Shard balance follows the order key's density: `doc_id DIV 4096`
  * is ≤4096 rows per shard for any id distribution (ids are unique),
  * sparser ids just make more, smaller shards — never a hot shard.
  */
object PrefixSum {

  /** Broadcast-joins `small` back onto `big` on `keys`, NULL-SAFELY:
    * a plain equi-USING join drops rows whose group value is NULL,
    * silently diverging from the `PARTITION BY` window these helpers
    * replace (a window treats NULL as a normal partition value). The
    * small side's key columns are renamed away before the join so the
    * output keeps exactly `big`'s columns plus `small`'s payload. */
  private[core] def stitchJoin(big: DataFrame, small: DataFrame,
      keys: Seq[String]): DataFrame = {
    val renamed = keys.foldLeft(small) { (d, c) =>
      d.withColumnRenamed(c, s"__stitch_$c") }
    val cond = keys.map(c => col(c) <=> col(s"__stitch_$c"))
      .reduce(_ && _)
    big.join(broadcast(renamed), cond)
      .drop(keys.map(c => s"__stitch_$c"): _*)
  }

  /** Adds `outCol` = exclusive per-group running total of `valueCol`
    * in `orderCol` order (rows BEFORE this one; first row gets 0) —
    * exactly `SUM(valueCol) OVER (PARTITION BY groupCols ORDER BY
    * orderCol ROWS UNBOUNDED PRECEDING TO 1 PRECEDING)`, without the
    * per-group single-task sort. `orderCol` must be an integral column,
    * unique within its group. */
  def exclusive(df: DataFrame, valueCol: String, orderCol: String,
      groupCols: Seq[String] = Nil, outCol: String = "cum_before",
      shardWidth: Long = 4096L, snapshot: Boolean = true): DataFrame = {
    require(shardWidth > 0, s"shardWidth must be positive, got $shardWidth")
    val gcols: Seq[Column] = groupCols.map(col)
    // two passes over the rows (shard totals, then local scan) — with
    // `snapshot` the second pass re-reads a materialized narrow table
    // instead of recomputing the caller's upstream twice (see
    // TopFraction); pass false when the upstream is a cheap narrow
    // scan, where re-reading the source beats the checkpoint job
    val bucketed = df.withColumn("__shard",
      expr(s"$orderCol DIV $shardWidth"))
    val sharded = if (snapshot) bucketed.localCheckpoint() else bucketed

    val wLoc = Window.partitionBy((gcols :+ col("__shard")): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = sharded.withColumn("__loc",
      coalesce(sum(col(valueCol)).over(wLoc), lit(0L)))

    val totals = sharded.groupBy((gcols :+ col("__shard")): _*)
      .agg(sum(col(valueCol)).as("__t"))
    val wSh = (if (gcols.isEmpty) Window.partitionBy()
               else Window.partitionBy(gcols: _*))
      .orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", coalesce(sum(col("__t")).over(wSh), lit(0L)))
      .drop("__t")

    // offsets is shard-totals-sized (rows/width, plus group keys) —
    // broadcast keeps the stitch exchange-free on the corpus side; at
    // 10^10 rows and width 4096 that is ~2.4M small rows, tens of MB on
    // big executors, and a caller can widen shardWidth to shrink it
    stitchJoin(local, offsets, groupCols :+ "__shard")
      .withColumn(outCol, col("__off") + col("__loc"))
      .drop("__shard", "__loc", "__off")
  }

  /** Adds `outCol` = per-group ROW_NUMBER in `orderCols` order, via the
    * same two-level stitch: local row numbers within (group, shard)
    * cells plus the prefix count of earlier shards. Use when the window
    * partition key is low-cardinality (epoch/shard/bucket) so the naive
    * `row_number() OVER (PARTITION BY group ORDER BY …)` would be a
    * corpus-fraction single task.
    *
    * `shardCol` must be (a) WEAKLY MONOTONE w.r.t. the lexicographic
    * `orderCols` order within each group — range buckets of the leading
    * order column (`shiftright(h, b)`, `nt DIV w`) or a struct of such
    * prefixes qualify; hash buckets do NOT — and (b) orderable (the
    * shard stitch sorts by it). `orderCols` must be a total order
    * within each (group, shard) cell (include a unique tiebreaker) or
    * row numbers are nondeterministic, exactly as with the naive
    * window. */
  def rowNumber(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[Column], shardCol: Column,
      outCol: String = "rn", snapshot: Boolean = true): DataFrame = {
    val gcols: Seq[Column] = groupCols.map(col)
    val bucketed = df.withColumn("__shard", shardCol)
    val sharded = if (snapshot) bucketed.localCheckpoint() else bucketed

    val wLoc = Window.partitionBy((gcols :+ col("__shard")): _*)
      .orderBy(orderCols: _*)
    val local = sharded.withColumn("__rn",
      row_number().over(wLoc).cast("long"))

    val totals = sharded.groupBy((gcols :+ col("__shard")): _*)
      .agg(count(lit(1)).as("__t"))
    val wSh = (if (gcols.isEmpty) Window.partitionBy()
               else Window.partitionBy(gcols: _*))
      .orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", coalesce(sum(col("__t")).over(wSh), lit(0L)))
      .drop("__t")

    stitchJoin(local, offsets, groupCols :+ "__shard")
      .withColumn(outCol, col("__off") + col("__rn"))
      .drop("__shard", "__rn", "__off")
  }
}
