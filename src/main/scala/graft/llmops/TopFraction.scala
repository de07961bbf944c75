package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact top-fraction selection WITHOUT a corpus-wide single-task sort.
  *
  * `rank() OVER (ORDER BY score DESC)` — the obvious way to keep the
  * top 25% of a corpus — serializes the whole corpus through one
  * reducer: Spark plans an unpartitioned Window as a single-partition
  * sort. At 100 TB that one task IS the job. This helper computes the
  * same boolean exactly, in three corpus-parallel steps:
  *
  *  1. bucket every row by the high bits of the ORDER-PRESERVING long
  *     image of its double score ([[graft.functions.GraftFunctions
  *     .sortableDoubleBits]]) — a narrow map, no shuffle;
  *  2. histogram the buckets (one map-side-combined aggregation; the
  *     result is histogram-sized, ≤2^(64-shift) rows, in practice a few
  *     thousand) and take a cumulative count ordered bucket-descending —
  *     the only ordered scan runs over the HISTOGRAM, not the corpus —
  *     to find the boundary bucket b* where the cumulative count crosses
  *     k = ceil(fraction·n): every row in a higher bucket is in the
  *     top-k, every row in a lower bucket is out;
  *  3. broadcast the one-row-per-group boundary back onto the corpus
  *     and rank ONLY within buckets (window PARTITIONED by the
  *     fine-grained bucket) to break the boundary bucket by
  *     (score DESC, tie ASC) — bit-identical to what the global rank
  *     would have decided, because equal doubles share a bucket and
  *     unequal doubles never compare across the b* boundary.
  *
  * Degenerate worst case: a corpus where every row has the SAME score
  * collapses to one bucket and the tie-break rank is inherently a
  * global order-by-tie — no algorithm can do better while preserving
  * exact rank semantics. Real score distributions spread across many
  * buckets (2^-12 relative width at the default shift).
  *
  * `groupCols` generalizes to per-group selection (e.g. top fraction
  * PER SOURCE): histograms, boundaries and windows are all keyed by the
  * group, so a low-cardinality group column never becomes a
  * corpus-fraction single task — the window partition key is
  * (group, bucket), not (group).
  */
object TopFraction {

  /** Adds boolean `outCol`: whether the row is among the top
    * `ceil(fraction·n)` of its group by (`scoreCol` DESC, `tieCol`
    * ASC). `scoreCol` must be non-null DOUBLE or BIGINT (normalize
    * -0.0 with `+ 0.0` upstream if reachable); `tieCol` must be unique
    * per group for rank determinism. BIGINT scores are bucketed via
    * their double image — only WEAKLY monotone past 2^53, which is
    * safe: equal scores always share a bucket, and the within-bucket
    * rank orders by the EXACT native score, so collapsed longs are
    * re-separated before any selection decision. Adds no other
    * columns; preserves the rest. */
  def mark(df: DataFrame, scoreCol: String, tieCol: String,
      fraction: Double, groupCols: Seq[String] = Nil,
      outCol: String = "selected", bucketShift: Int = 40,
      snapshot: Boolean = true): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction in (0,1], got $fraction")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val gcols: Seq[Column] = groupCols.map(col)

    // the selection is inherently two passes over the rows (histogram,
    // then mark). With `snapshot` the input materializes once
    // (localCheckpoint) so the second pass re-reads this narrow
    // (group, score, tie) table instead of RECOMPUTING the caller's
    // upstream — for llm_mix_classifier that upstream is the full
    // feature-scoring pass; unsnapshotted it ran twice and doubled the
    // query (measured 3.3 s vs 5.1 s at sf0.1). Pass snapshot = false
    // when the input is already cached/memoized or when the caller's
    // surrounding plan SHARES subtrees with this input — a checkpoint
    // would split those out of the main plan and defeat Spark's
    // exchange reuse (llm_curate_pipeline2: 0.8 s unsnapshotted vs
    // 2.5 s snapshotted, its stage-1/2 frames appear in both).
    val bucketed = df.withColumn("__bkt",
      shiftright(call_function("graft_sortable_double",
        col(scoreCol).cast("double")), bucketShift))
    val scored = if (snapshot) bucketed.localCheckpoint() else bucketed

    // Histogram (corpus-parallel, map-side combined), then the ordered
    // cumulative count over the HISTOGRAM frame. The unpartitioned
    // variant of this window is fine precisely because its child is the
    // aggregate — PlanShapeSpec pins that every unpartitioned Window in
    // these plans sits above an Aggregate.
    val hist = scored.groupBy((gcols :+ col("__bkt")): _*)
      .agg(count(lit(1)).as("__c"))
    val wDesc = (if (gcols.isEmpty) Window.partitionBy()
                 else Window.partitionBy(gcols: _*))
      .orderBy(col("__bkt").desc)
    val wAll = wDesc.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val cum = hist
      .withColumn("__c_above", coalesce(sum(col("__c")).over(
        wDesc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__k",
        ceil(lit(fraction) * sum(col("__c")).over(wAll)).cast("long"))
    val edge = cum
      .filter(col("__c_above") < col("__k") &&
        col("__c_above") + col("__c") >= col("__k"))
      .select((gcols ++ Seq(col("__bkt").as("__bstar"),
        col("__c_above").as("__above"), col("__k"))): _*)

    // One broadcast join (edge is one row per group); then the tie
    // rank runs over ONLY the boundary bucket's rows — the non-tie
    // majority never shuffles for a window at all (the earlier form
    // windowed the whole frame by (group, bucket); correct, but that
    // full-frame exchange was most of the operator's cost). The tie
    // winners broadcast back as a flag join: ≤ boundary-bucket-sized,
    // i.e. one 2^-12-relative score slice — except the degenerate
    // all-equal-scores corpus, where the tie bucket IS the corpus and
    // exact rank semantics are inherently a global order (same caveat
    // as the class doc; no algorithm does better).
    // NULL-SAFE stitch (<=>): a plain equi-join would drop rows whose
    // group value is NULL, diverging from the PARTITION BY window this
    // operator replaces (a window treats NULL as a normal partition)
    val edgeR = groupCols.foldLeft(edge) { (d, c) =>
      d.withColumnRenamed(c, s"__e_$c") }
    val joined =
      if (groupCols.isEmpty) scored.crossJoin(broadcast(edge))
      else scored.join(broadcast(edgeR),
          groupCols.map(c => col(c) <=> col(s"__e_$c")).reduce(_ && _))
        .drop(groupCols.map(c => s"__e_$c"): _*)
    val wTie = Window.partitionBy((gcols :+ col("__bkt")): _*)
      .orderBy(col(scoreCol).desc, col(tieCol))
    // winner-side columns are RENAMED (__tw_*) — tieWinners derives
    // from `joined`, so this is a self-join and unqualified names
    // would be ambiguous
    val tieWinners = joined
      .filter(col("__bkt") === col("__bstar"))
      .withColumn("__r", rank().over(wTie))
      .filter(col("__r") <= col("__k") - col("__above"))
      .select((groupCols.map(c => col(c).as(s"__tw_$c")) ++
        Seq(col(tieCol).as("__tie_key"), lit(true).as("__tiesel"))): _*)
    val tieCond = (groupCols.map(c => col(c) <=> col(s"__tw_$c")) :+
      (col(tieCol) === col("__tie_key"))).reduce(_ && _)
    joined
      .join(broadcast(tieWinners), tieCond, "left")
      .withColumn(outCol, col("__bkt") > col("__bstar") ||
        coalesce(col("__tiesel"), lit(false)))
      .drop((Seq("__tie_key", "__tiesel", "__bkt", "__bstar", "__above",
        "__k") ++ groupCols.map(c => s"__tw_$c")): _*)
  }
}
