package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TxLog

/** INCREMENTAL VIEW MAINTENANCE for additive aggregates over a
  * transaction-log table's change feed: a maintained count/sum rollup
  * (the A1 facet shape) is updated from each batch of row-level
  * changes instead of recomputed over the corpus.
  *
  * The delta algebra is the standard one for additive aggregates:
  * `insert` and `update_postimage` rows contribute +1 (and +value),
  * `delete` and `update_preimage` rows contribute −1 (and −value) —
  * an update thus moves its contribution between groups atomically.
  * Applying a batch touches ONLY the groups present in the batch:
  * one group-sized merge into the maintained table, never a corpus
  * scan. At 100 TB this is the difference between maintaining a facet
  * panel per commit and re-aggregating petabytes; correctness holds
  * for any additive aggregate (count, sum; avg via sum+count).
  *
  * The maintained rollup is itself a TxLog table (snapshot-isolated
  * readers, atomic per-batch commits), keyed on the group columns.
  * Groups whose count reaches zero are deleted, so the rollup never
  * accretes dead groups.
  */
object IncrementalAgg {

  /** Net per-group deltas of one change batch (`_change_type` +
    * `dims` + optional numeric `valueCol`): Δn and Δsum. */
  def deltas(changes: DataFrame, dims: Seq[String],
      valueCol: Option[String] = None): DataFrame = {
    val sign = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .when(col("_change_type").isin("delete", "update_preimage"), -1L)
      .otherwise(0L)
    val base = changes.withColumn("_sign", sign)
    val aggs = sum(col("_sign")).as("d_n") +:
      valueCol.map(v =>
        sum(col("_sign") * col(v).cast("double")).as("d_sum")).toSeq
    base.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Apply one change batch to the maintained rollup table at
    * `rollupPath` (a TxLog table keyed on the concatenated dims).
    * Reads ONLY the current rollup rows (group-cardinality, not
    * corpus), merges the deltas, upserts changed groups, and deletes
    * groups that reach zero — one atomic commit per batch. */
  def applyChanges(spark: SparkSession, rollupPath: String,
      changes: DataFrame, dims: Seq[String],
      valueCol: Option[String] = None,
      partitionDim: String = "facet_part"): Unit = {
    val d = deltas(changes, dims, valueCol)
    if (d.isEmpty) {
      // an all-empty FIRST batch must still create the rollup (the
      // TxLog empty-create semantics: a schema-carrying v0), so a
      // maintained-but-empty rollup reads with its columns instead of
      // as a 0-column frame; later empty batches stay free no-ops
      if (!TxLog.isTable(spark, rollupPath))
        TxLog.merge(spark, rollupPath,
          d.select(Seq(lit("").as("_docId"), lit("all").as(partitionDim)) ++
            dims.map(col) ++ Seq(lit(0L).as("n"),
              lit(0.0).as("total")): _*).limit(0),
          partitionCol = partitionDim)
      return
    }
    // key convention "partition#groupKey" (merge's remove path derives
    // the partition from the prefix before '#')
    val keyed = d.withColumn("_docId",
      concat(lit("all#"), concat_ws("|",
        dims.map(c => coalesce(col(c).cast("string"),
          lit("<null>"))): _*)))
    val current =
      if (TxLog.isTable(spark, rollupPath))
        TxLog.read(spark, rollupPath)
          .select(col("_docId"), col("n").as("cur_n"),
            col("total").as("cur_sum"))
      else {
        import spark.implicits._
        Seq.empty[(String, Long, Double)].toDF("_docId", "cur_n", "cur_sum")
      }
    // one partition: group cardinality is panel-sized; a wider rollup
    // would hash the dims here
    val outCols = Seq(col("_docId"), lit("all").as(partitionDim)) ++
      dims.map(col) ++ Seq(
        (coalesce(col("cur_n"), lit(0L)) + col("d_n")).as("n"),
        (coalesce(col("cur_sum"), lit(0.0)) +
          coalesce(col("d_sum"), lit(0.0))).as("total"))
    val merged = keyed.join(current, Seq("_docId"), "left")
      .select(outCols: _*)
    val upserts = merged.filter(col("n") > 0)
    val removes = merged.filter(col("n") <= 0).select("_docId")
    TxLog.merge(spark, rollupPath, upserts, removes,
      partitionCol = partitionDim)
  }

  /** IVM for MIN/MAX — the NON-additive aggregates, where a delete can
    * break the maintained bound. The standard refinement (self-
    * maintainability literature: min/max are self-maintainable under
    * inserts, not deletes): inserts fold into the bounds with
    * least/greatest; a batch whose deleted values TOUCH a group's
    * current bound (delMin ≤ cur_min or delMax ≥ cur_max) triggers a
    * GROUP-LOCAL rescan — the source read is filtered to exactly those
    * groups (broadcast semi-join; partition/footer pruning applies), so
    * the rescan cost is proportional to the touched groups' rows, never
    * the corpus. `sourceAtBatchEnd` must be the source AS OF the
    * batch's end version (same-batch inserts are visible, deleted rows
    * are not). Rollup rows: (dims, n, mn, mx); zero-count groups are
    * deleted like [[applyChanges]]. */
  def applyChangesMinMax(spark: SparkSession, rollupPath: String,
      sourceAtBatchEnd: DataFrame, changes: DataFrame, dims: Seq[String],
      valueCol: String, partitionDim: String = "facet_part"): Unit = {
    val v = col(valueCol).cast("double")
    val isIns = col("_change_type").isin("insert", "update_postimage")
    val isDel = col("_change_type").isin("delete", "update_preimage")
    val d = changes.groupBy(dims.map(col): _*).agg(
      (sum(when(isIns, 1L).otherwise(0L)) -
        sum(when(isDel, 1L).otherwise(0L))).as("d_n"),
      min(when(isIns, v)).as("ins_min"),
      max(when(isIns, v)).as("ins_max"),
      min(when(isDel, v)).as("del_min"),
      max(when(isDel, v)).as("del_max"))
    if (d.isEmpty) {
      // same empty-create contract as [[applyChanges]]
      if (!TxLog.isTable(spark, rollupPath))
        TxLog.merge(spark, rollupPath,
          d.select(Seq(lit("").as("_docId"), lit("all").as(partitionDim)) ++
            dims.map(col) ++ Seq(lit(0L).as("n"), lit(0.0).as("mn"),
              lit(0.0).as("mx")): _*).limit(0),
          partitionCol = partitionDim)
      return
    }
    val keyed = d.withColumn("_docId",
      concat(lit("all#"), concat_ws("|",
        dims.map(c => coalesce(col(c).cast("string"), lit("<null>"))): _*)))
    val current =
      if (TxLog.isTable(spark, rollupPath))
        TxLog.read(spark, rollupPath)
          .select(col("_docId"), col("n").as("cur_n"),
            col("mn").as("cur_mn"), col("mx").as("cur_mx"))
      else {
        import spark.implicits._
        Seq.empty[(String, Long, Double, Double)]
          .toDF("_docId", "cur_n", "cur_mn", "cur_mx")
      }
    val joined = keyed.join(current, Seq("_docId"), "left")
      .withColumn("new_n", coalesce(col("cur_n"), lit(0L)) + col("d_n"))
      .withColumn("rescan", coalesce(
        col("del_min") <= col("cur_mn") || col("del_max") >= col("cur_mx"),
        lit(false)))
      .localCheckpoint() // read twice below (rescan set + final merge)
    // group-local rescan: only bound-touching, still-populated groups
    // the source table carries its own _docId — alias the GROUP key so
    // the semi-join and the regroup are unambiguous
    val rescanGroups = joined
      .filter(col("rescan") && col("new_n") > 0)
      .select((col("_docId").as("__grp_id") +:
        dims.map(c => col(c).as(s"__grp_$c"))): _*)
    // NULL-SAFE (<=>) semi-join: the _docId key treats NULL dims as a
    // real group ("<null>"), so the rescan must match them too — a
    // plain equi-join would find no rows and write NULL mn/mx. The
    // un-dimensioned rollup (dims empty) has ONE global group: every
    // source row matches it (a reduce over zero conditions would throw)
    val rescanCond =
      if (dims.isEmpty) lit(true)
      else dims.map(c => col(c) <=> col(s"__grp_$c")).reduce(_ && _)
    val fresh = sourceAtBatchEnd
      .join(broadcast(rescanGroups), rescanCond)
      .groupBy("__grp_id").agg(min(v).as("r_mn"), max(v).as("r_mx"))
      .withColumnRenamed("__grp_id", "_docId")
    val merged = joined.join(fresh, Seq("_docId"), "left")
      .select((Seq(col("_docId"), lit("all").as(partitionDim)) ++
        dims.map(col) ++ Seq(
          col("new_n").as("n"),
          when(col("rescan"), col("r_mn"))
            .otherwise(least(col("cur_mn"), col("ins_min"))).as("mn"),
          when(col("rescan"), col("r_mx"))
            .otherwise(greatest(col("cur_mx"), col("ins_max"))).as("mx"))): _*)
    val upserts = merged.filter(col("n") > 0)
    val removes = merged.filter(col("n") <= 0).select("_docId")
    TxLog.merge(spark, rollupPath, upserts, removes,
      partitionCol = partitionDim)
  }

  /** [[maintainRange]] for the min/max rollup: replays committed
    * versions `(from, to]` batch-wise, each rescan reading the source
    * AS OF its own batch's version. Same exactly-once cursor contract. */
  def maintainRangeMinMax(spark: SparkSession, sourcePath: String,
      rollupPath: String, fromVersion: Long, toVersion: Long,
      dims: Seq[String], valueCol: String): Unit = {
    var from = fromVersion
    if (from < 0) {
      applyChangesMinMax(spark, rollupPath,
        TxLog.read(spark, sourcePath, asOfVersion = Some(0L)),
        TxLog.read(spark, sourcePath, asOfVersion = Some(0L))
          .withColumn("_change_type", lit("insert")),
        dims, valueCol)
      from = 0
    }
    (from + 1 to toVersion).foreach { ver =>
      applyChangesMinMax(spark, rollupPath,
        TxLog.read(spark, sourcePath, asOfVersion = Some(ver)),
        TxLog.changes(spark, sourcePath, ver - 1, ver), dims, valueCol)
    }
  }

  /** Replay the source table's committed versions `(from, to]` into the
    * rollup one batch per version — the catch-up/bootstrap path
    * (`fromVersion = -1` bootstraps from v0's snapshot as inserts, the
    * change-feed stream source's first-batch convention); the live path
    * feeds [[ChangeFeed.follow]] micro-batches into [[applyChanges]]
    * the same way. Deltas are ADDITIVE, not idempotent: a replayed
    * batch double-counts, so drive this from an exactly-once version
    * cursor (the follower's checkpointed spans), never an
    * at-least-once stream. */
  def maintainRange(spark: SparkSession, sourcePath: String,
      rollupPath: String, fromVersion: Long, toVersion: Long,
      dims: Seq[String], valueCol: Option[String] = None): Unit = {
    var from = fromVersion
    if (from < 0) {
      applyChanges(spark, rollupPath,
        TxLog.read(spark, sourcePath, asOfVersion = Some(0L))
          .withColumn("_change_type", lit("insert")),
        dims, valueCol)
      from = 0
    }
    (from + 1 to toVersion).foreach { v =>
      applyChanges(spark, rollupPath,
        TxLog.changes(spark, sourcePath, v - 1, v), dims, valueCol)
    }
  }
}
