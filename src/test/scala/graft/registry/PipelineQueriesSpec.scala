package graft.registry

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants of the pipeline queries that the value-exact oracles can't
  * express: split proportions, packing window contiguity.
  */
class PipelineQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("split assignment lands ~90/5/5 overall and covers every stratum") {
    val df = graft.SparkEntry.queries("llm_split_assign")(spark, sf())
      .cache()
    val total = df.count().toDouble
    val bySplit = df.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val trainFrac = bySplit.getOrElse("train", 0L) / total
    assert(trainFrac > 0.85 && trainFrac < 0.95, s"train frac $trainFrac")
    assert(bySplit.getOrElse("val", 0L) > 0 && bySplit.getOrElse("test", 0L) > 0)
    // stratification: every language keeps a train majority (hash is
    // content-free, so proportions hold per stratum up to noise)
    val perLang = df.groupBy("lang").agg(
        (sum(when(col("split") === "train", 1).otherwise(0)) /
          count(lit(1))).as("frac"))
      .as[(String, Double)].collect()
    perLang.foreach { case (lang, frac) =>
      assert(frac > 0.7, s"lang $lang train frac $frac")
    }
    df.unpersist()
  }

  test("packing windows are contiguous per source and conserve tokens") {
    val df = graft.SparkEntry.queries("llm_pack_windows")(spark, sf()).cache()
    // each doc spans >= 1 window and starts no later than it ends
    assert(df.filter(col("n_windows") < 1 ||
      col("window_end") < col("window_start")).isEmpty)
    // consecutive docs within a source touch: next start window is the
    // same as (or adjacent to) the previous end window — no gaps
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("doc_id")
    val gaps = df.withColumn("prev_end", lag("window_end", 1).over(w))
      .filter(col("prev_end").isNotNull &&
        (col("window_start") > col("prev_end") + 1 ||
          col("window_start") < col("prev_end")))
    assert(gaps.isEmpty)
    df.unpersist()
  }

  test("epoch shuffle: dense per-shard positions, real reshuffling, no global sort") {
    val df = graft.SparkEntry.queries("llm_shuffle_epoch")(spark, sf()).cache()
    // every (epoch, shard) position sequence is dense 1..n
    val dense = df.groupBy("epoch", "shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("nd"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("nd") =!= col("n"))
    assert(dense.isEmpty, "positions must be dense 1..n per (epoch, shard)")
    // each epoch covers the whole corpus exactly once
    val perEpoch = df.groupBy("epoch").agg(countDistinct("doc_id").as("n"))
      .select("n").as[Long].collect().toSet
    assert(perEpoch.size == 1)
    // the two epochs genuinely reshuffle: most docs change (shard, pos)
    val moved = df.groupBy("doc_id")
      .agg(countDistinct(concat_ws(":", col("shard"), col("pos"))).as("k"))
      .filter(col("k") === 2).count()
    assert(moved.toDouble / perEpoch.head > 0.9, s"only $moved docs moved")
    df.unpersist()
    // scale shape: the window runs over a hash-partitioned exchange, not
    // a SinglePartition gather (the final presentation ORDER BY is the
    // only total order in the plan)
    val plan = graft.SparkEntry.queries("llm_shuffle_epoch")(spark, sf())
      .queryExecution.executedPlan.toString
    val windowAt = plan.indexOf("Window")
    assert(windowAt >= 0 &&
      !plan.substring(windowAt).contains("Exchange SinglePartition"),
      s"window must not gather to one partition:\n${plan.take(2000)}")
  }

  test("inference batches: bounded size, exact padding, no global sort") {
    val df = graft.SparkEntry.queries("llm_infer_batches")(spark, sf()).cache()
    assert(df.filter(col("n_docs") > 32 || col("n_docs") < 1).isEmpty)
    assert(df.filter(col("padding_waste") =!=
      col("n_docs") * col("max_tokens") - col("sum_tokens")).isEmpty)
    df.unpersist()
    val plan = graft.SparkEntry.queries("llm_infer_batches")(spark, sf())
      .queryExecution.executedPlan.toString
    val windowAt = plan.indexOf("Window")
    assert(windowAt >= 0 &&
      !plan.substring(windowAt).contains("Exchange SinglePartition"),
      s"batch assignment must not gather to one partition:\n${plan.take(2000)}")
  }

  test("ingest funnel output is consistent with its component operators") {
    val funnel = graft.SparkEntry.queries("llm_ingest_funnel")(spark, sf()).cache()
    val ids = funnel.select("doc_id").as[Long].collect().toSet
    // only batch docs (doc_id % 3 == 0) can appear
    assert(ids.forall(_ % 3 == 0))
    // no kept doc is an exact head-fingerprint dup of the corpus
    val bloomDups = graft.SparkEntry.queries("llm_dedup_bloom")(spark, sf())
      .filter(col("is_dup")).select("doc_id").as[Long].collect().toSet
    assert(ids.intersect(bloomDups).isEmpty)
    // no kept doc fails the quality gate (same arithmetic as llm_text_quality)
    val lowQ = graft.SparkEntry.queries("llm_text_quality")(spark, sf())
      .filter(col("quality") < 0.53).select("doc_id").as[Long].collect().toSet
    assert(ids.intersect(lowQ).isEmpty)
    // positions are dense 1..n within every shard
    val bad = funnel.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), countDistinct("pos").as("nd"))
      .filter(col("mx") =!= col("n") || col("nd") =!= col("n"))
    assert(bad.isEmpty)
    funnel.unpersist()
  }
}
