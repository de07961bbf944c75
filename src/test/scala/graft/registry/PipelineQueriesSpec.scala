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
}
