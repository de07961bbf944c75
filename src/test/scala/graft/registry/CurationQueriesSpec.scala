package graft.registry

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llmops.TopK

/** Invariants and plan shapes of the curation operators that the
  * value-exact oracles can't express: bounded-top-k aggregate
  * equivalence with the window phrasing, zero-shuffle repetition pass,
  * mixing-rate realization, budget conservation.
  */
class CurationQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("TopK.smallestK equals sort-take on random pairs across partitions") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(5000)((rnd.nextLong(1000), rnd.nextLong(100000)))
      .map { case (g, k) => (s"g${g % 13}", k, rnd.nextLong(1 << 30)) }
    val df = pairs.toDF("grp", "key", "id").repartition(7)
    val got = df.groupBy("grp")
      .agg(TopK.smallestK(9)(col("key"), col("id")).as("p"))
      .select(col("grp"), col("p"))
      .as[(String, Array[Long])].collect().toMap
    val want = pairs.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(x => (x._2, x._3)).sorted.take(9)
        .flatMap(t => Seq(t._1, t._2)).toArray
    }
    assert(got.keySet == want.keySet)
    for (g <- want.keySet)
      assert(got(g).toSeq == want(g).toSeq, s"group $g")
  }

  test("TopK aggregate is streaming-incremental: stream heads equal batch") {
    import org.apache.spark.sql.streaming.Trigger
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("lang"), col("doc_id"))
      .withColumn("bucket", graft.llmops.Text.hash60(
        concat(lit("strat:"), col("doc_id").cast("string"))))
    val dir = java.nio.file.Files.createTempDirectory("graft-topk-stream").toString
    docs.repartition(5).write.mode("overwrite").parquet(dir)
    // one file per micro-batch: the aggregate's merge must hold across
    // state-store updates, not just within one batch
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = stream.groupBy("lang")
      .agg(TopK.smallestK(CurationQueries.StratumK)(
        col("bucket"), col("doc_id")).as("p"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("topk_stream_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(60000), "stream did not finish within 60s")
    val streamed = spark.table("topk_stream_out")
      .as[(String, Array[Long])].collect().toMap
    val batch = docs.groupBy("lang")
      .agg(TopK.smallestK(CurationQueries.StratumK)(
        col("bucket"), col("doc_id")).as("p"))
      .as[(String, Array[Long])].collect().toMap
    assert(streamed.keySet == batch.keySet && batch.nonEmpty)
    for (k <- batch.keySet)
      assert(streamed(k).toSeq == batch(k).toSeq, s"lang $k")
  }

  test("stratified sample equals the window phrasing and partial-aggregates") {
    val df = graft.SparkEntry.queries("llm_sample_stratified")(spark, sf())
    val viaWindow = {
      val h = graft.llmops.Text.hash60(
        concat(lit("strat:"), col("doc_id").cast("string")))
      spark.read.parquet(sf() + "/documents.parquet")
        .select(col("lang"), col("doc_id"), h.as("bucket"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("lang").orderBy("bucket", "doc_id")).cast("long"))
        .filter(col("rank") <= CurationQueries.StratumK)
        .select("lang", "rank", "doc_id", "bucket")
    }
    assert(df.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(df).isEmpty)
    // the aggregate must combine map-side: a partial ObjectHashAggregate
    // below the exchange, so shuffle volume is <= k pairs per partition
    // per stratum rather than the whole corpus
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert("partial_graft_topk|partial_smallestk".r
      .findFirstIn(plan.toLowerCase).isDefined, plan.take(2000))
  }

  test("repetition stats are a narrow pass: only the final sort exchanges") {
    val df = graft.SparkEntry.queries("llm_quality_repetition")(spark, sf())
    val exchanges = "Exchange".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
    assert(exchanges == 1, s"expected only the orderBy exchange, got $exchanges")
    // cache before the invariant filter: its conditions reference the
    // HOF-derived columns several times, and each uncached reference
    // re-inlines the fold via CollapseProject
    df.cache()
    val bad = df.filter(
      col("n_distinct") > col("n_bigrams") ||
        col("top_frac") <= 0 || col("top_frac") > 1 ||
        col("dup_frac") < 0 || col("dup_frac") > 1 ||
        (col("n_distinct") === col("n_bigrams") && col("dup_frac") =!= 0.0))
    assert(bad.isEmpty)
    df.unpersist()
  }

  test("mixing realizes the configured per-source rates") {
    val rates = Map("src0" -> 1.0, "src1" -> 0.75, "src2" -> 0.5,
      "src3" -> 0.25)
    val got = graft.SparkEntry.queries("llm_mix_weighted")(spark, sf("sf0.01"))
      .select("source", "realized_rate").as[(String, Double)].collect().toMap
    for ((src, want) <- rates; have <- got.get(src))
      assert(math.abs(have - want) < 0.12, s"$src realized $have want $want")
    // src0 keeps everything: the hash is always < 1.0 * P
    assert(got("src0") == 1.0)
  }

  test("token budget plan conserves shares and respects the epoch cap") {
    val rows = graft.SparkEntry.queries("llm_token_budget")(spark, sf())
      .select("share", "target_tokens", "epochs", "planned_tokens",
        "source_tokens")
      .as[(Double, Double, Double, Double, Long)].collect()
    assert(math.abs(rows.map(_._1).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_._2).sum - CurationQueries.TokenBudget) < 1e-6)
    rows.foreach { case (_, target, epochs, planned, srcToks) =>
      assert(epochs <= 4.0 + 1e-12)
      assert(planned <= target + 1e-6) // capped sources plan under target
      assert(math.abs(planned - math.min(4.0, target / srcToks) * srcToks) < 1e-6)
    }
  }

  test("curation funnel conserves documents and uses only known stages") {
    val df = graft.SparkEntry.queries("llm_curate_pipeline")(spark, sf("sf0.01"))
      .cache()
    val perSource = df.groupBy("source").agg(sum("n_docs").as("n"))
      .select("n").as[Long].collect()
    assert(perSource.length == 20 && perSource.forall(_ == 25L),
      s"every sf0.01 source holds 25 docs; got ${perSource.toSeq}")
    val stages = df.select("stage").distinct().as[String].collect().toSet
    assert(stages.subsetOf(Set("quality_fail", "exact_dup", "near_dup",
      "train", "val", "test")), stages.toString)
    // the funnel actually fires: some docs gated, most reach a split
    val byStage = df.groupBy("stage").agg(sum("n_docs").as("n"))
      .as[(String, Long)].collect().toMap
    assert(byStage.getOrElse("quality_fail", 0L) > 0)
    assert(byStage.getOrElse("train", 0L) > 300)
    df.unpersist()
  }

  test("approx token percentiles track the exact profile") {
    // the query is now self-checking (±1 rank of the target order
    // statistic, checked in-plan against the sorted group); the spec
    // asserts the embedded check holds for every source AND that the
    // exact counters agree with the exact profile
    val exactDocs = graft.SparkEntry.queries("llm_profile_tokens")(spark, sf("sf0.01"))
      .select("source", "n_docs")
      .as[(String, Long)].collect().toMap
    val rows = graft.SparkEntry.queries("llm_profile_tokens_approx")(
        spark, sf("sf0.01"))
      .select("source", "n_docs", "sketch_ok")
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty && rows.length == exactDocs.size)
    rows.foreach { case (src, nDocs, ok) =>
      assert(ok, s"$src: approx percentile left its ±1-rank window")
      assert(nDocs == exactDocs(src), s"$src n_docs")
    }
    // the sketch still tracks the continuous exact percentiles closely
    // (the ±1-rank gate above is the hard contract; this is the trend)
    val f = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val cmp = f.select(col("source"),
        graft.llmops.Text.nTokens(col("text")).as("nt"))
      .groupBy("source").agg(
        approx_percentile(col("nt"), lit(0.5), lit(10000)).as("a50"),
        percentile(col("nt"), lit(0.5)).as("e50"))
      .as[(String, Long, Double)].collect()
    cmp.foreach { case (src, a50, e50) =>
      assert(math.abs(a50 - e50) <= math.max(2.0, 0.15 * e50),
        s"$src p50 $a50 vs $e50")
    }
  }

  test("novelty profile is bounded and covers every shingled doc") {
    val df = graft.SparkEntry.queries("llm_profile_novelty")(spark, sf("sf0.01"))
      .cache()
    val bad = df.filter(
      col("n_shared") > col("n_grams") || col("n_shared") < 0 ||
        col("shared_frac") < 0 || col("shared_frac") > 1 ||
        col("max_df") < 1 ||
        // a doc with any shared gram must see that gram's df >= 2
        (col("n_shared") > 0 && col("max_df") < 2))
    assert(bad.isEmpty)
    // every doc with >= 3 tokens emits a profile row
    val nDocs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
      .filter(size(split(trim(lower(col("text"))), "\\s+")) >= 3).count()
    assert(df.count() == nDocs)
    df.unpersist()
  }

  test("containment pairs equal a brute-force evaluation of the contract") {
    val got = graft.SparkEntry.queries("llm_dedup_containment")(
        spark, sf("sf0.01"))
      .select("a_id", "b_id", "shared", "containment")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // brute force over all doc pairs (500 docs at sf0.01): qualify iff
    // the bottom-8 sketches intersect AND full-set containment >= 0.8 —
    // the exact two-part contract the distributed plan implements
    val sets = LlmQueries.docGramStats(spark, sf("sf0.01"))
      .select(col("doc_id"), col("gs"))
      .as[(Long, Array[Int])].collect().sortBy(_._1)
    val want = (for {
      i <- sets.indices.iterator
      j <- (i + 1) until sets.length
      (aId, a) = sets(i); (bId, b) = sets(j)
      if a.take(8).toSet.intersect(b.take(8).toSet).nonEmpty
      shared = a.toSet.intersect(b.toSet).size.toLong
      cont = shared.toDouble / math.min(a.length, b.length)
      if cont >= 0.8
    } yield (aId, bId) -> (shared, cont)).toMap
    assert(want.nonEmpty, "fixture must contain contained near-duplicates")
    assert(got.keySet == want.keySet,
      s"missed=${(want.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- want.keySet).take(5)}")
    for ((k, (sh, c)) <- want) {
      assert(got(k)._1 == sh, s"pair $k shared")
      assert(got(k)._2 == c, s"pair $k containment")
    }
  }

  test("approx vocabulary counts track the exact profile within HLL bounds") {
    val exact = graft.SparkEntry.queries("llm_profile_vocab")(spark, sf("sf0.01"))
      .select("source", "n_postings")
      .as[(String, Long)].collect().toMap
    // the query is self-checking (3σ flags per estimate, in-plan exact
    // twin); the spec asserts the flags hold and the exact counter lines
    // up with the exact profile
    val approx = graft.SparkEntry.queries("llm_profile_vocab_approx")(
        spark, sf("sf0.01"))
      .select("source", "n_postings", "docs_ok", "grams_ok")
      .as[(String, Long, Boolean, Boolean)].collect()
    assert(approx.length == exact.size && approx.nonEmpty)
    approx.foreach { case (srcName, nPostings, docsOk, gramsOk) =>
      assert(docsOk && gramsOk, s"$srcName HLL estimate outside 3σ")
      assert(nPostings == exact(srcName), s"$srcName n_postings")
    }
  }

  test("cluster stats conserve the corpus and agree with the components") {
    val stats = graft.SparkEntry.queries("llm_dedup_cluster_stats")(
        spark, sf("sf0.01")).cache()
    val nDocs = spark.read.parquet(sf("sf0.01") + "/documents.parquet").count()
    assert(stats.agg(sum("n_docs")).as[Long].head() == nDocs)
    // n_dropped per row is definitionally (sz-1) clusters' worth
    assert(stats.filter(
      col("n_dropped") =!= (col("cluster_size") - 1) * col("n_clusters"))
      .isEmpty)
    // multi-doc rows must reproduce the components query's size profile
    val fromComponents = graft.SparkEntry.queries("llm_dedup_components")(
        spark, sf("sf0.01"))
      .groupBy("component_id").agg(count(lit(1)).cast("long").as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .as[(Long, Long)].collect().toMap
    val multi = stats.filter(col("cluster_size") >= 2)
      .select("cluster_size", "n_clusters").as[(Long, Long)].collect().toMap
    assert(multi == fromComponents, s"$multi vs $fromComponents")
    stats.unpersist()
  }

  test("leakage-safe split keeps every near-dup pair in one split") {
    val split = graft.SparkEntry.queries("llm_split_leakage_safe")(
        spark, sf("sf0.01")).cache()
    // THE leakage property: both ends of every near-dup pair share a
    // split (plain per-doc hashing violates this whenever a component
    // straddles a threshold)
    val pairs = graft.SparkEntry.queries("llm_dedup_simhash")(spark, sf("sf0.01"))
      .select("a_id", "b_id")
    val sa = split.select(col("doc_id").as("a_id"), col("split").as("split_a"))
    val sb = split.select(col("doc_id").as("b_id"), col("split").as("split_b"))
    val leaked = pairs.join(sa, "a_id").join(sb, "b_id")
      .filter(col("split_a") =!= col("split_b"))
    assert(leaked.isEmpty)
    // families are split-atomic and the corpus is fully assigned
    assert(split.groupBy("family")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1).isEmpty)
    val nDocs = spark.read.parquet(sf("sf0.01") + "/documents.parquet").count()
    assert(split.count() == nDocs)
    split.unpersist()
  }

  test("tfidf ranks are contiguous with non-increasing scores per doc") {
    val df = graft.SparkEntry.queries("llm_text_tfidf")(spark, sf()).cache()
    val w = Window.partitionBy("doc_id").orderBy("rank")
    val bad = df
      .withColumn("prev_score", lag("score", 1).over(w))
      .withColumn("prev_rank", lag("rank", 1).over(w))
      .filter(
        col("rank") > 3 || col("rank") < 1 ||
          (col("prev_rank").isNotNull && col("rank") =!= col("prev_rank") + 1) ||
          (col("prev_score").isNotNull && col("score") > col("prev_score")))
    assert(bad.isEmpty)
    assert(df.groupBy("doc_id").count().filter(col("count") > 3).isEmpty)
    df.unpersist()
  }

  test("centroid stats are bit-identical under any partitioning (order independence)") {
    // the operator's claim: quantized-integer arithmetic makes every
    // aggregate exact and order-independent, so a 1000-executor run
    // reproduces a single-partition run bit for bit. Drive the SAME
    // computation through wildly different partitionings and compare
    // raw Double bits, not approximate equality.
    def run(parts: Int): Array[(Int, Long, Long, Long, Long)] = {
      val base = spark.read.parquet(sf() + "/embeddings.parquet")
        .repartition(parts)
      base.createOrReplaceTempView("embeddings_oi")
      val v = base.select(col("label"),
        transform(col("embedding").cast("array<double>"),
          x => floor(x * 4096).cast("long")).as("q"))
      val dims = v.select(col("label"), posexplode(col("q")))
        .groupBy("label", "pos")
        .agg(sum("col").as("s2"), count(lit(1)).as("n"))
      val cent = dims.groupBy("label").agg(
        transform(array_sort(collect_list(struct(col("pos"),
            floor(col("s2").cast("double") / col("n")).cast("long")
              .as("c")))),
          e => e.getField("c")).as("cq"))
      val qd = transform(col("q"), x => x.cast("double"))
      val cqd = transform(col("cq"), x => x.cast("double"))
      import graft.llmops.Similarity
      v.join(broadcast(cent), "label")
        .withColumn("cosc", Similarity.dot(qd, cqd) /
          (sqrt(Similarity.dot(qd, qd)) * sqrt(Similarity.dot(cqd, cqd))))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          sum(floor(col("cosc") * 1e9).cast("long")).as("qsum"),
          min(col("cosc")).as("min_cos"))
        .select(col("label"), col("n_vecs"), col("qsum"),
          expr("cast(min_cos as double)").as("min_cos"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          java.lang.Double.doubleToRawLongBits(r.getDouble(3)), 0L))
        .sortBy(_._1)
    }
    assert(run(1).toSeq == run(37).toSeq)
  }

  test("trained quality classifier agrees with its reference label >90%") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("llm_quality_train")(spark, sf()).cache()
    val n = out.count().toDouble
    val agree = out.filter(col("predicted") === col("label")).count() / n
    assert(agree > 0.9, s"train agreement $agree")
    // the model actually discriminates: both predicted classes occur,
    // and mean score of true-labeled docs clears that of false-labeled
    val preds = out.groupBy("predicted").count().count()
    assert(preds == 2, "degenerate all-one-class prediction")
    val means = out.groupBy("label").agg(avg("score_fp").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > 0 && means(false) < 0,
      s"class score means not separated: $means")
    out.unpersist()
  }

  test("classifier training is bit-identical under different parallelism") {
    // the operator's claim: every sum is an integer sum and every
    // division a floor of an exactly-representable double, so the
    // aggregation ORDER — which varies with partitioning — cannot
    // change one bit of the trained weights or scores. Run the full
    // training twice at different shuffle widths and compare exactly.
    import org.apache.spark.sql.functions._
    def run(parts: String): Seq[(Long, Long, Boolean, Boolean)] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try graft.SparkEntry.queries("llm_quality_train")(spark, sf())
        .as[(Long, Long, Boolean, Boolean)].collect().toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    assert(run("1") == run("13"))
  }

  test("classifier generalizes: held-out agreement >85% on docs never trained on") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("llm_quality_train_holdout")(spark, sf()).cache()
    // every scored doc is from the held-out fifth
    assert(out.filter(col("doc_id") % 5 =!= 0).isEmpty)
    val n = out.count().toDouble
    assert(n > 0)
    val agree = out.filter(col("predicted") === col("label")).count() / n
    assert(agree > 0.85, s"held-out agreement $agree")
    out.unpersist()
  }
}
