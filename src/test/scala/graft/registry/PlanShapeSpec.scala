package graft.registry

import graft.SparkSpec

/** Physical-plan shape assertions for the scale-critical queries: the
  * plans must actually broadcast dimensions, push predicates into the
  * parquet scan, prune columns, and partial-aggregate before shuffles —
  * not just produce correct rows. These are the properties that decide
  * whether the same plan survives a 100 TB input.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf())
      .queryExecution.executedPlan.toString

  /** Collect over the plan AND every cached subplan: the r15
    * persist-before-sort recipe hides a query's working plan inside an
    * InMemoryRelation, which `SparkPlan.collect` does not descend into —
    * a shape assertion that stopped at the cache boundary would silently
    * pass/fail on an empty tree (and the no-corpus-broadcast guard would
    * go blind). */
  private def collectThroughCaches[T](
      p: org.apache.spark.sql.execution.SparkPlan)(
      f: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // each cached subplan is visited ONCE even when several
    // InMemoryTableScanExec nodes reference the same InMemoryRelation —
    // without the identity-dedup a shared cache's matches multiply by
    // reference count, which is safe for >=N / ==0 assertions but wrong
    // for exact-count shape assertions. (AdaptiveSparkPlanExec
    // .executedPlan on an unexecuted plan is the initial plan — fine
    // for structural assertions, which is all this helper serves.)
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[
        org.apache.spark.sql.execution.SparkPlan, java.lang.Boolean]())
    def go(p: org.apache.spark.sql.execution.SparkPlan): Seq[T] = {
      val here = p.collect(f)
      // a cached plan is wrapped in AdaptiveSparkPlanExec under AQE (the
      // test session default) — collect() descends into neither wrapper
      val nested = p.collect {
        case s: InMemoryTableScanExec if seen.add(s.relation.cachedPlan) =>
          go(s.relation.cachedPlan)
        case a: AdaptiveSparkPlanExec if seen.add(a.executedPlan) =>
          go(a.executedPlan)
      }.flatten
      here ++ nested
    }
    go(p)
  }

  test("J1 doc enrichment broadcasts its dimension tables") {
    val p = plan("j1_doc_enrichment")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("S4 secondary-path scan pushes the key predicate to parquet") {
    val p = plan("s4_gsi_scan")
    assert(p.contains("PushedFilters:") &&
      (p.contains("GreaterThanOrEqual(l_partkey") ||
       p.contains("ReadSchema") && p.contains("l_partkey")), p.take(2000))
  }

  test("S1 point lookup pushes both key equalities") {
    val p = plan("s1_point_lookup")
    assert(p.contains("PushedFilters:") && p.contains("EqualTo"), p.take(2000))
  }

  test("projection prunes the parquet read schema (F14)") {
    val p = plan("s4_gsi_scan")
    // only the selected + filtered columns are read, not the full table
    assert(!p.contains("l_comment") && !p.contains("l_returnflag"),
      p.take(2000))
  }

  test("facets partial-aggregate before the exchange (A1)") {
    val p = plan("a1_facets")
    val exchangeIdx = p.indexOf("Exchange")
    val partialIdx = p.indexOf("partial_count")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"expected map-side partial agg below the Exchange:\n${p.take(2000)}")
  }

  test("ABAC predicate is pushed into the scan, not post-filtered (F11)") {
    val p = plan("f11_abac")
    assert(p.contains("PushedFilters:") &&
      (p.contains("StringEndsWith") || p.contains("In(c_mktsegment")),
      p.take(2000))
  }

  // Corpus-sized relations (per-doc gram sets / signatures / vectors)
  // must NEVER be broadcast — that is the single-node memory ceiling the
  // dedup scale paths were rebuilt to remove. These attribute names only
  // occur on the corpus-stats side of the dedup joins.
  private val corpusStatAttrs =
    Set("gs", "gs_a", "gs_b", "sig", "sig_a", "sig_b", "ea", "eb", "e")

  private def broadcastsOfCorpusStats(name: String): Seq[String] = {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val sp = graft.SparkEntry.queries(name)(spark, sf())
      .queryExecution.sparkPlan
    collectThroughCaches(sp) {
      case b: BroadcastExchangeExec
          if b.output.exists(a => corpusStatAttrs.contains(a.name)) =>
        b.output.map(_.name).mkString(",")
    }
  }

  private def shuffledHashJoins(name: String): Int = {
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    collectThroughCaches(graft.SparkEntry.queries(name)(spark, sf())
      .queryExecution.sparkPlan) { case j: ShuffledHashJoinExec => j }.size
  }

  test("minhash verify stage shuffle-joins the stats table (no corpus broadcast)") {
    assert(broadcastsOfCorpusStats("llm_dedup_minhash").isEmpty,
      s"corpus stats broadcast: ${broadcastsOfCorpusStats("llm_dedup_minhash")}")
    assert(shuffledHashJoins("llm_dedup_minhash") >= 2)
  }

  test("ngram jaccard is fully distributed (no driver collect, no corpus broadcast)") {
    assert(broadcastsOfCorpusStats("llm_dedup_ngram_jaccard").isEmpty,
      s"corpus stats broadcast: ${broadcastsOfCorpusStats("llm_dedup_ngram_jaccard")}")
    assert(shuffledHashJoins("llm_dedup_ngram_jaccard") >= 2)
    // the round-1 implementation collected all gram sets to the driver
    // inside mapPartitions — the distributed plan has no such node
    val p = plan("llm_dedup_ngram_jaccard")
    assert(!p.contains("MapPartitions"), p.take(2000))
  }

  test("containment dedup shuffle-joins its verify stage (no corpus broadcast)") {
    assert(broadcastsOfCorpusStats("llm_dedup_containment").isEmpty,
      s"corpus stats broadcast: ${broadcastsOfCorpusStats("llm_dedup_containment")}")
    // 2 verify joins; the candidate stage is the FUSED single-exchange
    // cellPairs pass since r13 (was a third shuffled-hash self-join)
    assert(shuffledHashJoins("llm_dedup_containment") >= 2)
    assert(plan("llm_dedup_containment").contains("MapPartitions"),
      "expected the fused cellPairs pair stage")
  }

  test("novelty profile never broadcasts the gram df table") {
    // the gram vocabulary grows with the corpus: df must attach via a
    // shuffled-hash join on g against the shared gramDfFlags memo, not a
    // broadcast join (the no-broadcast half is the scale guard). The
    // r14 rewrite replaced the per-query window (same shuffle + a sort)
    // with the memo join; the result is persisted before the output
    // sort so the range sampler doesn't re-execute the tail.
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val qe = graft.SparkEntry.queries("llm_profile_novelty")(spark, sf())
      .queryExecution
    assert(qe.sparkPlan.collect {
      case b: BroadcastExchangeExec => b }.isEmpty)
    val p = qe.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), "df via shuffle_hash memo join")
    assert(p.contains("InMemoryTableScan"),
      "aggregate persisted before the output sort")
  }

  test("embed-lsh dedup shuffle-joins vectors to candidates (no corpus broadcast)") {
    assert(broadcastsOfCorpusStats("llm_dedup_embed_lsh").isEmpty,
      s"corpus vectors broadcast: ${broadcastsOfCorpusStats("llm_dedup_embed_lsh")}")
    assert(shuffledHashJoins("llm_dedup_embed_lsh") >= 2)
  }

  test("exact embed dedup degrades to a partitioned CartesianProduct, never OOM") {
    // with broadcast genuinely impossible (threshold -1) the declared
    // plan must become a distributed block-pair scan, not fail or
    // single-node — this is the 100 TB behavior of the exact baseline.
    // The pair scan lives behind the shared session cache
    // (exactEmbedPairs), so the cache is cleared first — the memo
    // guard re-persists it under THIS conf — and the assertion
    // traverses into InMemoryRelation / finalized AQE subplans.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val nested = p.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          q.plan
        case s: InMemoryTableScanExec => s.relation.cachedPlan
      }
      p +: nested.filterNot(_ eq p).flatMap(flatten)
    }
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      spark.catalog.clearCache()
      val df = graft.SparkEntry.queries("llm_dedup_embed")(spark, sf())
      assert(df.count() >= 0) // executes end-to-end under the cartesian plan
      val all = flatten(df.queryExecution.executedPlan)
      assert(all.exists(p =>
        p.collect { case c: CartesianProductExec => c }.nonEmpty),
        all.map(_.treeString).mkString("\n====\n").take(4000))
    } finally {
      spark.conf.set(key, prev)
      spark.catalog.clearCache()
    }
  }

  test("exact embed pair scan streams the REPARTITIONED side of the BNLJ") {
    // the repartition exists solely to SPREAD the O(n²) pair loop
    // across tasks (the corpus parquet is a single split at bench
    // SFs); nothing forces the planner's build-side choice, so if a
    // stats/tie-break change ever flips it, the repartition feeds the
    // BROADCAST while the whole loop streams through one task — a
    // silent 2×+ regression with green hash gates (r12 found exactly
    // this shape). Pin: every BNLJ in the pair scan builds on the
    // non-repartitioned side.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.catalyst.optimizer.BuildRight
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val nested = p.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          q.plan
        case s: InMemoryTableScanExec => s.relation.cachedPlan
      }
      p +: nested.filterNot(_ eq p).flatMap(flatten)
    }
    spark.catalog.clearCache()
    val df = graft.SparkEntry.queries("llm_dedup_embed")(spark, sf())
    val bnls = flatten(df.queryExecution.executedPlan)
      .flatMap(_.collect { case b: BroadcastNestedLoopJoinExec => b })
    assert(bnls.nonEmpty, "expected a BNLJ pair scan under the threshold")
    bnls.foreach { b =>
      val streamed = if (b.buildSide == BuildRight) b.left else b.right
      assert(streamed.toString.contains("REPARTITION"),
        s"the O(n²) stream side must be the repartitioned one:\n${b.treeString.take(2000)}")
    }
  }

  test("sketch facet partial-aggregates and its embedded check holds") {
    val df = graft.SparkEntry.queries("a1_facets_sketch")(spark, sf())
    val p = df.queryExecution.executedPlan.toString
    // the sketch must still partial-aggregate map-side (the scale point)
    assert(p.contains("partial_approx_count_distinct"), p.take(2000))
    // and the in-plan 3σ self-check must pass for every facet bucket
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("sketch_ok"),
        s"facet ${r.getString(0)}: sketch outside 3σ of exact ${r.getLong(1)}")
    }
  }

  test("sorted page queries plan TakeOrderedAndProject, never a global sort") {
    // ORDER BY + LIMIT must become a per-partition top-k + driver merge
    // (TakeOrderedAndProject) — a global Sort before a limit shuffles
    // the whole table and is the difference between O(page) and
    // O(table) at 100 TB
    Seq("o1_multisort", "o4_offset_pagination", "cm1_comments_keyset")
      .foreach { q =>
        val p = plan(q)
        assert(p.contains("TakeOrderedAndProject"),
          s"$q: expected top-k plan:\n${p.take(1500)}")
      }
  }

  test("O5 over-fetch shim: bounded top-k window, no row_number pagination") {
    // the pre-auth window is ≤ 10k rows by the reference's own cap —
    // it must plan as a top-k, the page slice is native offset+limit
    // (never row_number), and the only Window operator allowed is the
    // total_hits COUNT over the already-limited frame
    val p = plan("o5_auth_overfetch")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(!p.contains("row_number"),
      s"row_number pagination fallback in o5:\n${p.take(1500)}")
    import org.apache.spark.sql.execution.window.WindowExec
    val sp = graft.SparkEntry.queries("o5_auth_overfetch")(spark, sf())
      .queryExecution.sparkPlan
    sp.collect { case w: WindowExec => w }.foreach { w =>
      assert(w.child.collectFirst {
        case l: org.apache.spark.sql.execution.GlobalLimitExec => l
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }.isDefined,
        s"o5 Window over an unbounded child:\n${w.child.treeString.take(800)}")
    }
  }

  test("S11 multipart completion has no windows; rollups partial-aggregate") {
    // two upload-keyed groupBys + a broadcastable dim join — the sorted
    // part collect is an aggregate (sort_array over collect_list), not
    // a Window; the only sort is the output ORDER BY
    val p = plan("s11_multipart_complete")
    assert(!p.contains("Window"), p.take(1500))
    val exchangeIdx = p.indexOf("Exchange")
    val partialIdx = p.indexOf("partial_")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"expected map-side partial agg below the Exchange:\n${p.take(2000)}")
  }

  test("keyset cursor predicate reaches the parquet scan") {
    val p = plan("o6_keyset_pagination")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(c_custkey"),
      p.take(1500))
  }

  test("link-metadata listing pushes both endpoint authz predicates into the scans") {
    // the F11 path twice over: the from-endpoint's equality and the
    // to-endpoint's prefix predicate must reach their parquet scans —
    // at 100 TB the authorized-link join reads only authorized rows
    val p = plan("lm1_link_metadata")
    assert(p.contains("EqualTo(o_orderstatus,O)"), p.take(2000))
    assert(p.contains("StringStartsWith(p_brand,Brand#1)"), p.take(2000))
  }

  test("database-metadata listing partial-aggregates the upsert dedup before its exchange") {
    // latest-writer-wins (max per key) must map-side combine: one
    // shuffle carries one row per (db, key), not one per write
    val p = plan("dm1_database_metadata")
    val exchangeIdx = p.indexOf("Exchange")
    val partialIdx = p.indexOf("partial_max")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"expected map-side partial max below the Exchange:\n${p.take(2000)}")
  }

  test("F7 metadata kv search: ONE pre-aggregation exchange serves both stacked aggs") {
    // the explicit hash-partition on the entity key satisfies both the
    // (key, lineno) dedup and the (key) search aggregation — the r9→r11
    // idle timing drift was environmental (suite cache pressure), so
    // this pins that the one-exchange shape itself never regresses to
    // two shuffles of the metadata table
    val p = plan("f7_metadata_kv")
    val sortIdx = p.indexOf("Sort")
    val preAgg = p.substring(math.max(sortIdx, 0))
    val exchanges = "Exchange".r.findAllIn(preAgg).size
    assert(exchanges <= 2, // output sort + the single repartition
      s"f7 aggregation stack grew extra exchanges:\n${p.take(2500)}")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>")
      || !p.contains("l_shipdate"), "f7 scan must stay 3-column pruned")
  }

  test("no Scala UDFs anywhere in the flagship plans") {
    Seq("j1_doc_enrichment", "search_advanced", "a1_facets",
      "f7_metadata_kv", "llm_text_quality").foreach { q =>
      val p = plan(q)
      assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
        s"$q contains a UDF:\n${p.take(1500)}")
    }
  }

  test("boilerplate fraction broadcasts the viral subset, never the postings") {
    // the viral-gram set is df-capped small by definition (grams in
    // >= 1% of docs); it must come back onto the corpus-sized postings
    // as a broadcast, and the postings themselves must never broadcast
    val p = plan("llm_boilerplate_fraction")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(broadcastsOfCorpusStats("llm_boilerplate_fraction").isEmpty)
  }

  test("centroid stats broadcast the label-sized centroid table only") {
    // centroids are |labels| rows; the vector side (attr e/q) must stay
    // partitioned. The rollup must partial-aggregate below its exchange.
    val p = plan("llm_embed_centroid_stats")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    val exchangeIdx = p.indexOf("Exchange")
    val partialIdx = p.indexOf("partial_")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"expected map-side partial agg below the Exchange:\n${p.take(2000)}")
  }

  test("no corpus-sized single-task window in any llm_* selection/packing plan") {
    // The scale-killer pattern: a Window whose partition key is absent
    // or low-cardinality (source/epoch/shard/bucket) over a CORPUS-sized
    // child serializes the corpus through one (or few) reducer task(s).
    // After the round-9 rewrite every such window must either
    //   (a) carry a fine-grained partition component (__bkt/__shard/
    //       doc_id/...), or
    //   (b) sit above an Aggregate — i.e. scan a histogram- or
    //       shard-totals-sized frame, not the corpus.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.window.WindowExec
    val lowCard = Set("source", "epoch", "shard", "bucket", "lang", "split")
    def hasAggBelow(p: SparkPlan): Boolean =
      p.collectFirst { case a: BaseAggregateExec => a }.isDefined ||
        p.collect { case s: InMemoryTableScanExec => s.relation.cachedPlan }
          .exists(hasAggBelow)
    val queries = Seq("llm_mix_dsir", "llm_mix_classifier",
      "llm_curate_pipeline2", "llm_pack_windows", "llm_shuffle_epoch",
      "llm_infer_batches", "llm_ingest_funnel", "llm_token_budget",
      "llm_sample_cluster", "llm_decontaminate_rm")
    for (q <- queries if graft.SparkEntry.queries.contains(q)) {
      val sp = graft.SparkEntry.queries(q)(spark, sf())
        .queryExecution.sparkPlan
      val offenders = sp.collect {
        case w: WindowExec
            if w.partitionSpec.flatMap(_.references.map(_.name))
              .forall(lowCard.contains) && // empty spec also lands here
              !hasAggBelow(w.child) =>
          s"$q: Window(partition=${w.partitionSpec.mkString(",")}) " +
            "over a non-aggregated (corpus-sized) child"
      }
      assert(offenders.isEmpty, offenders.mkString("\n"))
    }
  }

  test("phash near-dup shuffle-joins its candidate stage (no corpus hash broadcast)") {
    // the per-doc 4-band hash table is corpus-sized and rides the band
    // rows (carry-through verify — no join-back stage): the capped
    // cell self-join's two branches must be shuffle joins, never a
    // broadcast of the hash table
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val sp = graft.SparkEntry.queries("llm_mm_phash")(spark, sf())
      .queryExecution.sparkPlan
    val hashAttrs = Set("a_b0", "b_b0", "b0", "b1", "b2", "b3")
    val bad = sp.collect {
      case b: BroadcastExchangeExec
          if b.output.exists(a => hashAttrs.contains(a.name)) =>
        b.output.map(_.name).mkString(",")
    }
    assert(bad.isEmpty, s"corpus hash table broadcast: $bad")
    // since r13 the capped cell pair stage is the FUSED single-exchange
    // cellPairs pass (repartition by cell + in-partition streaming) —
    // no self-joins left in this plan at all; pin the fused stage and
    // that exactly one exchange feeds it (the carry-through verify
    // means no join-back exchange exists either)
    val p = plan("llm_mm_phash")
    assert(p.contains("MapPartitions"),
      "expected the fused cellPairs pair stage")
    assert(shuffledHashJoins("llm_mm_phash") == 0, p.take(1500))
  }

  test("cluster-balanced sampling is a bounded aggregate, not a per-cluster window") {
    // selection must flow through the TopK bounded aggregator (map-side
    // combine, shuffle <= k rows per cluster per partition); a
    // row_number window over 64 clusters would serialize the corpus
    // through 64 tasks at scale
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    val sp = graft.SparkEntry.queries("llm_sample_cluster")(spark, sf())
      .queryExecution.sparkPlan
    assert(sp.collect { case w: WindowExec => w }.isEmpty,
      "unexpected Window in llm_sample_cluster")
    val aggs = sp.collect { case a: ObjectHashAggregateExec => a }
    assert(aggs.size >= 2, // partial + final of the TopK aggregate
      s"expected partial+final TopK aggregate, got ${aggs.size}")
  }

  test("decontamination counts overlap via semi-join + aggregate, no window") {
    import org.apache.spark.sql.execution.window.WindowExec
    val sp = graft.SparkEntry.queries("llm_decontaminate_rm")(spark, sf())
      .queryExecution.sparkPlan
    assert(sp.collect { case w: WindowExec => w }.isEmpty,
      "unexpected Window in llm_decontaminate_rm")
    assert(sp.toString.contains("LeftSemi"), "expected a semi-join")
  }

  test("entropy quality signal is a zero-shuffle narrow pass") {
    // sort-the-array + one fold per row: no explode, no (doc, token)
    // exchange — the only permitted exchange is the output ORDER BY
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val sp = graft.SparkEntry.queries("llm_quality_entropy")(spark, sf())
      .queryExecution.executedPlan
    val ex = sp.collect {
      case e: ShuffleExchangeExec => e.outputPartitioning.toString }
    assert(ex.forall(_.contains("range")), ex.toString)
  }

  test("single-partition sorts appear ONLY under bounded-output queries") {
    // The sortedRollup / bounded-sort contract (r15) is documentation +
    // this pin: a SinglePartition exchange is the right tail for a
    // GROUP-CARDINALITY or key-range-bounded result (a few thousand
    // rows at ANY corpus size) and a silent scale-killer for a
    // corpus-sized one (the whole result serializes through one task).
    // Representative CORPUS-SIZED outputs must never plan one; their
    // total order must stay a range sort (or top-k). A future caller
    // feeding sortedRollup a corpus-sized frame trips this first.
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // the hazard is specifically a single-task SORT (the sortedRollup
    // tail: Sort ← Exchange(1 partition)); a global scalar aggregate's
    // 1-row SinglePartition exchange is fine and must not trip this.
    // numPartitions == 1 rather than the SinglePartition object:
    // repartition(1) plans as RoundRobinPartitioning(1) — same
    // single-task tail, different partitioning node.
    def singlePartitionSorts(q: String): Seq[String] =
      collectThroughCaches(graft.SparkEntry.queries(q)(spark, sf())
        .queryExecution.sparkPlan) {
        case s: SortExec if s.child.collectFirst {
            case e: ShuffleExchangeExec => e
          }.exists(_.outputPartitioning.numPartitions == 1) =>
          s"$q: Sort over ${s.child.nodeName}(1 partition)"
      }
    // corpus-sized results: one row per document (or more)
    val corpusSized = Seq("llm_dedup_exact", "llm_text_pii",
      "llm_shuffle_epoch", "llm_profile_novelty", "llm_text_tokens",
      "llm_quality_train", "llm_mix_classifier", "llm_dedup_substring",
      "c3_type_coercion", "s3_scan_filter", "llm_text_tfidf")
    for (q <- corpusSized if graft.SparkEntry.queries.contains(q)) {
      val bad = singlePartitionSorts(q)
      assert(bad.isEmpty,
        s"corpus-sized $q plans a single-partition exchange:\n" +
          bad.mkString("\n"))
    }
    // documented bounded rollups: the single-task tail IS the contract
    // (group-cardinality: source × stage / source pairs / key-range)
    val bounded = Seq("llm_curate_pipeline", "llm_mix_temperature",
      "a8_latest_per_key")
    for (q <- bounded if graft.SparkEntry.queries.contains(q)) {
      assert(singlePartitionSorts(q).nonEmpty,
        s"bounded $q lost its documented single-partition rollup tail")
    }
  }

  test("constraint-template fan-out is map-side: the only exchange is the output sort") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val sp = graft.SparkEntry.queries("ct1_constraint_template")(spark, sf())
      .queryExecution.executedPlan
    val shuffles = sp.collect { case e: ShuffleExchangeExec => e }
    // substitution + regex scan + explode are narrow; rangepartitioning
    // for the final ORDER BY is the single permitted exchange per branch
    // of the union (fanned + safety-base)
    assert(shuffles.forall(_.outputPartitioning.toString.contains("range")),
      sp.toString.take(2000))
  }
}
