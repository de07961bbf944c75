package graft.registry

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property check: the AllPairs/PPJoin candidate generator (prefix slice
  * + length filter + positional filter) NEVER prunes a pair with
  * Jaccard ≥ 0.5 — on randomized gram-set universes including the edge
  * shapes (singleton sets, identical sets, disjoint sets, containment,
  * odd/even sizes). The filters may overshoot (extra candidates are
  * verified away later); they must never undershoot.
  */
class NgramCandidateSpec extends SparkSpec {
  import spark.implicits._

  private def randomSet(rnd: scala.util.Random, universe: Int, maxLen: Int): Seq[Int] = {
    val len = 1 + rnd.nextInt(maxLen)
    val set = scala.collection.mutable.SortedSet.empty[Int]
    while (set.size < len) set += rnd.nextInt(universe)
    set.toSeq
  }

  private def check(seed: Int, nDocs: Int, universe: Int, maxLen: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val base = (0 until nDocs).map(i => (i.toLong, randomSet(rnd, universe, maxLen)))
    val docs = base ++ Seq(
      (nDocs.toLong, base.head._2),                      // exact duplicate
      (nDocs.toLong + 1, base.head._2 :+ (universe + 1))) // superset (+1 elem)
    val truePairs = (for {
      (ia, sa) <- docs; (ib, sb) <- docs
      if ia < ib
      shared = sa.toSet.intersect(sb.toSet).size
      if shared > 0 &&
        shared.toDouble / (sa.size + sb.size - shared) >= 0.5
    } yield (ia, ib)).toSet
    assert(truePairs.nonEmpty) // the forced dup/superset make this non-vacuous

    val stats = docs.toDF("doc_id", "gs")
      .withColumn("gs", sort_array(col("gs")))
      .withColumn("n", size(col("gs")).cast("long"))
    val cand = LlmQueries.ngramCandidates(stats, Seq.empty[Int].toDF("g"))
      .as[(Long, Long)].collect().toSet
    val missed = truePairs -- cand
    assert(missed.isEmpty,
      s"seed=$seed: candidate generator pruned qualifying pairs $missed " +
        s"(|true|=${truePairs.size}, |cand|=${cand.size})")
  }

  test("candidates are a superset of all J>=0.5 pairs (randomized universes)") {
    // small universes force heavy overlap; large ones force sparsity
    check(seed = 1, nDocs = 30, universe = 20, maxLen = 8)
    check(seed = 2, nDocs = 30, universe = 200, maxLen = 12)
    check(seed = 3, nDocs = 40, universe = 15, maxLen = 5)
    check(seed = 4, nDocs = 25, universe = 1000, maxLen = 20)
  }

  test("with a viral cap, candidates are a superset of all capped-set J>=0.5 pairs") {
    // boilerplate gram 0 appears in EVERY doc and sorts first — the
    // round-1 bug class: anti-joining it out of a pre-capped prefix
    // shortened the index and silently dropped qualifying pairs. The
    // contract: recall is exact w.r.t. the CAPPED sets.
    val rnd = new scala.util.Random(7)
    val base = (0 until 30).map { i =>
      val s = randomSet(rnd, 40, 6).filter(_ != 0)
      (i.toLong, 0 +: s) // viral gram prepended to every doc
    }
    val docs = base ++ Seq((30L, base.head._2), (31L, base.head._2 :+ 41))
    val truePairsCapped = (for {
      (ia, sa0) <- docs; (ib, sb0) <- docs
      if ia < ib
      sa = sa0.toSet - 0; sb = sb0.toSet - 0 // capped sets
      shared = sa.intersect(sb).size
      if sa.nonEmpty && sb.nonEmpty && shared > 0 &&
        shared.toDouble / (sa.size + sb.size - shared) >= 0.5
    } yield (ia, ib)).toSet
    assert(truePairsCapped.nonEmpty)
    val stats = docs.toDF("doc_id", "gs")
      .withColumn("gs", sort_array(col("gs")))
      .withColumn("n", size(col("gs")).cast("long"))
    val viral = Seq(0).toDF("g")
    val cand = LlmQueries.ngramCandidates(stats, viral)
      .as[(Long, Long)].collect().toSet
    val missed = truePairsCapped -- cand
    assert(missed.isEmpty, s"capped-set qualifying pairs pruned: $missed")
  }

  test("ngramJaccardPairs under an active cap: qualify on full AND capped sets, exact values") {
    // viral gram 0 in every doc; one doc is ONLY the viral gram (its
    // capped set is empty — it must never qualify, and never divide by 0)
    val rnd = new scala.util.Random(11)
    val base = (0 until 25).map { i =>
      val s = randomSet(rnd, 30, 6).filter(_ != 0)
      (i.toLong, (0 +: s).distinct)
    }
    val docs = base ++ Seq((25L, base.head._2), (26L, Seq(0)))
    val expected = (for {
      (ia, sa0) <- docs; (ib, sb0) <- docs
      if ia < ib
      saF = sa0.toSet; sbF = sb0.toSet
      sharedF = saF.intersect(sbF).size
      jacF = sharedF.toDouble / (saF.size + sbF.size - sharedF)
      sa = saF - 0; sb = sbF - 0
      sharedC = sa.intersect(sb).size
      denomC = sa.size + sb.size - sharedC
      if jacF >= 0.5 && denomC > 0 && sharedC.toDouble / denomC >= 0.5
    } yield ((ia, ib), (sharedF.toLong, jacF))).toMap
    assert(expected.nonEmpty)
    val stats = docs.toDF("doc_id", "gs")
      .withColumn("gs", sort_array(col("gs")))
      .withColumn("n", size(col("gs")).cast("long"))
    val got = LlmQueries.ngramJaccardPairs(stats, Seq(0).toDF("g"))
      .as[(Long, Long, Long, Double)].collect()
      .map { case (a, b, sh, j) => ((a, b), (sh, j)) }.toMap
    assert(got.keySet == expected.keySet,
      s"extra=${got.keySet -- expected.keySet} missing=${expected.keySet -- got.keySet}")
    expected.foreach { case (k, (sh, j)) =>
      assert(got(k)._1 == sh && math.abs(got(k)._2 - j) < 1e-12, s"pair $k")
    }
  }

  test("ngramJaccardPairs with no viral grams matches the plain exact form") {
    val docs = Seq(
      (1L, Seq(1, 2, 3, 4)), (2L, Seq(1, 2, 3, 5)), // J = 3/5 >= 0.5
      (3L, Seq(7, 8)), (4L, Seq(8, 9)))             // J = 1/3 < 0.5
    val stats = docs.toDF("doc_id", "gs")
      .withColumn("gs", sort_array(col("gs")))
      .withColumn("n", size(col("gs")).cast("long"))
    val got = LlmQueries.ngramJaccardPairs(stats, Seq.empty[Int].toDF("g"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 3L, 0.6)))
  }

  test("identical single-element sets are found (smallest edge case)") {
    val stats = Seq((1L, Seq(7)), (2L, Seq(7)), (3L, Seq(9)))
      .toDF("doc_id", "gs")
      .withColumn("n", size(col("gs")).cast("long"))
    val cand = LlmQueries.ngramCandidates(stats, Seq.empty[Int].toDF("g"))
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 2L)))
    assert(!cand.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("candidate pipeline exchange discipline: one consumer-side exchange only") {
    // the prefix postings are hash-partitioned on the gram ONCE and
    // persisted — that exchange is paid at cache build, not per
    // consumer — so the self-join reads two co-partitioned cache scans
    // with NO exchange of its own; the collision rows repartition on
    // a_id alone, which the pair aggregation reuses. The consumer plan
    // must therefore contain exactly ONE shuffle (a_id). AQE is
    // disabled for the assertion: its wrapper hides the physical nodes
    // from collect() before execution.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val docs = (0 until 200).map { i =>
      (i.toLong, (0 until 20).map(k => (i * 7 + k * 3) % 97).distinct.sorted)
    }
    val stats = docs.toDF("doc_id", "gs")
      .withColumn("n", size(col("gs")).cast("long"))
      .persist()
    stats.count()
    try {
      val cand = LlmQueries.ngramCandidates(stats, Seq.empty[Int].toDF("g"))
      cand.count() // materialize (also caches the prefix postings)
      val plan = cand.queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.size == 1,
        s"expected exactly 1 consumer-side exchange (a_id), got ${exchanges.size}:\n$plan")
      assert(exchanges.head.outputPartitioning.toString.contains("a_id"), plan.toString)
      assert(plan.toString.contains("ShuffledHashJoin"), plan.toString)
    } finally {
      stats.unpersist()
      spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
  }
}
