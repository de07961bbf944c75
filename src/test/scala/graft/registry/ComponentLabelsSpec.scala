package graft.registry

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The connected-component fixpoint behind `llm_dedup_components`,
  * `llm_mm_phash_cluster`, cluster stats, and the curation funnels:
  * cheap single hops for the measured common case (dense near-dup
  * blobs, eccentricity ≤ ~6), with ADAPTIVE escalation to pointer
  * doubling once the round count betrays a long-chain component — the
  * adversarial `llm_dedup_substring` near-identical-shingle shape —
  * bounding total rounds at O(log diameter) instead of O(diameter).
  */
class ComponentLabelsSpec extends SparkSpec {
  import spark.implicits._

  private def chainPairs(n: Int) =
    (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a_id", "b_id")

  test("a 10^4-node chain converges in O(log diameter) rounds, not O(diameter)") {
    val n = 10000
    val (labels, rounds) =
      LlmQueries.componentLabelsCounted(spark, chainPairs(n))
    // every node labels to the chain head
    val wrong = labels.filter(col("comp") =!= 1L).count()
    assert(wrong == 0, s"$wrong nodes mislabeled")
    assert(labels.count() == n.toLong)
    // escalation bound: EscalateAfter single hops + ~log2(n) squarings
    // + the saturation/convergence confirmations. 2·log2(10^4) ≈ 27;
    // the chain MUST NOT pay its 10^4-round eccentricity.
    val bound = LlmQueries.EscalateAfter +
      2 * (64 - java.lang.Long.numberOfLeadingZeros(n.toLong)) + 6
    assert(rounds <= bound, s"chain took $rounds rounds (bound $bound)")
  }

  test("common-case graphs converge under the escalation threshold (no extra actions)") {
    // two dense blobs + one short chain — the measured real shape
    val blob1 = for (i <- 1L to 20L; j <- (i + 1) to 20L) yield (i, j)
    val blob2 = for (i <- 101L to 110L; j <- (i + 1) to 110L) yield (i, j)
    val tail = (200L until 205L).map(i => (i, i + 1))
    val pairs = (blob1 ++ blob2 ++ tail).toDF("a_id", "b_id")
    val (labels, rounds) =
      LlmQueries.componentLabelsCounted(spark, pairs)
    assert(rounds < LlmQueries.EscalateAfter,
      s"common case escalated: $rounds rounds")
    val comps = labels.select("node", "comp").as[(Long, Long)]
      .collect().toMap
    assert((1L to 20L).forall(comps(_) == 1L))
    assert((101L to 110L).forall(comps(_) == 101L))
    assert((200L to 205L).forall(comps(_) == 200L))
  }

  test("escalated and plain fixpoints agree on a multi-component graph") {
    // chain long enough to trip the default threshold, plus a blob —
    // run once with escalation disabled (threshold above the chain's
    // eccentricity) and once with an aggressive threshold
    val pairs = chainPairs(40)
      .unionByName(Seq((500L, 501L), (501L, 502L), (500L, 502L))
        .toDF("a_id", "b_id"))
    val (plain, plainRounds) =
      LlmQueries.componentLabelsCounted(spark, pairs, escalateAfter = 1000)
    val (esc, escRounds) =
      LlmQueries.componentLabelsCounted(spark, pairs, escalateAfter = 3)
    val p = plain.as[(Long, Long)].collect().toSet
    val e = esc.as[(Long, Long)].collect().toSet
    assert(p == e, "escalation changed the labeling")
    assert(escRounds < plainRounds,
      s"escalation did not cut rounds: $escRounds vs $plainRounds")
  }
}
