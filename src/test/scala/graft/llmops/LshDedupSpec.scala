package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** LSH-screened embedding dedup: the candidate screen's recall contract.
  *
  * For TRUE duplicates (sim ≥ 0.9) a random hyperplane agrees with
  * probability p = 1 - θ/π ≥ 0.857, so a 6-bit table hits with
  * p^6 ≥ 0.39 and ten tables miss with ≤ 0.61^10 ≈ 7e-3 (≈ 4e-9 at
  * sim 0.999). Near the 0.45 threshold p drops to 0.65 and NO
  * sub-quadratic amplification separates 0.45 from 0.40 — which is why
  * `llm_dedup_embed` (exact, distributed pair scan) remains the exact
  * operator and the LSH screen is a documented part of the scale
  * variant's contract rather than a silent approximation.
  */
class LshDedupSpec extends SparkSpec {
  import spark.implicits._

  test("collision screen recall is 1.0 for planted near-duplicates") {
    val rnd = new scala.util.Random(42)
    val dim = 64
    val base = Array.tabulate(40)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
    // 10 planted near-dups: copy + tiny perturbation → sim ≥ 0.999
    val dups = base.take(10).map { case (id, v) =>
      (id + 1000L, v.map(x => x + rnd.nextGaussian() * 0.01))
    }
    val all = (base ++ dups).map { case (id, v) => (id, v.toSeq) }.toSeq
    val vecs = all.toDF("vec_id", "e")

    val cand = Similarity.lshCollisionPairs(vecs)
      .as[(Long, Long)].collect().toSet

    // exact qualifying pairs at sim ≥ 0.9 — exactly the planted ones
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val allArr = (base ++ dups)
    val truePairs = (for {
      (ia, va) <- allArr; (ib, vb) <- allArr
      if ia < ib && cos(va, vb) >= 0.9
    } yield (ia, ib)).toSet
    assert(truePairs.size == 10, s"expected the 10 planted pairs, got $truePairs")
    val missed = truePairs -- cand
    assert(missed.isEmpty, s"screen missed true duplicates: $missed")
  }

  test("screened dedup equals exact dedup restricted to the candidate set") {
    graft.functions.GraftFunctions.register(spark)
    val v = graft.core.Tables.load(spark, sf(), "embeddings")
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("e"))
    val cand = Similarity.lshCollisionPairs(v).as[(Long, Long)].collect().toSet
    // exact pairwise sims over the candidate pairs only must reproduce
    // the registered query's rows (consistency of screen + re-rank)
    val screened = graft.SparkEntry.queries("llm_dedup_embed_lsh")(spark, sf())
      .select("dup_id", "keep_id").as[(Long, Long)].collect().toSet
    screened.foreach { case (dup, keep) =>
      assert(cand.contains((keep, dup)),
        s"result pair ($keep,$dup) not in the candidate screen")
    }
  }
}
