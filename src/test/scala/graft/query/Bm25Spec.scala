package graft.query

import graft.SparkSpec
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {

  test("log2Fp tracks log2 within 2^-19 and is exactly monotone") {
    var prev = -1L
    for (b <- 1L to 2000L) {
      val fp = GraftFunctions.log2Fp(4003L, b) // a/b from 4003 down to ~2
      val exact = math.log(4003.0 / b) / math.log(2.0)
      assert(math.abs(fp / 1048576.0 - exact) < 2e-6,
        s"b=$b fp=$fp exact=$exact")
      assert(prev == -1L || fp <= prev, s"not antitone in b at $b") // a fixed
      prev = fp
    }
    assert(GraftFunctions.log2Fp(5L, 5L) == 0L)
    assert(GraftFunctions.log2Fp(2L, 1L) == (1L << 20))
    assert(GraftFunctions.log2Fp(1L << 42, 1L) == (42L << 20))
  }

  test("BM25: rare term dominates, length norm penalizes padding, tf saturates") {
    import spark.implicits._
    // 40 background docs with common terms; doc 1 has the rare term once,
    // doc 2 has it once but is much longer, doc 3 has a common term 5x
    val docs = (
      Seq(
        (1L, "alpha rare beta gamma"),
        (2L, "alpha rare " + Seq.fill(40)("beta").mkString(" ")),
        (3L, "alpha common common common common common beta")
      ) ++ (4L to 43L).map(i => (i, "alpha common beta gamma delta"))
    ).toDF("doc_id", "text")
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("tk"))
    val out = Bm25.rank(docs, "doc_id", "tk", Seq("rare", "common"), 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rare-term docs outrank every common-only doc
    assert(out(1L) > out(3L), s"idf missing: $out")
    // same tf, longer doc scores lower (length normalization)
    assert(out(1L) > out(2L), s"no length norm: $out")
    // tf=5 beats tf=1 for the same term, but not 5x (saturation)
    assert(out(3L) > out(4L) && out(3L) < 4 * out(4L), s"tf shape: $out")
  }

  test("length-norm decomposition is floor-exact and survives dl*N past int64") {
    import spark.implicits._
    // the decomposed summand dl*q + (dl*r) DIV sumdl must equal
    // floor(dl*18432*n / sumdl) exactly (BigInt ground truth), at
    // corpus shapes where the naive triple product dl*18432*n
    // overflows int64 (dl*n > ~5e14)
    val cases = Seq(
      // (dl, n, sumdl): 10^10-doc corpus, avg 1k tokens, 50k-token doc
      (50000L, 10000000000L, 10000000000000L),
      (1000000L, 10000000000L, 10000000000000L), // megatoken doc
      (3L, 7L, 21L), (1L, 1L, 1L), (4096L, 123456789L, 98765432100L))
    val df = cases.toDF("dl", "n", "sumdl")
    val got = df.selectExpr(
      "dl", "n", "sumdl",
      "dl * ((n * 18432) DIV sumdl) + (dl * ((n * 18432) % sumdl)) DIV sumdl AS norm")
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (dl, n, sumdl, norm) =>
      val exact = (BigInt(dl) * 18432 * n / sumdl)
      assert(BigInt(norm) == exact, s"dl=$dl n=$n sumdl=$sumdl: $norm != $exact")
    }
  }

  test("BM25 plan: top-k via TakeOrderedAndProject, no corpus sort or explode") {
    import spark.implicits._
    val docs = (1L to 500L).map(i => (i, s"alpha beta doc$i"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("tk"))
    val p = Bm25.rank(docs, "doc_id", "tk", Seq("alpha", "beta"), 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("Generate"), s"unexpected explode:\n${p.take(2000)}")
    assert(!p.contains("ScalaUDF"), p.take(2000))
  }
}
