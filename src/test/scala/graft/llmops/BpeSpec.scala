package graft.llmops

import graft.SparkSpec

/** BPE trainer vs an independent single-machine reference — the greedy
  * merge rule (including runs of a repeated symbol) and the
  * deterministic tie-break must coincide. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def refGreedy(syms: Vector[String], a: String, b: String)
      : Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(words: Seq[(String, Long)], steps: Int)
      : Seq[(String, Long)] = {
    var state = words.map { case (w, f) =>
      (w.map(_.toString).toVector, f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var step = 0
    while (step < steps) {
      step += 1
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      state.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          counts((syms(i), syms(i + 1))) += f; i += 1
        }
      }
      if (counts.isEmpty) return merges.toSeq
      val ((a, b), c) = counts.toSeq
        .minBy { case ((x, y), n) => (-n, s"$x $y") }
      merges += ((s"$a $b", c))
      state = state.map { case (syms, f) => (refGreedy(syms, a, b), f) }
    }
    merges.toSeq
  }

  test("applyMerge implements greedy left-to-right runs: aaaa → aa aa, aaaaa → aa aa a") {
    val st = Bpe.initState(
      Seq(("aaaa", 1L), ("aaaaa", 1L), ("banana", 1L)).toDF("w", "freq"))
    val seqs = Bpe.applyMerge(st, "a", "a")
      .select("w", "seq").as[(String, String)].collect().toMap
    assert(seqs("aaaa") === "aa aa")
    assert(seqs("aaaaa") === "aa aa a")
    assert(seqs("banana") === "b a n a n a")
    val two = Bpe.applyMerge(st, "a", "n")
      .select("w", "seq").as[(String, String)].collect().toMap
    assert(two("banana") === "b an an a")
  }

  test("train matches the reference trainer merge-for-merge") {
    val words = Seq(("aaaa", 3L), ("banana", 2L), ("aaab", 5L),
      ("na", 7L), ("nn", 1L), ("bananarama", 1L), ("x", 4L))
    val got = Bpe.train(words.toDF("w", "freq"), 6)
      .map(m => (m.pair, m.count))
    assert(got === refTrain(words, 6))
    assert(got.size === 6)
  }
}
