package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The codegen trigram kernel ([[graft.functions.GraftFunctions
  * .TrigramsExpr]]) cross-checked against the HOF reference form —
  * values AND element order (array_distinct keeps first occurrence;
  * consumers like array_intersect inherit that order).
  */
class TrigramsExprSpec extends SparkSpec {
  import spark.implicits._

  test("kernel equals the HOF form on random + edge strings") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abcXYZ 0189äöüßéπ漢字😀-_'\"\n\t"
    val cases = Seq("", "a", "ab", "abc", "AAAAAA", "the the the",
      "ABCabc", "äöü äöü", "漢字漢字漢", "a😀b😀c😀d", "  spaced  out  ") ++
      Seq.fill(300)(Seq.fill(rnd.nextInt(60))(
        alphabet(rnd.nextInt(alphabet.length))).mkString) ++
      Seq(null: String)
    val df = cases.toDF("s")
    val both = df.select(
      TextIndex.trigrams(col("s")).as("fast"),
      TextIndex.trigramsHof(col("s")).as("ref"))
      .collect()
    both.zip(cases).foreach { case (r, in) =>
      assert(r.get(0) == r.get(1) ||
        r.getSeq[String](0) == r.getSeq[String](1),
        s"diverged on ${Option(in).map(_.take(40))}: " +
          s"${r.get(0)} vs ${r.get(1)}")
    }
    // null in → null out, like the HOF's propagation
    val nullRow = both.last
    assert(nullRow.isNullAt(0) && nullRow.isNullAt(1))
  }
}
