package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The byte-pass tokenizer kernel ([[graft.functions.GraftFunctions
  * .TokensExpr]]) and the punct-count kernel fuzz-checked against
  * their regex reference forms — values AND order, including empty
  * strings, leading/trailing separator runs (Java split limit -1
  * keeps their empty tokens), non-\s unicode whitespace (NOT a
  * separator), multibyte text, and case folding.
  */
class TokensExprSpec extends SparkSpec {
  import spark.implicits._

  test("tokens kernel equals split(trim(lower(s)), \\s+) on random + edge strings") {
    val rnd = new scala.util.Random(13)
    val alphabet = "ab C9 \t\n\f\r äπ漢😀.,-"
    val cases = Seq("", " ", "\t", "a", " a ", "\ta\t", "a  b\tc",
      "\t\t", "the quick\nbrown", "a b", "ÄÖÜ ss", "漢 字",
      "a😀 b", "  lead", "trail  ", "\rxy\fz\r") ++
      Seq.fill(400)(Seq.fill(rnd.nextInt(40))(
        alphabet(rnd.nextInt(alphabet.length))).mkString) ++
      Seq(null: String)
    val df = cases.toDF("s")
    val both = df.select(
      Text.tokens(col("s")).as("fast"),
      Text.tokensRegex(col("s")).as("ref")).collect()
    both.zip(cases).foreach { case (r, in) =>
      assert((r.isNullAt(0) && r.isNullAt(1)) ||
        r.getSeq[String](0) == r.getSeq[String](1),
        s"tokens diverged on ${Option(in).map(_.take(40))}: " +
          s"${r.get(0)} vs ${r.get(1)}")
    }
  }

  test("nonAlnumCount equals regexp_count on random + multibyte strings") {
    val rnd = new scala.util.Random(14)
    val alphabet = "abC9 .,;!\t\näπ漢😀_-"
    val cases = Seq("", "abc 123", "...", "ä", "😀", "a😀b.c") ++
      Seq.fill(400)(Seq.fill(rnd.nextInt(50))(
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = cases.toDF("s")
    val both = df.select(
      Text.nonAlnumCount(col("s")).as("fast"),
      regexp_count(col("s"), lit("[^a-zA-Z0-9 ]")).cast("long").as("ref"))
      .collect()
    both.zip(cases).foreach { case (r, in) =>
      assert(r.getLong(0) == r.getLong(1),
        s"count diverged on '${in.take(40)}': ${r.getLong(0)} vs ${r.getLong(1)}")
    }
  }
}
