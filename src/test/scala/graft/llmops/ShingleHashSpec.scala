package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fused shingle+hash kernel ([[graft.functions.GraftFunctions
  * .ShingleHash60Expr]]) fuzz-checked against the HOF chain it
  * replaced (`shingles → explode → hash60`) — multiset AND order,
  * short docs, duplicate shingles, varied n.
  */
class ShingleHashSpec extends SparkSpec {
  import spark.implicits._

  test("fused shingle hashes equal the HOF chain on random token arrays") {
    val rnd = new scala.util.Random(29)
    val vocab = Array("the", "a", "spark", "scan", "join", "x", "漢字", "b-c")
    for (n <- Seq(2, 3, 5)) {
      val rows = (0 until 300).map { i =>
        (i.toLong, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))))
      }
      val df = rows.toDF("id", "tk")
      val fused = df.select(col("id"),
        Text.shingleHashes(col("tk"), n).as("gs"))
        .as[(Long, Seq[Long])].collect().toMap
      val ref = df.select(col("id"), Text.shingles(col("tk"), n).as("grams"))
        .select(col("id"), explode_outer(col("grams")).as("gram"))
        .select(col("id"), Text.hash60(col("gram")).as("g"))
        .as[(Long, Option[Long])].collect().toSeq
        .groupBy(_._1).map { case (k, v) => k -> v.flatMap(_._2) }
      for ((id, _) <- rows)
        assert(fused(id) == ref.getOrElse(id, Seq.empty),
          s"n=$n doc $id: ${fused(id)} vs ${ref.getOrElse(id, Seq.empty)}")
    }
  }

  test("positional shingle hashes equal the positional HOF chain") {
    val rnd = new scala.util.Random(31)
    val vocab = Array("the", "a", "spark", "scan", "join", "x", "漢字", "b-c")
    for (n <- Seq(2, 5)) {
      val rows = (0 until 300).map { i =>
        (i.toLong, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))))
      }
      val df = rows.toDF("id", "tk")
      val fused = df.select(col("id"),
        Text.positionalShingleHashes(col("tk"), n).as("gs"))
        .as[(Long, Seq[Long])].collect().toMap
      val ref = df
        .withColumn("grams", when(size(col("tk")) >= n,
          expr(s"transform(sequence(0, size(tk) - $n), " +
            s"i -> concat_ws(' ', slice(tk, i + 1, $n)))"))
          .otherwise(array().cast("array<string>")))
        .select(col("id"), explode_outer(col("grams")).as("gram"))
        .select(col("id"), when(col("gram").isNotNull,
          Text.hash60(col("gram"))).as("g"))
        .as[(Long, Option[Long])].collect().toSeq
        .groupBy(_._1).map { case (k, v) => k -> v.flatMap(_._2) }
      for ((id, _) <- rows)
        assert(fused(id) == ref.getOrElse(id, Seq.empty).toSeq,
          s"n=$n doc $id")
    }
  }
}
