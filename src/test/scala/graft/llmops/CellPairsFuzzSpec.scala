package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fused single-exchange [[SkewGuard.cellPairs]] fuzz-checked
  * against the join formulation it replaced ([[SkewGuard.cellPairsJoin]])
  * — random cell layouts with duplicate ids, null cell keys, carried
  * payloads, and cells straddling the star cap.
  */
class CellPairsFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def pairBag(df: org.apache.spark.sql.DataFrame): Map[Seq[Any], Int] =
    df.collect().map(_.toSeq).toSeq.groupBy(identity).map {
      case (k, v) => k -> v.size }

  test("fused pairs equal the join form on random cell layouts") {
    val rnd = new scala.util.Random(17)
    for (trial <- 0 until 4) {
      val maxCell = Seq(4, 8, 16, 3)(trial)
      val rows = Seq.fill(800) {
        // few cells → many cells above/below the cap across trials
        val cell = rnd.nextInt(12).toLong
        val id = rnd.nextLong(120)
        (cell, id, id * 31 + cell) // carry is a function of (id, cell)
      }
      val df = rows.toDF("c", "id", "payload").repartition(5)
      val fused = SkewGuard.cellPairs(df, Seq("c"), "id", maxCell,
        carryCols = Seq("payload"))
      val ref = SkewGuard.cellPairsJoin(df, Seq("c"), "id", maxCell,
        carryCols = Seq("payload"))
      assert(pairBag(fused) == pairBag(ref), s"trial $trial (maxCell $maxCell)")
    }
  }

  test("two-column cells with null keys match the join's null semantics") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(500) {
      val c1: java.lang.Long =
        if (rnd.nextInt(10) == 0) null else rnd.nextLong(4)
      (c1, rnd.nextLong(3), rnd.nextLong(60))
    }
    val df = rows.toDF("c1", "c2", "id")
    val fused = SkewGuard.cellPairs(df, Seq("c1", "c2"), "id", 16)
    val ref = SkewGuard.cellPairsJoin(df, Seq("c1", "c2"), "id", 16)
    assert(pairBag(fused) == pairBag(ref))
    // null cell keys pair with nothing (join `===` semantics)
    assert(fused.count() > 0)
  }

  test("star cells emit rep × every member including id ties") {
    // one cell of 7 rows with a duplicated minimum id, cap 3 → star
    val df = Seq((1L, 5L), (1L, 5L), (1L, 6L), (1L, 7L), (1L, 8L),
      (1L, 9L), (1L, 10L)).toDF("c", "id")
    val fused = SkewGuard.cellPairs(df, Seq("c"), "id", 3)
    val ref = SkewGuard.cellPairsJoin(df, Seq("c"), "id", 3)
    assert(pairBag(fused) == pairBag(ref))
    // the star keeps the duplicate-min tie: (5,5) appears exactly once
    assert(pairBag(fused).getOrElse(Seq(5L, 5L), 0) == 1)
    assert(fused.count() == 6)
  }

  test("dedup dropDuplicates semantics survive the fused shape") {
    // same pair via two cells must collapse to one row downstream
    val df = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L))
      .toDF("c", "id")
    val fused = SkewGuard.cellPairs(df, Seq("c"), "id", 16)
      .dropDuplicates("a_id", "b_id")
    assert(pairSet(fused) == Set(Seq(10L, 20L)))
  }
}
