package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The union-merge as-of join: randomized equivalence against a
  * brute-force per-row evaluation (including tie and no-match cases),
  * and the single-shuffle plan shape that makes it the 100 TB temporal
  * join.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // (key, time, id) tuples; times deliberately collide a lot to
  // exercise the tie rules
  private def randomRows(seed: Int, n: Int, keys: Int, times: Int): Seq[(Long, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (rnd.nextInt(keys).toLong, rnd.nextInt(times).toLong, i.toLong))
  }

  private def brute(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)]): Map[Long, Option[Long]] =
    left.map { case (k, t, id) =>
      val matches = right.filter { case (rk, rt, _) => rk == k && rt <= t }
      // at-or-before; among ties on time the max id wins
      id -> (if (matches.isEmpty) None
             else Some(matches.maxBy { case (_, rt, rid) => (rt, rid) }._3))
    }.toMap

  test("matches brute-force semantics on randomized data with heavy ties") {
    for (seed <- Seq(1, 2, 3)) {
      val l = randomRows(seed, 120, keys = 6, times = 20)
      val r = randomRows(seed + 100, 80, keys = 8, times = 20)
      val expected = brute(l, r)
      val got = AsOfJoin.asOf(
          l.toDF("k", "t", "lid"), r.toDF("k", "t", "rid"),
          keys = Seq("k"), leftTime = col("t"), rightTime = col("t"),
          rightPayload = Seq("m" -> col("rid")), rightTiebreak = col("rid"))
        .select("lid", "m").as[(Long, Option[Long])].collect().toMap
      assert(got.size == l.size)
      assert(got == expected, s"seed=$seed")
    }
  }

  test("left rows with no prior right row get nulls; equal timestamps match") {
    val l = Seq((1L, 10L, 100L), (1L, 5L, 101L), (2L, 10L, 102L)).toDF("k", "t", "lid")
    val r = Seq((1L, 10L, 7L), (1L, 6L, 8L)).toDF("k", "t", "rid")
    val got = AsOfJoin.asOf(l, r, Seq("k"), col("t"), col("t"),
        Seq("m" -> col("rid")), col("rid"))
      .select("lid", "m").as[(Long, Option[Long])].collect().toMap
    assert(got(100L).contains(7L)) // t=10 sees the rid at exactly t=10
    assert(got(101L).isEmpty)      // t=5 precedes every right row
    assert(got(102L).isEmpty)      // key 2 has no right rows at all
  }

  test("asOfTagged (single-scan self form) ≡ asOf on a tagged union") {
    for (seed <- Seq(5, 6)) {
      val l = randomRows(seed, 120, keys = 6, times = 20)
      val r = randomRows(seed + 100, 80, keys = 6, times = 20)
      // one frame, side tagged — the self-as-of shape
      val tagged = (l.map { case (k, t, id) => (k, t, id, false) } ++
        r.map { case (k, t, id) => (k, t, id, true) })
        .toDF("k", "t", "id", "is_r")
      val viaTagged = AsOfJoin.asOfTagged(tagged, col("is_r"),
          keys = Seq("k"), leftTime = col("t"), rightTime = col("t"),
          leftCols = Seq("lid" -> col("id")),
          rightPayload = Seq("m" -> col("id")), rightTiebreak = col("id"))
        .select("lid", "m").as[(Long, Option[Long])].collect().toMap
      val viaGeneric = AsOfJoin.asOf(
          l.toDF("k", "t", "lid"), r.toDF("k", "t", "rid"),
          keys = Seq("k"), leftTime = col("t"), rightTime = col("t"),
          rightPayload = Seq("m" -> col("rid")), rightTiebreak = col("rid"))
        .select("lid", "m").as[(Long, Option[Long])].collect().toMap
      assert(viaTagged == viaGeneric, s"seed=$seed")
    }
  }

  test("asOfArrayProbe (the asymmetric shape) ≡ brute force on randomized data") {
    // fold the right side into per-key sorted (t, id) arrays, probe per
    // left row with filter + null-safe get. Must match the operator's
    // brute-force contract exactly — at-or-before, ties on time broken
    // by max id, no-match → null.
    for (seed <- Seq(11, 12)) {
      val l = randomRows(seed, 120, keys = 6, times = 20)
      val r = randomRows(seed + 100, 80, keys = 8, times = 20)
      val expected = brute(l, r)
      val got = AsOfJoin.asOfArrayProbe(
          l.toDF("k", "t", "lid"), r.toDF("k", "t", "rid"),
          keys = Seq("k"), leftTime = col("t"), rightTime = col("t"),
          rightPayload = Seq("m" -> col("rid")), rightTiebreak = col("rid"))
        .select("lid", "m").as[(Long, Option[Long])].collect().toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("asOfArrayProbe plans no sort of the left (fact) side") {
    val l = randomRows(21, 100, 5, 15).toDF("k", "t", "lid")
    val r = randomRows(22, 60, 5, 15).toDF("k", "t", "rid")
    val plan = AsOfJoin.asOfArrayProbe(l, r, Seq("k"), col("t"), col("t"),
        Seq("m" -> col("rid")), col("rid"))
      .queryExecution.executedPlan.toString
    // the right side aggregates (sort_array is per-ROW, not a plan
    // Sort); a ShuffledHashJoin needs no sort on either input — the
    // only acceptable Sort would be none at all
    assert(!plan.contains("Sort "), s"unexpected plan sort:\n$plan")
    assert(plan.contains("ShuffledHashJoin"), plan)
  }

  test("asOfTagged: a NULL tag row is a left row, never a corrupt all-null row") {
    // pre-r15 a nullable isRight fell through BOTH when() branches:
    // side defaulted to 0 but __l stayed NULL → an all-null output row.
    // The tag is now coalesced to false, so the row is a real left row.
    val rows = Seq(
      (1L, 10L, 100L, Some(true)),   // right @10
      (1L, 20L, 200L, Some(false)),  // left  @20 → matches 100
      (1L, 30L, 300L, None))         // NULL tag → left @30 → matches 100
      .toDF("k", "t", "id", "is_r")
    val got = AsOfJoin.asOfTagged(rows, col("is_r"), Seq("k"),
        col("t"), col("t"), Seq("lid" -> col("id")),
        Seq("m" -> col("id")), col("id"))
      .select("lid", "m").as[(Option[Long], Option[Long])].collect().toSet
    assert(got == Set((Some(200L), Some(100L)), (Some(300L), Some(100L))))
  }

  test("asOfTagged plans ONE scan of the tagged source") {
    val rows = randomRows(7, 100, 5, 15).map { case (k, t, id) =>
      (k, t, id, id % 2 == 0) }.toDF("k", "t", "id", "is_r")
    val plan = AsOfJoin.asOfTagged(rows, col("is_r"), Seq("k"),
        col("t"), col("t"), Seq("lid" -> col("id")),
        Seq("m" -> col("id")), col("id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), plan)
    assert("Exchange ".r.findAllIn(plan).size == 1,
      s"expected exactly one exchange:\n$plan")
  }

  test("plan shape: ONE shuffle total (the key partition), no join node") {
    val l = randomRows(1, 50, 4, 10).toDF("k", "t", "lid")
    val r = randomRows(2, 50, 4, 10).toDF("k", "t", "rid")
    // string-match the plan: under AQE the AdaptiveSparkPlan wrapper does
    // not expose inner nodes to collect() before execution
    val plan = AsOfJoin.asOf(l, r, Seq("k"), col("t"), col("t"),
      Seq("m" -> col("rid")), col("rid"))
      .queryExecution.executedPlan.toString
    assert("Exchange ".r.findAllIn(plan).size == 1,
      s"expected exactly one exchange:\n$plan")
    // no BroadcastNestedLoop/SortMerge range join anywhere — the whole
    // temporal match happens inside the window over the union
    assert(!plan.contains("Join"), plan)
  }
}
