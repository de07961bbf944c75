package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private def exactTwin(batch: Seq[String], ref: Seq[String]): Map[String, Boolean] = {
    val refSet = ref.toSet
    batch.map(k => k -> refSet.contains(k)).toMap
  }

  test("flags equal the exact membership semantics on planted dups") {
    val ref = Seq("alpha", "bravo", "charlie", "bravo").toDF("k")
    val batch = Seq(("a", "alpha"), ("b", "xray"), ("c", "bravo"), ("d", "yankee"))
      .toDF("id", "k")
    val got = BloomDedup.flagDups(batch, ref, "k")
      .select("id", "is_dup").as[(String, Boolean)].collect().toMap
    assert(got == Map("a" -> true, "b" -> false, "c" -> true, "d" -> false))
  }

  test("false positives from a saturated filter never reach the output") {
    // 64-bit filter over 200 keys: essentially every probe is a Bloom
    // hit, so the confirm join sees the whole batch — and must still
    // return the exact answer.
    val ref = (0 until 200).map(i => s"ref_$i").toDF("k")
    val batch = ((0 until 50).map(i => s"ref_${i * 4}") ++
      (0 until 50).map(i => s"new_$i")).toDF("k")
    val got = BloomDedup.flagDups(batch, ref, "k", estItems = 8, numBits = 64)
      .select("k", "is_dup").as[(String, Boolean)].collect().toMap
    val want = exactTwin(got.keys.toSeq, (0 until 200).map(i => s"ref_$i"))
    assert(got == want.filter { case (k, _) => got.contains(k) })
    assert(got.count(_._2) == 50 && got.size == 100)
  }

  test("an empty reference corpus flags nothing (null bloom is a miss)") {
    val ref = Seq.empty[String].toDF("k")
    val batch = Seq("a", "b").toDF("k")
    val got = BloomDedup.flagDups(batch, ref, "k").select("is_dup").as[Boolean].collect()
    assert(got.toSeq == Seq(false, false))
  }

  test("plan shape: the screen is a scalar-subquery bloom probe feeding an equi-join") {
    val ref = (0 until 100).map(i => s"r$i").toDF("k")
    val batch = (0 until 40).map(i => s"b$i").toDF("k")
    val plan = BloomDedup.flagDups(batch, ref, "k").queryExecution.executedPlan.toString
    // the probe expression is present (screen not optimized away) …
    assert(plan.contains("might_contain"))
    // … and the confirm path is a hash equi-join, not a nested loop
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("sharded variant equals the exact twin and the single-blob variant") {
    val ref = (0 until 300).map(i => s"ref_$i").toDF("k")
    val batch = ((0 until 80).map(i => s"ref_${i * 3}") ++
      (0 until 70).map(i => s"new_$i")).zipWithIndex.map(_.swap).toDF("id", "k")
    val sharded = BloomDedup.flagDupsSharded(batch, ref, "k", shards = 5)
      .select("id", "is_dup").as[(Int, Boolean)].collect().toMap
    val single = BloomDedup.flagDups(batch, ref, "k")
      .select("id", "is_dup").as[(Int, Boolean)].collect().toMap
    assert(sharded == single)
    assert(sharded.count(_._2) == 80 && sharded.size == 150)
  }

  test("sharded variant stays exact under saturated per-shard filters") {
    val ref = (0 until 400).map(i => s"r$i").toDF("k")
    val batch = ((0 until 100).map(i => s"r${i * 2}") ++
      (0 until 100).map(i => s"x$i")).zipWithIndex.map(_.swap).toDF("id", "k")
    val got = BloomDedup.flagDupsSharded(batch, ref, "k",
        shards = 3, estItems = 8, numBits = 64)
      .select("id", "is_dup").as[(Int, Boolean)].collect().toMap
    assert(got.count(_._2) == 100 && got.size == 200)
    assert((0 until 100).forall(i => got(i)) && (100 until 200).forall(i => !got(i)))
  }

  test("sharded variant with an empty reference flags nothing") {
    val got = BloomDedup.flagDupsSharded(
        Seq("a", "b").toDF("k"), Seq.empty[String].toDF("k"), "k", shards = 4)
      .select("is_dup").as[Boolean].collect()
    assert(got.toSeq == Seq(false, false))
  }

  test("randomized: flags match exact membership under arbitrary overlap and a tight filter") {
    val rnd = new scala.util.Random(20260814)
    for (_ <- 1 to 5) {
      val universe = (0 until 60).map(i => s"u$i")
      val ref = Seq.fill(80)(universe(rnd.nextInt(universe.size)))
      val batch = Seq.fill(40)(universe(rnd.nextInt(universe.size)))
      val got = BloomDedup.flagDups(
        batch.zipWithIndex.map(_.swap).toDF("id", "k"), ref.toDF("k"), "k",
        estItems = 16, numBits = 256)
        .select("id", "is_dup").as[(Int, Boolean)].collect().toMap
      val want = batch.zipWithIndex.map { case (k, i) => i -> ref.contains(k) }.toMap
      assert(got == want)
    }
  }
}
