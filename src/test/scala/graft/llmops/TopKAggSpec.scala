package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native bounded top-k aggregates ([[graft.functions.BoundedTopKPairs]]
  * / [[graft.functions.BoundedTopKCarry]]) cross-checked against the
  * typed-`Aggregator` reference implementations they replaced on the
  * hot path — random inputs, duplicate keys, ties, negative keys,
  * varied partitioning, groups above and below k.
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("native smallestK equals the typed reference on random inputs") {
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 3) {
      val k = Seq(1, 5, 64)(trial)
      // duplicate keys and ids on purpose: ties must break identically
      val rows = Seq.fill(4000)((s"g${rnd.nextInt(17)}",
        rnd.nextLong(50) - 25, rnd.nextLong(200)))
      val df = rows.toDF("grp", "key", "id").repartition(1 + trial * 5)
      val native = df.groupBy("grp")
        .agg(TopK.smallestK(k)(col("key"), col("id")).as("p"))
        .as[(String, Array[Long])].collect().toMap
      val ref = df.groupBy("grp")
        .agg(TopK.smallestKRef(k)(col("key"), col("id")).as("p"))
        .as[(String, Array[Long])].collect().toMap
      assert(native.keySet == ref.keySet, s"trial $trial")
      for (g <- ref.keySet)
        assert(native(g).toSeq == ref(g).toSeq, s"trial $trial group $g")
    }
  }

  test("native smallestKCarry equals the typed reference on random inputs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val k = Seq(1, 7, 50)(trial)
      val rows = Seq.fill(4000)((s"g${rnd.nextInt(13)}",
        rnd.nextLong(40) - 20, rnd.nextLong(100000), rnd.nextDouble()))
      val df = rows.toDF("grp", "key", "id", "carry").repartition(2 + trial * 7)
      val native = df.groupBy("grp")
        .agg(TopK.smallestKCarry(k)(col("key"), col("id"), col("carry")).as("p"))
        .select(col("grp"), col("p"))
        .as[(String, Seq[(Long, Long, Double)])].collect().toMap
      val ref = df.groupBy("grp")
        .agg(TopK.smallestKCarryRef(k)(col("key"), col("id"), col("carry")).as("p"))
        .select(col("grp"), col("p"))
        .as[(String, Seq[(Long, Long, Double)])].collect().toMap
      assert(native.keySet == ref.keySet, s"trial $trial")
      for (g <- ref.keySet)
        assert(native(g) == ref(g), s"trial $trial group $g")
    }
  }

  test("small groups (< k) return every row in rank order") {
    val df = Seq(("a", 3L, 30L, 0.3), ("a", 1L, 10L, 0.1), ("b", 2L, 20L, 0.2))
      .toDF("grp", "key", "id", "carry")
    val got = df.groupBy("grp")
      .agg(TopK.smallestKCarry(10)(col("key"), col("id"), col("carry")).as("p"))
      .select(col("grp"), col("p"))
      .as[(String, Seq[(Long, Long, Double)])].collect().toMap
    assert(got("a") == Seq((1L, 10L, 0.1), (3L, 30L, 0.3)))
    assert(got("b") == Seq((2L, 20L, 0.2)))
  }

  test("null inputs are skipped, not ranked") {
    val df = Seq[(String, Option[Long], Option[Long])](
      ("a", Some(1L), Some(10L)), ("a", None, Some(99L)),
      ("a", Some(2L), None), ("a", Some(3L), Some(30L)))
      .toDF("grp", "key", "id")
    val got = df.groupBy("grp")
      .agg(TopK.smallestK(5)(col("key"), col("id")).as("p"))
      .as[(String, Array[Long])].collect().toMap
    assert(got("a").toSeq == Seq(1L, 10L, 3L, 30L))
  }

  test("non-BIGINT inputs are rejected at analysis, not mid-job (r14 advice)") {
    // update() casts straight to Long/Double; without checkInputDataTypes
    // an INT or FLOAT column analyzed fine and ClassCastException'd in
    // the executor — now it must fail the query's analysis instead
    val df = Seq(("a", 1, 10L, 0.5f)).toDF("grp", "key_int", "id", "carry_f")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("grp")
        .agg(TopK.smallestK(5)(col("key_int"), col("id"))).collect()
    }
    assert(e1.getMessage.contains("BIGINT"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("grp")
        .agg(TopK.smallestKCarry(5)(col("id"), col("id"),
          col("carry_f"))).collect()
    }
    assert(e2.getMessage.contains("DOUBLE"))
  }
}
