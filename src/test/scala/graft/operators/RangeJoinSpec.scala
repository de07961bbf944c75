package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed range join: identical rows to the naive non-equi join for
  * ANY bin width, and the plan is an equi-join — never a nested-loop /
  * cartesian product.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  test("matches the naive non-equi join on randomized intervals, any bin width") {
    val rnd = new scala.util.Random(42)
    val base = 1700000000000000L
    val points = (1 to 400).map(i =>
        (i.toLong, ts(base + rnd.nextInt(1000000) * 1000L)))
      .toDF("pid", "pt")
    val intervals = (1 to 60).map { i =>
      val s = base + rnd.nextInt(1000000) * 1000L
      // lengths from empty (emits nothing) to long (spans many bins)
      (s"iv$i", ts(s), ts(s + rnd.nextInt(200000) * 1000L - 50000L * 1000L))
    }.toDF("label", "ws", "we")
    val naive = points.join(intervals,
        col("pt") >= col("ws") && col("pt") < col("we"))
      .select("pid", "label").as[(Long, String)].collect().toSet
    // equivalence must hold for bins smaller than, comparable to, and
    // larger than the interval lengths — width tunes cost, never rows
    Seq(1000L * 1000, 50000L * 1000, 500000L * 1000).foreach { bin =>
      val bucketed = RangeJoin.pointInInterval(points, col("pt"),
          intervals, col("ws"), col("we"), bin)
        .select("pid", "label").as[(Long, String)].collect().toSet
      assert(bucketed == naive, s"bin=$bin")
    }
    assert(naive.nonEmpty)
  }

  test("boundary semantics are half-open: start included, end excluded") {
    val points = Seq((1L, ts(1000000L)), (2L, ts(2000000L)), (3L, ts(1999999L)))
      .toDF("pid", "pt")
    val intervals = Seq(("iv", ts(1000000L), ts(2000000L))).toDF("label", "ws", "we")
    val got = RangeJoin.pointInInterval(points, col("pt"),
        intervals, col("ws"), col("we"), 1000L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("streams: a point stream labels against static intervals, same rows as batch") {
    // the bucketed form is a stream-static EQUI-join + stateless filter,
    // so it runs under Structured Streaming as-is — the naive non-equi
    // form would be unsupported/nested-loop there
    import org.apache.spark.sql.streaming.Trigger
    val rnd = new scala.util.Random(7)
    val base = 1700000000000000L
    val points = (1 to 200).map(i =>
        (i.toLong, ts(base + rnd.nextInt(500000) * 1000L)))
      .toDF("pid", "pt")
    val intervals = (1 to 20).map { i =>
      val s = base + rnd.nextInt(500000) * 1000L
      (s"iv$i", ts(s), ts(s + (rnd.nextInt(100000) + 1) * 1000L))
    }.toDF("label", "ws", "we")
    val dir = java.nio.file.Files.createTempDirectory("graft-rj-stream").toString
    points.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(points.schema).parquet(dir)
    val q = RangeJoin.pointInInterval(stream, col("pt"),
        intervals, col("ws"), col("we"), 60000L * 1000)
      .select("pid", "label")
      .writeStream.outputMode("append")
      .format("memory").queryName("rj_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("rj_out").as[(Long, String)].collect().toSet
    val batch = RangeJoin.pointInInterval(points, col("pt"),
        intervals, col("ws"), col("we"), 60000L * 1000)
      .select("pid", "label").as[(Long, String)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("plans as an equi-join on the bin key, never a nested loop") {
    val points = Seq((1L, ts(1000000L))).toDF("pid", "pt")
    val intervals = Seq(("iv", ts(0L), ts(2000000L))).toDF("label", "ws", "we")
    val plan = RangeJoin.pointInInterval(points, col("pt"),
        intervals, col("ws"), col("we"), 1000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1500))
  }
}
