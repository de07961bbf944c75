package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB skew story is two-layered: SkewGuard caps pathological
  * dedup cells STRUCTURALLY, and everything else leans on AQE's runtime
  * skew-join splitting. This spec proves the second layer actually
  * engages — a hot-key sort-merge join under adaptive execution must
  * plan an `AQEShuffleRead` with `isSkew=true` partitions (the hot
  * partition split into subpartitions), not silently run one giant
  * task. A dedicated session pins the thresholds LOW so the engagement
  * is observable at test scale; production sessions keep Spark's
  * defaults and the same mechanics kick in at real partition sizes.
  */
class AqeSkewSpec extends AnyFunSuite {

  test("AQE splits a skewed sort-merge join into subpartitions") {
    // a CHILD session of the shared test session: same SparkContext
    // (builder.getOrCreate() would return the shared session itself, and
    // stopping it would kill every suite after this one), isolated
    // runtime SQL conf so the low skew thresholds don't leak
    val spark = graft.SparkSpec.session.newSession()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // force the skew machinery to be observable at KB scale
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
    // keep broadcast out of the way so the join stays sort-merge
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      import spark.implicits._
      // one viral key (0) carrying ~90% of rows + a uniform tail
      val left = (0 until 40000).map { i =>
        (if (i < 36000) 0L else (i % 97).toLong + 1L,
          s"payload-left-$i-${"x" * 40}")
      }.toDF("k", "lv").repartition(4)
      val right = (0 until 4000).map { i =>
        ((i % 97).toLong, s"payload-right-$i-${"y" * 40}")
      }.toDF("k", "rv").repartition(4)
      val joined = left.join(right, "k")
      // execute THIS query's own physical plan so its adaptive plan
      // finalizes (an action like count() spawns a separate execution)
      val qe = joined.queryExecution
      assert(qe.toRdd.count() > 0)
      val exec = qe.executedPlan
      val finalPlan = exec.collectFirst {
        case a: AdaptiveSparkPlanExec => a.executedPlan
      }.getOrElse(exec)
      // the hot partition must have been split: the join is marked
      // skew=true and at least one shuffle read carries skewed specs
      val rendered = finalPlan.toString
      assert(rendered.contains("skew=true"),
        s"join not skew-marked in:\n${rendered.take(3000)}")
      assert(rendered.contains("AQEShuffleRead skewed"),
        s"no skewed AQEShuffleRead in:\n${rendered.take(3000)}")
    } finally {
      // never stop(): the SparkContext is shared with every other suite.
      // Re-activate the shared session for whoever runs next.
      SparkSession.setActiveSession(graft.SparkSpec.session)
    }
  }
}
