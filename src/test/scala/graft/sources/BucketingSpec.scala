package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed co-location: the join + aggregation over the bucketed pair
  * runs with ZERO shuffle exchanges and returns exactly the plain-join
  * rows. (Broadcast is disabled inside the test so the assertion pins
  * bucket co-location, not a small-table broadcast.)
  */
class BucketingSpec extends SparkSpec {

  private def joined(s: org.apache.spark.sql.SparkSession) = {
    val (oT, cT) = Bucketing.colocatedOrdersCustomer(s, sf())
    val o = s.table(oT)
    val c = s.table(cT)
    c.join(o, c("c_custkey") === o("o_custkey"))
      .groupBy(c("c_custkey"), c("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"))
  }

  test("bucketed join + same-key aggregation plans zero exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // string-match the plan: under AQE the AdaptiveSparkPlan wrapper
      // hides inner nodes from collect() before execution, which would
      // make a node-collect assertion vacuously pass
      val plan = joined(spark).queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan) // the join is real...
      assert(!plan.contains("Exchange"),           // ...and co-located
        s"bucketed join should be exchange-free:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed results equal the plain-join results") {
    val plain = spark.read.parquet(sf() + "/customer.parquet").as("c")
      .join(spark.read.parquet(sf() + "/orders.parquet").as("o"),
        col("o.o_custkey") === col("c.c_custkey"))
      .groupBy(col("c.c_custkey"), col("c.c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("c_custkey", "c_mktsegment")
      .collect()
    val bucketed = joined(spark)
      .orderBy("c_custkey", "c_mktsegment")
      .collect()
    assert(bucketed.sameElements(plain))
  }
}
