package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Bucketed (co-located) tables — the zero-shuffle join layout at 100 TB.
  *
  * A repeated fact⋈dimension join on the same key pays a full shuffle of
  * BOTH sides every query unless the data is laid out for it. Writing
  * both tables bucketed (and sorted) by the join key means every later
  * join / aggregation on that key is exchange-free: Spark's
  * FileSourceScanExec exposes the bucket spec as its output
  * partitioning, so EnsureRequirements inserts NO Exchange — at 100 TB
  * that's the difference between re-shuffling terabytes per query and
  * reading co-located files. This is the lakehouse analogue of the
  * reference keeping its tables keyed by partition key in the store
  * (`backend/backend/handlers/assets/assetService.py` queries by
  * databaseId partition): pre-organize by access key once, serve every
  * query from the organized layout.
  *
  * `BucketingSpec` pins the plan: joining + aggregating the bucketed
  * pair contains zero ShuffleExchange nodes and matches the plain-join
  * results exactly.
  */
object Bucketing {

  val NumBuckets = 8

  /** (session, sfDir) → (ordersTable, customerTable). Keyed per session
    * because `saveAsTable` registers in the session catalog; keyed per
    * dir so different scale factors coexist. The write happens ONCE per
    * key (the production story: the layout is written by the ingest
    * job, queries only ever read it). */
  private val prepared =
    new ConcurrentHashMap[(SparkSession, String), (String, String)]()

  def colocatedOrdersCustomer(spark: SparkSession, dir: String): (String, String) =
    prepared.computeIfAbsent((spark, dir), { case (s, d) =>
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      val pid = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getName.replaceAll("[^A-Za-z0-9]", "")
      val oT = s"bk_orders_$digest"
      val cT = s"bk_customer_$digest"
      val base = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft-bucketed-$digest-$pid").getPath
      if (!s.catalog.tableExists(oT)) {
        graft.core.Tables.load(s, d, "orders")
          .write.bucketBy(NumBuckets, "o_custkey").sortBy("o_custkey")
          .option("path", s"$base/orders").mode("overwrite").saveAsTable(oT)
        graft.core.Tables.load(s, d, "customer")
          .write.bucketBy(NumBuckets, "c_custkey").sortBy("c_custkey")
          .option("path", s"$base/customer").mode("overwrite").saveAsTable(cT)
      }
      (oT, cT)
    })
}
