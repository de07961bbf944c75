package graft

import org.apache.spark.sql.SparkSession

/** Dev-only single-query timing harness (same session config as Bench). */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-micro")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // same instrument as Bench (AQE off unless SPARK_GRAFT_AQE) so
      // micro timings predict bench rows — see ScaleSmoke's note
      .config("spark.sql.adaptive.enabled",
        sys.env.get("SPARK_GRAFT_AQE")
          .exists(v => Set("true", "1", "yes")(v.toLowerCase)).toString)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var jobCounts: Option[(java.util.concurrent.atomic.AtomicInteger,
      java.util.concurrent.atomic.AtomicInteger,
      java.util.concurrent.atomic.AtomicInteger)] = None
    val noClear = args.contains("-nc")
    // -jobs: per-pass Spark job/stage/task counts (dev attribution of
    // the fixed per-query cost — which floor queries pay extra actions)
    if (args.contains("-jobs")) {
      val jobs = new java.util.concurrent.atomic.AtomicInteger()
      val stages = new java.util.concurrent.atomic.AtomicInteger()
      val tasks = new java.util.concurrent.atomic.AtomicInteger()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobs.incrementAndGet(); ()
          }
          override def onStageCompleted(
              s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            stages.incrementAndGet()
            tasks.addAndGet(s.stageInfo.numTasks); ()
          }
        })
      jobCounts = Some((jobs, stages, tasks))
    }
    // -noop: materialize via a noop write (every row, every column —
    // ScaleSmoke's action) instead of count() (which lets the optimizer
    // prune the output projection and eliminate the final sort)
    val noop = args.contains("-noop")
    val rest = args.filterNot(a => a == "-nc" || a == "-noop" || a == "-jobs")
    val sf = rest.headOption.getOrElse("/root/testdata/sf0.1")
    rest.drop(1).foreach { q =>
      (1 to 3).foreach { p =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, sf)
        if (noop) df.write.mode("overwrite").format("noop").save()
        else df.count()
        val jc = jobCounts.map { case (j, st, tk) =>
          val line = s" jobs=${j.get} stages=${st.get} tasks=${tk.get}"
          j.set(0); st.set(0); tk.set(0)
          line
        }.getOrElse("")
        println(f"MICRO $q pass$p ${(System.nanoTime() - t0) / 1e9}%.3f$jc")
        if (!noClear) { spark.sharedState.cacheManager.clearCache(); System.gc() }
      }
    }
    spark.stop()
  }
}
