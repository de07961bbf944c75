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
    val noClear = args.contains("-nc")
    // -noop: materialize via a noop write (every row, every column —
    // ScaleSmoke's action) instead of count() (which lets the optimizer
    // prune the output projection and eliminate the final sort)
    val noop = args.contains("-noop")
    val rest = args.filterNot(a => a == "-nc" || a == "-noop")
    val sf = rest.headOption.getOrElse("/root/testdata/sf0.1")
    rest.drop(1).foreach { q =>
      (1 to 3).foreach { p =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, sf)
        if (noop) df.write.mode("overwrite").format("noop").save()
        else df.count()
        println(f"MICRO $q pass$p ${(System.nanoTime() - t0) / 1e9}%.3f")
        if (!noClear) { spark.sharedState.cacheManager.clearCache(); System.gc() }
      }
    }
    spark.stop()
  }
}
