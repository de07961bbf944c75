package graft.llmops

/** Forked-JVM maintenance loop for the CROSS-PROCESS band-store race
  * spec ([[BandStoreRaceSpec]]): a genuinely external process churning
  * the same store through replay appends + compact/vacuum cycles while
  * the parent probes it — the snapshot-isolation claim an in-JVM
  * thread race cannot falsify (threads share the JVM's file handles;
  * two processes share only the filesystem). Writes a ready marker
  * once its session is up so the parent can synchronize the contention
  * window, then runs `n` (append replay → optimize) rounds and exits 0
  * on success. */
object BandRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(store, sigsPath, nStr, readyPath) = args
    val n = nStr.toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-band-race-child")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val sigs = spark.read.parquet(sigsPath)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(readyPath), "up".getBytes("UTF-8"))
      (0 until n).foreach { _ =>
        // replay append: content-identical rows (result-invisible by
        // the store's replay contract), keeps compaction non-trivial
        IncrementalDedup.mergeSignatures(spark, store, sigs)
        // compact + vacuum at the DEFAULT retention (the production
        // maintenance loop); commits race the parent's probes
        IncrementalDedup.optimize(spark, store)
      }
    } finally spark.stop()
    sys.exit(0)
  }
}
