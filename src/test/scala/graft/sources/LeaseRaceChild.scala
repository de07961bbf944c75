package graft.sources

/** Forked-JVM writer for the CROSS-PROCESS lease race spec: a genuinely
  * external process contending on the same TxLog table through
  * [[LeaseFileCoordinator]] — the O_EXCL-across-JVMs claim an in-JVM
  * thread race cannot falsify (threads share the JVM's file handles and
  * memory model; two processes share only the filesystem). Writes a
  * `_child.ready` marker once its session is up so the parent can
  * synchronize the contention window, then merges `k` rows and exits 0
  * on success. */
object LeaseRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(dir, db, kStr) = args
    val k = kStr.toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-lease-child-$db")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      TxLog.setCoordinator(dir, new LeaseFileCoordinator())
      import spark.implicits._
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "_child.ready"),
        "up".getBytes("UTF-8"))
      (0 until k).foreach { i =>
        TxLog.merge(spark, dir,
          Seq((s"$db#k$i", db, s"$db-v$i"))
            .toDF("_docId", "str_databaseid", "payload"))
      }
    } finally spark.stop()
    sys.exit(0)
  }
}
