package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TxLogStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("txstats").toString
    val rows = Seq(
      ("p1#001", "p1", 10L), ("p1#002", "p1", 20L), ("p1#003", "p1", 5L),
      ("p2#001", "p2", 7L), ("p2#002", "p2", 9L))
      .toDF("_docId", "part", "v")
    TxLog.merge(spark, dir, rows, partitionCol = "part")
    dir
  }

  test("stats aggregate matches the expensive scan after write, merge, optimize") {
    val dir = freshTable()
    def scanCounts() = TxLog.read(spark, dir).groupBy("part")
      .agg(count(lit(1)).as("n"), min("_docId").as("mn"), max("_docId").as("mx"))
      .as[(String, Long, String, String)].collect().sortBy(_._1).toSeq
    def statCounts() = TxLog.statsAggregate(spark, dir).get
      .map(p => (p.partition, p.rows, p.minKey.get, p.maxKey.get))
    assert(statCounts() == scanCounts())
    // upsert one row + insert one new key, then re-check
    TxLog.merge(spark, dir,
      Seq(("p1#002", "p1", 99L), ("p2#003", "p2", 1L)).toDF("_docId", "part", "v"),
      partitionCol = "part")
    assert(statCounts() == scanCounts())
    assert(statCounts().map(_._2).sum == 6)
    TxLog.compact(spark, dir, partitionCol = "part")
    assert(statCounts() == scanCounts())
  }

  test("stats answer without opening a single data file") {
    val dir = freshTable()
    val before = TxLog.statsAggregate(spark, dir).get
    // destroy every data file; only the log remains
    val root = new java.io.File(dir)
    def parquets(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(parquets)
      else if (f.getName.endsWith(".parquet") && !f.getPath.contains("_txlog"))
        Seq(f)
      else Seq.empty
    val dataFiles = parquets(root)
    assert(dataFiles.nonEmpty)
    dataFiles.foreach(f => assert(f.delete()))
    assert(TxLog.statsAggregate(spark, dir).get == before)
  }

  test("partition pruning and time travel apply to the stats path") {
    val dir = freshTable()
    val v1 = TxLog.snapshot(spark, dir).version
    TxLog.merge(spark, dir,
      Seq(("p1#009", "p1", 1L)).toDF("_docId", "part", "v"), partitionCol = "part")
    val only = TxLog.statsAggregate(spark, dir, partitions = Some(Set("p2"))).get
    assert(only.map(_.partition) == Seq("p2") && only.head.rows == 2)
    val past = TxLog.statsAggregate(spark, dir, asOfVersion = Some(v1)).get
    assert(past.map(_.rows).sum == 5)
    assert(TxLog.statsAggregate(spark, dir).get.map(_.rows).sum == 6)
  }

  test("deleteWhere removes exactly the matching rows, transactionally") {
    val dir = freshTable()
    val n = TxLog.deleteWhere(spark, dir, col("v") >= 9L, partitionCol = "part")
    assert(n == 3) // 20, 10, 9
    val left = TxLog.read(spark, dir).select("_docId").as[String].collect().sorted
    assert(left.toSeq == Seq("p1#003", "p2#001"))
    // stats stay consistent after the predicate delete
    assert(TxLog.statsAggregate(spark, dir).get.map(_.rows).sum == 2)
    // a no-match predicate commits nothing (version unchanged)
    val v = TxLog.snapshot(spark, dir).version
    assert(TxLog.deleteWhere(spark, dir, col("v") > 1000L, partitionCol = "part") == 0)
    assert(TxLog.snapshot(spark, dir).version == v)
    // the change feed shows the deletes as row-level deletes
    val feed = TxLog.changes(spark, dir, v - 1, v, keyCol = "_docId")
    assert(feed.filter(col("_change_type") === "delete").count() == 3)
  }

  test("a file without row stats fails safe to None, not a wrong count") {
    val dir = freshTable()
    assert(TxLog.statsAggregate(spark, dir).isDefined)
    // forge a legacy commit (pre-stats writer): rows = -1
    val v = TxLog.snapshot(spark, dir).version + 1
    val legacy = new java.io.File(dir,
      f"_txlog/$v%020d.json")
    Files.writeString(legacy.toPath,
      """{"adds":[{"path":"part=p1/legacy.parquet","partition":"p1","rows":-1}],"removes":[]}""")
    assert(TxLog.statsAggregate(spark, dir).isEmpty,
      "a stats-less live file must disable the metadata-only answer")
    // pruning to an unaffected partition restores the fast path
    val p2 = TxLog.statsAggregate(spark, dir, partitions = Some(Set("p2")))
    assert(p2.isDefined && p2.get.map(_.rows).sum == 2)
  }
}
