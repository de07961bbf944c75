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

  test("merge with a stale expectedVersion refuses instead of restaging") {
    val dir = freshTable()
    val v0 = TxLog.snapshot(spark, dir).version
    // another writer moves the head
    TxLog.merge(spark, dir,
      Seq(("p1#009", "p1", 1L)).toDF("_docId", "part", "v"),
      partitionCol = "part")
    intercept[TxLog.ConcurrentCommitException] {
      TxLog.merge(spark, dir,
        Seq(("p1#010", "p1", 2L)).toDF("_docId", "part", "v"),
        partitionCol = "part", expectedVersion = Some(v0))
    }
    // the refused merge left no commit behind
    assert(TxLog.snapshot(spark, dir).version == v0 + 1)
    assert(TxLog.read(spark, dir).filter(col("_docId") === "p1#010").count() == 0)
  }

  test("deleteWhere is serializable: a concurrent un-matching update is never clobbered") {
    // T1 deletes WHERE v = 10; T2 updates the only matching row to v = 11.
    // Serializable outcomes: delete-then-update (row re-upserted, v=11)
    // or update-then-delete (predicate re-evaluated, no match, v=11).
    // The old snapshot-isolation delete allowed a third, NON-serial
    // outcome — stale victim list applied after the update (row gone).
    (1 to 5).foreach { round =>
      val dir = Files.createTempDirectory(s"txser$round").toString
      TxLog.merge(spark, dir,
        Seq(("p1#001", "p1", 10L)).toDF("_docId", "part", "v"),
        partitionCol = "part")
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val gate = new java.util.concurrent.CountDownLatch(1)
      val t1 = new Thread(() => try { gate.await()
        TxLog.deleteWhere(spark, dir, col("v") === 10L, partitionCol = "part")
        () } catch { case t: Throwable => errs.add(t) })
      val t2 = new Thread(() => try { gate.await()
        TxLog.merge(spark, dir,
          Seq(("p1#001", "p1", 11L)).toDF("_docId", "part", "v"),
          partitionCol = "part") } catch { case t: Throwable => errs.add(t) })
      t1.start(); t2.start(); gate.countDown()
      t1.join(120000); t2.join(120000)
      assert(errs.isEmpty, errs.toString)
      val rows = TxLog.read(spark, dir).select("_docId", "v")
        .as[(String, Long)].collect().toSeq
      assert(rows == Seq(("p1#001", 11L)),
        s"round $round: non-serializable state $rows")
    }
  }

  test("updateWhere applies SET over the OLD row, transactionally, feed-visible") {
    val dir = freshTable()
    val vBefore = TxLog.snapshot(spark, dir).version
    val n = TxLog.updateWhere(spark, dir, col("v") >= 9L,
      Seq("v" -> (col("v") + 1L)), partitionCol = "part")
    assert(n == 3) // 20, 10, 9
    val vs = TxLog.read(spark, dir).select("_docId", "v")
      .as[(String, Long)].collect().toMap
    assert(vs == Map("p1#001" -> 11L, "p1#002" -> 21L, "p1#003" -> 5L,
      "p2#001" -> 7L, "p2#002" -> 10L))
    // untouched partition-less rows intact; no-match commits nothing
    val v = TxLog.snapshot(spark, dir).version
    assert(v == vBefore + 1)
    assert(TxLog.updateWhere(spark, dir, col("v") > 1000L,
      Seq("v" -> lit(0L)), partitionCol = "part") == 0)
    assert(TxLog.snapshot(spark, dir).version == v)
    // the change feed shows the rewrite as row-level updates
    val feed = TxLog.changes(spark, dir, vBefore, v, keyCol = "_docId")
    assert(feed.filter(col("_change_type") === "update_postimage")
      .count() == 3)
    // SET on the key/partition column refuses loudly
    intercept[IllegalArgumentException] {
      TxLog.updateWhere(spark, dir, lit(true),
        Seq("_docId" -> lit("x")), partitionCol = "part")
    }
  }

  test("updateWhere is serializable under a concurrent un-matching update") {
    // T1: updateWhere(v = 10 → flag 'hit'); T2: merge(v = 10 → 99).
    // Serializable outcomes both end with flag unset only if T2 ran
    // first AND T1 re-evaluated (v=99 no longer matches) — flag 'hit'
    // with v=10+1=11 means T1 first, then T2's 99 overwrote v. The
    // forbidden (stale) outcome is flag 'hit' AND v = 100: T1 applying
    // over T2's committed row without re-reading it.
    (1 to 5).foreach { round =>
      val dir = Files.createTempDirectory(s"txupd$round").toString
      TxLog.merge(spark, dir,
        Seq(("p1#001", "p1", 10L, "clean")).toDF("_docId", "part", "v", "flag"),
        partitionCol = "part")
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val gate = new java.util.concurrent.CountDownLatch(1)
      val t1 = new Thread(() => try { gate.await()
        TxLog.updateWhere(spark, dir, col("v") === 10L,
          Seq("v" -> (col("v") + 1L), "flag" -> lit("hit")),
          partitionCol = "part")
        () } catch { case t: Throwable => errs.add(t) })
      val t2 = new Thread(() => try { gate.await()
        TxLog.merge(spark, dir,
          Seq(("p1#001", "p1", 99L, "clean")).toDF("_docId", "part", "v", "flag"),
          partitionCol = "part") } catch { case t: Throwable => errs.add(t) })
      t1.start(); t2.start(); gate.countDown()
      t1.join(120000); t2.join(120000)
      assert(errs.isEmpty, errs.toString)
      val rows = TxLog.read(spark, dir).select("_docId", "v", "flag")
        .as[(String, Long, String)].collect().toSeq
      assert(rows.length == 1)
      val (_, vFinal, flag) = rows.head
      // every serial order ends (99, clean): T2's whole-row merge is
      // last, or T1 re-evaluates after T2 and no longer matches. The
      // forbidden stale outcome is (11, 'hit') — T1 applying its
      // pre-T2 read AFTER T2's commit (the write skew expectedVersion
      // eliminates)
      assert((vFinal, flag) == ((99L, "clean")),
        s"round $round: non-serializable state ($vFinal, $flag)")
    }
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
