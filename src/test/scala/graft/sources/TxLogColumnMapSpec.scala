package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Column mapping: RENAME/DROP COLUMN as metadata-only commits — no
  * data file is rewritten, reads surface logical names, merges
  * translate back, stale writers refuse, and the mapping is versioned
  * state (time travel below the rename shows the old name). */
class TxLogColumnMapSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (String, String, String, Long)*) =
    rows.toSeq.toDF("_docId", "str_databaseid", "payload", "v")

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("txcolmap").toString
    TxLog.merge(spark, dir, docs(
      ("p1#001", "p1", "a", 1L), ("p1#002", "p1", "b", 2L),
      ("p2#001", "p2", "c", 3L)))
    dir
  }

  private def parquets(dir: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet") &&
        !f.getPath.contains("_txlog")) Seq(f) else Seq.empty
    walk(new java.io.File(dir)).map(_.getPath).toSet
  }

  test("rename is metadata-only: logical read, intact values, zero file churn") {
    val dir = freshTable()
    val before = parquets(dir)
    val v0 = TxLog.snapshot(spark, dir).version
    TxLog.renameColumn(spark, dir, "payload", "body")
    assert(parquets(dir) == before, "rename rewrote data files")
    assert(TxLog.snapshot(spark, dir).version == v0 + 1)
    val df = TxLog.read(spark, dir)
    assert(df.columns.contains("body") && !df.columns.contains("payload"))
    assert(df.select("_docId", "body").as[(String, String)].collect().toSet ==
      Set(("p1#001", "a"), ("p1#002", "b"), ("p2#001", "c")))
    // time travel BELOW the rename shows the old name — versioned state
    val old = TxLog.read(spark, dir, asOfVersion = Some(v0))
    assert(old.columns.contains("payload") && !old.columns.contains("body"))
  }

  test("merge speaks the logical name; the stale physical name refuses") {
    val dir = freshTable()
    TxLog.renameColumn(spark, dir, "payload", "body")
    TxLog.merge(spark, dir, Seq(("p1#001", "p1", "a2", 9L))
      .toDF("_docId", "str_databaseid", "body", "v"))
    val rows = TxLog.read(spark, dir)
      .select("_docId", "body", "v").as[(String, String, Long)]
      .collect().map { case (k, b, v) => k -> ((b, v)) }.toMap
    assert(rows("p1#001") == (("a2", 9L)))
    assert(rows("p1#002") == (("b", 2L))) // old-file row under logical name
    val e = intercept[IllegalArgumentException] {
      TxLog.merge(spark, dir, Seq(("p1#003", "p1", "x", 1L))
        .toDF("_docId", "str_databaseid", "payload", "v"))
    }
    assert(e.getMessage.contains("renamed"), e.getMessage)
  }

  test("chained renames collapse; renaming back to the physical name unmaps") {
    val dir = freshTable()
    TxLog.renameColumn(spark, dir, "payload", "body")
    TxLog.renameColumn(spark, dir, "body", "text")
    assert(TxLog.snapshot(spark, dir).colMap == Map("payload" -> "text"))
    TxLog.renameColumn(spark, dir, "text", "payload")
    assert(TxLog.snapshot(spark, dir).colMap.isEmpty)
    assert(TxLog.read(spark, dir).columns.contains("payload"))
  }

  test("renaming onto another column's live PHYSICAL name refuses") {
    val dir = freshTable()
    // free the logical name "payload" while physical field `payload`
    // stays in the stored schema forever
    TxLog.renameColumn(spark, dir, "payload", "body")
    // {v -> payload} would make applyColMap's map {payload -> body,
    // v -> payload} collide on the still-present physical `payload`
    // (x,y rename-shuffle corruption) — must refuse
    val e = intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, dir, "v", "payload")
    }
    assert(e.getMessage.contains("physical"), e.getMessage)
    // renaming `body` back onto ITS OWN physical name stays allowed
    TxLog.renameColumn(spark, dir, "body", "payload")
    assert(TxLog.snapshot(spark, dir).colMap.isEmpty)
    // and the table still reads exactly
    assert(TxLog.read(spark, dir).select("_docId", "payload", "v")
      .as[(String, String, Long)].collect().toSet ==
      Set(("p1#001", "a", 1L), ("p1#002", "b", 2L), ("p2#001", "c", 3L)))
  }

  test("mapping survives checkpoints and rides the change feed") {
    val dir = freshTable()
    TxLog.renameColumn(spark, dir, "payload", "body")
    val vRename = TxLog.snapshot(spark, dir).version
    // push past a checkpoint interval with ordinary merges
    (1 to TxLog.CheckpointInterval + 1).foreach { i =>
      TxLog.merge(spark, dir, Seq((s"p1#c$i", "p1", s"x$i", i.toLong))
        .toDF("_docId", "str_databaseid", "body", "v"))
    }
    val snap = TxLog.snapshot(spark, dir)
    assert(snap.colMap == Map("payload" -> "body"))
    assert(TxLog.read(spark, dir).columns.contains("body"))
    // change feed across post-rename commits speaks the logical name
    val feed = TxLog.changes(spark, dir, vRename, snap.version)
    assert(feed.columns.contains("body") && !feed.columns.contains("payload"))
    assert(feed.filter(col("_change_type") === "insert").count() ==
      TxLog.CheckpointInterval + 1)
  }

  test("drop column hides it without touching files; compact keeps logical reads") {
    val dir = freshTable()
    val before = parquets(dir)
    TxLog.renameColumn(spark, dir, "payload", "body")
    TxLog.dropColumn(spark, dir, "v")
    assert(parquets(dir) == before, "drop rewrote data files")
    val df = TxLog.read(spark, dir)
    assert(!df.columns.contains("v") && df.columns.contains("body"))
    assert(df.count() == 3)
    // a physical rewrite (compact) after rename+drop stays consistent
    TxLog.compact(spark, dir)
    val df2 = TxLog.read(spark, dir)
    assert(!df2.columns.contains("v") && df2.columns.contains("body"))
    assert(df2.select("_docId", "body").as[(String, String)].collect().toSet ==
      Set(("p1#001", "a"), ("p1#002", "b"), ("p2#001", "c")))
  }

  test("shallow clone carries the mapping; key/partition renames refuse at merge") {
    val dir = freshTable()
    TxLog.renameColumn(spark, dir, "payload", "body")
    val clone = Files.createTempDirectory("txcolmap-clone").toString + "/t"
    TxLog.shallowClone(spark, dir, clone)
    assert(TxLog.read(spark, clone).columns.contains("body"))
    // renaming the partition column commits, but the next merge refuses
    // — via the stale-writer guard under the old name, or via the
    // key/partition guard under the new one
    TxLog.renameColumn(spark, dir, "str_databaseid", "dbid")
    val eOld = intercept[IllegalArgumentException] {
      TxLog.merge(spark, dir, Seq(("p1#009", "p1", "z", 1L))
        .toDF("_docId", "str_databaseid", "body", "v"))
    }
    assert(eOld.getMessage.contains("renamed"), eOld.getMessage)
    val eNew = intercept[IllegalArgumentException] {
      TxLog.merge(spark, dir, Seq(("p1#009", "p1", "z", 1L))
        .toDF("_docId", "dbid", "body", "v"), partitionCol = "dbid")
    }
    assert(eNew.getMessage.contains("key/partition"), eNew.getMessage)
    // renaming it back restores writability
    TxLog.renameColumn(spark, dir, "dbid", "str_databaseid")
    TxLog.merge(spark, dir, Seq(("p1#009", "p1", "z", 1L))
      .toDF("_docId", "str_databaseid", "body", "v"))
    assert(TxLog.read(spark, dir).count() == 4)
  }
}
