package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SHALLOW CLONE: metadata-only table copy that borrows the source's
  * data files, then evolves independently. */
class TxCloneSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (String, String, String)*) =
    rows.toSeq.toDF("_docId", "str_databaseid", "payload")

  private def localParquets(dir: String): Seq[String] = {
    val root = new java.io.File(dir)
    if (!root.exists) Seq.empty
    else root.listFiles.filter(d => d.isDirectory && d.getName.contains("="))
      .flatMap(_.listFiles.filter(_.getName.endsWith(".parquet")))
      .map(_.getName).toSeq
  }

  test("clone is metadata-only, reads source rows, and the two tables evolve independently") {
    val src = java.nio.file.Files.createTempDirectory("graft-cl-src").toString
    val dest = java.nio.file.Files.createTempDirectory("graft-cl-dst").toString + "/t"
    TxLog.merge(spark, src,
      docs(("dbA#a1", "dbA", "a1"), ("dbB#b1", "dbB", "b1")))
    val clonedV = TxLog.shallowClone(spark, src, dest)
    assert(clonedV === 0L)
    // zero data bytes copied
    assert(localParquets(dest).isEmpty)
    assert(TxLog.read(spark, dest).select("_docId").as[String]
      .collect().toSet === Set("dbA#a1", "dbB#b1"))
    // writes to the clone never touch the source
    TxLog.merge(spark, dest, docs(("dbA#new", "dbA", "n")))
    assert(TxLog.read(spark, dest).count() === 3)
    assert(TxLog.read(spark, src).count() === 2)
    // writes to the source are invisible to the (pinned) clone
    TxLog.merge(spark, src, docs(("dbB#late", "dbB", "l")))
    assert(!TxLog.read(spark, dest).select("_docId").as[String]
      .collect().contains("dbB#late"))
    // the clone's merge wrote only the NEW key's file locally — both
    // borrowed files survive (file-level victim pruning: a borrowed
    // file that provably holds none of the batch's keys is never
    // copied, so a clone materializes lazily, key range by key range)
    val snap = TxLog.snapshot(spark, dest)
    assert(snap.files.count(_.external.isDefined) == 2,
      s"non-overlapping borrowed files must stay borrowed: ${snap.files}")
    assert(snap.files.exists(f => f.partition == "dbA" && f.external.isEmpty))
    // overwriting a BORROWED row localizes exactly its file
    TxLog.merge(spark, dest, docs(("dbA#a1", "dbA", "a1v2")))
    val snap2 = TxLog.snapshot(spark, dest)
    assert(snap2.files.filter(_.partition == "dbA").forall(_.external.isEmpty))
    assert(snap2.files.filter(_.partition == "dbB").forall(_.external.isDefined))
    assert(TxLog.read(spark, dest).filter(col("_docId") === "dbA#a1")
      .select("payload").as[String].collect().toSeq == Seq("a1v2"))
  }

  test("a full rewrite materializes the clone; vacuum never reaches the source") {
    val src = java.nio.file.Files.createTempDirectory("graft-cl2-src").toString
    val dest = java.nio.file.Files.createTempDirectory("graft-cl2-dst").toString + "/t"
    val df = spark.range(500).select(
      concat(lit("dbA#k"), col("id")).as("_docId"),
      lit("dbA").as("str_databaseid"),
      (col("id") % 97).as("x"))
    TxLog.merge(spark, src, df)
    TxLog.shallowClone(spark, src, dest)
    // OPTIMIZE at the clone rewrites everything locally
    TxLog.optimizeZOrder(spark, dest, Seq("x"), targetRowsPerFile = 200)
    val snap = TxLog.snapshot(spark, dest)
    assert(snap.files.nonEmpty && snap.files.forall(_.external.isEmpty))
    assert(TxLog.read(spark, dest).count() === 500)
    // vacuum the clone aggressively: the borrowed source files are now
    // unreferenced in the clone's head, but they live under the SOURCE
    // root, which the clone's vacuum never lists
    TxLog.vacuum(spark, dest, olderThanMs = 0L)
    assert(TxLog.read(spark, src).count() === 500)
    assert(TxLog.read(spark, dest).count() === 500)
  }

  test("CHECK constraints ride the clone") {
    val src = java.nio.file.Files.createTempDirectory("graft-cl3-src").toString
    val dest = java.nio.file.Files.createTempDirectory("graft-cl3-dst").toString + "/t"
    TxLog.merge(spark, src, docs(("dbA#a1", "dbA", "ok")))
    TxLog.addCheckConstraint(spark, src, "payload_set",
      "payload IS NOT NULL AND length(payload) > 0")
    TxLog.shallowClone(spark, src, dest)
    val bad = Seq(("dbA#a2", "dbA", "")).toDF("_docId", "str_databaseid", "payload")
    val e = intercept[Exception] {
      TxLog.merge(spark, dest, bad)
    }
    assert(e.getMessage.contains("payload_set"))
    assert(TxLog.read(spark, dest).count() === 1)
  }
}
