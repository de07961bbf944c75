package graft.sources

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, In, LessThan}

import graft.SparkSpec

/** The `format("txlog")` DataSource registration: read/write parity
  * with the programmatic TxLog API, time-travel and tag options, and
  * the pushdown contract — filters on the key/partition columns skip
  * files (superset-safe) while Spark re-applies the exact predicate.
  */
class TxLogSourceSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (String, String, String)*) =
    rows.toSeq.toDF("_docId", "str_databaseid", "payload")

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
    df.select("_docId", "payload").as[(String, String)].collect().toSet

  test("format(txlog) read equals TxLog.read; asOfVersion and tag resolve") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ds1").toString
    TxLog.merge(spark, dir, docs(("dbA#a1", "dbA", "v1")))
    TxLog.tag(spark, dir, "first")
    TxLog.merge(spark, dir, docs(("dbA#a1", "dbA", "v2"),
      ("dbB#b1", "dbB", "w1")))
    val head = spark.read.format("txlog").load(dir)
    assert(rowsOf(head) == rowsOf(TxLog.read(spark, dir)))
    val v0 = spark.read.format("txlog")
      .option("asOfVersion", "0").load(dir)
    assert(rowsOf(v0) == Set(("dbA#a1", "v1")))
    val tagged = spark.read.format("txlog").option("tag", "first").load(dir)
    assert(rowsOf(tagged) == Set(("dbA#a1", "v1")))
    intercept[NoSuchElementException] {
      spark.read.format("txlog").option("tag", "nope").load(dir).count()
    }
  }

  test("append merges (LWW upsert), overwrite replaces transactionally") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ds2").toString
    docs(("dbA#a1", "dbA", "v1"), ("dbA#a2", "dbA", "x1"))
      .write.format("txlog").mode(SaveMode.Append).save(dir)
    docs(("dbA#a1", "dbA", "v2")) // same key → update, not duplicate
      .write.format("txlog").mode(SaveMode.Append).save(dir)
    assert(rowsOf(spark.read.format("txlog").load(dir)) ==
      Set(("dbA#a1", "v2"), ("dbA#a2", "x1")))
    val vBefore = TxLog.snapshot(spark, dir).version
    docs(("dbB#b1", "dbB", "fresh"))
      .write.format("txlog").mode(SaveMode.Overwrite).save(dir)
    // full replace in ONE commit: old keys gone, exactly one new version
    assert(rowsOf(spark.read.format("txlog").load(dir)) ==
      Set(("dbB#b1", "fresh")))
    assert(TxLog.snapshot(spark, dir).version == vBefore + 1)
    // time travel still sees the pre-replace table (snapshot isolation)
    assert(rowsOf(spark.read.format("txlog")
      .option("asOfVersion", vBefore.toString).load(dir)) ==
      Set(("dbA#a1", "v2"), ("dbA#a2", "x1")))
  }

  test("key filters derive the footer keyRange; partition filters the partition set") {
    val rel = TxLogRelation(spark.sqlContext, "/tmp/unused", None, None, None,
      "_docId", "str_databaseid")
    assert(rel.keyRangeOf(Array(EqualTo("_docId", "k5"))) ==
      Some(("k5", "k5")))
    assert(rel.keyRangeOf(Array(GreaterThanOrEqual("_docId", "k3"),
      LessThan("_docId", "k7"))).exists { case (lo, hi) =>
        lo == "k3" && hi >= "k7" })
    assert(rel.keyRangeOf(Array(EqualTo("other", "x"))).isEmpty)
    assert(rel.partitionsOf(Array(EqualTo("str_databaseid", "dbA"))) ==
      Some(Set("dbA")))
    assert(rel.partitionsOf(Array(
      In("str_databaseid", Array("dbA", "dbB")),
      EqualTo("str_databaseid", "dbB"))) == Some(Set("dbB")))
    assert(rel.partitionsOf(Array(EqualTo("payload", "x"))).isEmpty)
  }

  test("a partition-filtered scan returns exact rows under pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ds3").toString
    docs(("dbA#a1", "dbA", "pa"), ("dbB#b1", "dbB", "pb"),
      ("dbC#c1", "dbC", "pc"))
      .write.format("txlog").mode(SaveMode.Append).save(dir)
    val got = spark.read.format("txlog").load(dir)
      .filter(col("str_databaseid") === "dbB")
      .select("payload").as[String].collect().toSeq
    assert(got == Seq("pb"))
    // point lookup through the key column: exact row, filter re-applied
    val hit = spark.read.format("txlog").load(dir)
      .filter(col("_docId") === "dbC#c1")
      .select("payload").as[String].collect().toSeq
    assert(hit == Seq("pc"))
    // column pruning: projecting one column yields just that column
    val one = spark.read.format("txlog").load(dir).select("payload")
    assert(one.columns.toSeq == Seq("payload"))
    assert(one.as[String].collect().toSet == Set("pa", "pb", "pc"))
  }

  test("SQL DDL surface: CREATE TABLE USING txlog, SELECT, INSERT INTO/OVERWRITE") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ds4").toString
    docs(("dbA#a1", "dbA", "v1")).write.format("txlog")
      .mode(SaveMode.Append).save(dir)
    spark.sql("DROP TABLE IF EXISTS tx_sql_t")
    spark.sql(
      s"CREATE TABLE tx_sql_t USING txlog OPTIONS (path '$dir')")
    try {
      assert(spark.sql("SELECT payload FROM tx_sql_t")
        .as[String].collect().toSeq == Seq("v1"))
      // INSERT INTO = merge upsert: same key updates, new key appends.
      // Positional inserts follow the TABLE schema, which carries the
      // partition column LAST (TxLog's committed DDL order).
      spark.sql("INSERT INTO tx_sql_t " +
        "SELECT 'dbA#a1' AS _docId, 'v2' AS payload, 'dbA' AS str_databaseid")
      spark.sql("INSERT INTO tx_sql_t " +
        "SELECT 'dbB#b1' AS _docId, 'w1' AS payload, 'dbB' AS str_databaseid")
      assert(rowsOf(spark.table("tx_sql_t")) ==
        Set(("dbA#a1", "v2"), ("dbB#b1", "w1")))
      // INSERT OVERWRITE = one-commit transactional replace
      spark.sql("INSERT OVERWRITE TABLE tx_sql_t " +
        "SELECT 'dbC#c1' AS _docId, 'z' AS payload, 'dbC' AS str_databaseid")
      assert(rowsOf(spark.table("tx_sql_t")) == Set(("dbC#c1", "z")))
    } finally spark.sql("DROP TABLE IF EXISTS tx_sql_t")
  }

  test("writeStream.format(txlog) commits one atomic merge per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ds5").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ds5c").toString
    val in = MemoryStream[(String, String, String)]
    val q = in.toDF().toDF("_docId", "str_databaseid", "payload")
      .writeStream.format("txlog")
      .option("path", dir).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    in.addData(("dbA#a1", "dbA", "v1"), ("dbB#b1", "dbB", "w1"))
    q.awaitTermination(60000)
    assert(rowsOf(spark.read.format("txlog").load(dir)) ==
      Set(("dbA#a1", "v1"), ("dbB#b1", "w1")))
    val v1 = TxLog.snapshot(spark, dir).version
    // second run: an update micro-batch lands as ONE more commit
    val in2 = MemoryStream[(String, String, String)]
    val q2 = in2.toDF().toDF("_docId", "str_databaseid", "payload")
      .writeStream.format("txlog")
      .option("path", dir)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ds5c2").toString)
      .trigger(Trigger.AvailableNow()).start()
    in2.addData(("dbA#a1", "dbA", "v2"))
    q2.awaitTermination(60000)
    assert(rowsOf(spark.read.format("txlog").load(dir)) ==
      Set(("dbA#a1", "v2"), ("dbB#b1", "w1")))
    assert(TxLog.snapshot(spark, dir).version == v1 + 1)
  }

  test("readStream.format(txlog) streams the change feed with version offsets") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft-ds6").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ds6c").toString
    TxLog.merge(spark, dir, docs(("dbA#a1", "dbA", "v1"),
      ("dbB#b1", "dbB", "w1")))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, String, String)]()
    def drain(): Set[(String, String, String)] = {
      val q = spark.readStream.format("txlog").load(dir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("_docId", "payload", "_change_type")
            .as[(String, String, String)](
              org.apache.spark.sql.Encoders.product)
            .collect().foreach(seen.add)
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      import scala.jdk.CollectionConverters._
      seen.asScala.toSet
    }
    // first run: the starting snapshot arrives as inserts
    assert(drain() == Set(("dbA#a1", "v1", "insert"),
      ("dbB#b1", "w1", "insert")))
    // table advances: an update and a delete land as change images
    TxLog.merge(spark, dir, docs(("dbA#a1", "dbA", "v2")),
      Seq("dbB#b1").toDF("_docId"))
    // second run resumes FROM THE CHECKPOINTED VERSION: only the new
    // commit's net changes are emitted (memory sink appends to the
    // first run's rows)
    val afterResume = drain()
    assert(afterResume == Set(
      ("dbA#a1", "v1", "insert"), ("dbB#b1", "w1", "insert"),
      ("dbA#a1", "v1", "update_preimage"),
      ("dbA#a1", "v2", "update_postimage"),
      ("dbB#b1", "w1", "delete")))
  }
}
