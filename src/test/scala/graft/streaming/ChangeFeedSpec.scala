package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.TxLog

class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (String, String, String)*) =
    rows.toSeq.toDF("_docId", "str_databaseid", "payload")

  test("follow: initial load, per-commit changes, restart resumes without redelivery") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cf-table").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cf-ckpt").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, String, String)]() // (loV, hiV, docId, changeType)
    def handler(df: org.apache.spark.sql.DataFrame, lo: Long, hi: Long): Unit =
      df.select(col("_docId"), col("_change_type"))
        .collect().foreach(r => seen.add((lo, hi, r.getString(0), r.getString(1))))

    TxLog.merge(spark, dir, docs(
      ("dbA#a1", "dbA", "v1"), ("dbA#a2", "dbA", "v1")))
    val q1 = ChangeFeed.follow(spark, dir, ckpt)(handler)
    try {
      q1.processAllAvailable()
      // the first batch spans version 0: the committed snapshot arrives
      // as the CDC initial load — every live row an insert
      import scala.jdk.CollectionConverters._
      assert(seen.asScala.toSet == Set(
        (0L, 0L, "dbA#a1", "insert"), (0L, 0L, "dbA#a2", "insert")))
      seen.clear()

      // one commit carrying an update, a delete, and an insert
      TxLog.merge(spark, dir,
        docs(("dbA#a1", "dbA", "v2"), ("dbB#b1", "dbB", "w1")),
        Seq("dbA#a2").toDF("_docId"))
      q1.processAllAvailable()
      val batch2 = seen.asScala.toSet
      assert(batch2 == Set(
        (1L, 1L, "dbA#a1", "update_preimage"),
        (1L, 1L, "dbA#a1", "update_postimage"),
        (1L, 1L, "dbA#a2", "delete"),
        (1L, 1L, "dbB#b1", "insert")), s"got $batch2")
      seen.clear()
    } finally q1.stop()

    // a commit lands while the follower is DOWN; the restarted follower
    // resumes from its checkpoint — delivers exactly that commit, no
    // redelivery of versions 0-1
    TxLog.merge(spark, dir, docs(("dbB#b2", "dbB", "w2")))
    val q2 = ChangeFeed.follow(spark, dir, ckpt)(handler)
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(seen.asScala.toSet == Set((2L, 2L, "dbB#b2", "insert")))
      seen.clear()
      // idle poll delivers nothing
      q2.processAllAvailable()
      assert(seen.isEmpty)
    } finally q2.stop()
  }

  test("a handler failure is redelivered after restart (at-least-once sink contract)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cf-alo").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cf-alock").toString
    TxLog.merge(spark, dir, docs(("dbA#a1", "dbA", "v1")))
    val delivered = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    @volatile var fail = true
    def handler(df: org.apache.spark.sql.DataFrame, lo: Long, hi: Long): Unit = {
      if (fail) throw new RuntimeException("sink down")
      df.count() // consume
      delivered.add(hi)
    }
    // the failing batch kills the query BEFORE the checkpoint commits
    val q1 = ChangeFeed.follow(spark, dir, ckpt)(handler)
    intercept[Exception] { q1.processAllAvailable() }
    q1.stop()
    assert(delivered.isEmpty)
    // restart: the uncommitted batch is REDELIVERED, nothing skipped
    fail = false
    val q2 = ChangeFeed.follow(spark, dir, ckpt)(handler)
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(delivered.asScala.toSeq == Seq(0L))
    } finally q2.stop()
  }

  test("a follower lagging below the vacuum horizon fails loud and recovers via fresh checkpoint") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cf-vac").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cf-vacck").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, String, String)]()
    def handler(df: org.apache.spark.sql.DataFrame, lo: Long, hi: Long): Unit =
      df.select(col("_docId"), col("_change_type"))
        .collect().foreach(r => seen.add((lo, hi, r.getString(0), r.getString(1))))

    // the follower processes version 0, then goes DOWN
    TxLog.merge(spark, dir, docs(("dbA#a1", "dbA", "v1")))
    val q1 = ChangeFeed.follow(spark, dir, ckpt)(handler)
    try { q1.processAllAvailable() } finally q1.stop()
    seen.clear()

    // while it is down: the table keeps moving (v1 rewrites a1, v2
    // inserts b1) and maintenance vacuums with ZERO grace — v1's
    // rewrite supersedes v0's file, so vacuum deletes it and records
    // the horizon at the head
    TxLog.merge(spark, dir, docs(("dbA#a1", "dbA", "v2")))
    TxLog.merge(spark, dir, docs(("dbB#b1", "dbB", "w1")))
    TxLog.vacuum(spark, dir, olderThanMs = 0L)
    assert(TxLog.vacuumHorizon(spark, dir) == 2L)

    // the restarted follower's span (1,2) needs snapshotAt(0) as the
    // change base — below the horizon: the documented clean diagnostic,
    // at resolve time, not a FileNotFoundException mid-scan
    val q2 = ChangeFeed.follow(spark, dir, ckpt)(handler)
    val e = intercept[Exception] { q2.processAllAvailable() }
    q2.stop()
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ rootMessages(x.getCause))
    assert(rootMessages(e).exists(_.contains("vacuumed (horizon")),
      rootMessages(e).mkString(" | "))
    assert(seen.isEmpty)

    // recovery contract: a FRESH checkpoint re-initial-loads — the
    // current snapshot arrives as inserts, and the feed is live again
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-cf-vacck2").toString
    val q3 = ChangeFeed.follow(spark, dir, ckpt2)(handler)
    try {
      q3.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(seen.asScala.toSet == Set(
        (0L, 2L, "dbA#a1", "insert"), (0L, 2L, "dbB#b1", "insert")))
      seen.clear()
      TxLog.merge(spark, dir, docs(("dbB#b2", "dbB", "w2")))
      q3.processAllAvailable()
      assert(seen.asScala.toSet == Set((3L, 3L, "dbB#b2", "insert")))
    } finally q3.stop()
  }

  test("follow drives the doc-table consumers: TextIndex stays in sync via the feed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cf-idx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cf-idxck").toString
    val idx = java.nio.file.Files.createTempDirectory("graft-cf-idxloc").toString
    TxLog.merge(spark, dir, docs(("dbA#a1", "dbA", "walrus colony")))
    graft.query.TextIndex.manage(spark, dir, "payload", idx)
    @volatile var cursor = TxLog.snapshot(spark, dir).version
    val q = ChangeFeed.follow(spark, dir, ckpt) { (_, _, hi) =>
      // the feed's version span is the index-sync cursor contract
      cursor = graft.query.TextIndex.syncTx(spark, dir, "payload", cursor)
      assert(cursor == hi)
    }
    try {
      q.processAllAvailable()
      TxLog.merge(spark, dir, docs(("dbA#a2", "dbA", "quokka habitat")))
      q.processAllAvailable()
      val hits = graft.query.TextIndex
        .prunedSearch(spark, dir, "payload", "*quokka*")
        .select("_docId").as[String].collect().toSet
      assert(hits == Set("dbA#a2"))
      assert(cursor == TxLog.snapshot(spark, dir).version)
    } finally q.stop()
  }
}
