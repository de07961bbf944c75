package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.TxLog

/** Expect-or-quarantine: clean rows flow, violating rows are routed to
  * a replayable quarantine table with the violated rule names. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (String, String, String, Long)*) =
    rows.toSeq.toDF("_docId", "str_databaseid", "body", "n")

  private val rules = Map(
    "nonempty_body" -> "length(body) > 0",
    "n_positive" -> "n > 0")

  test("split: every rule evaluates in one pass, NULL fails closed") {
    val batch = Seq(
      ("p1#1", "p1", "ok", 5L),
      ("p1#2", "p1", "", 5L),         // nonempty_body fails
      ("p1#3", "p1", "ok", -2L),      // n_positive fails
      ("p1#4", "p1", "", 0L))         // both fail
      .toDF("_docId", "str_databaseid", "body", "n")
      // a NULL body must quarantine, not pass (fail-closed)
      .unionByName(Seq(("p1#5", "p1", 1L)).toDF("_docId", "str_databaseid", "n")
        .withColumn("body", lit(null).cast("string"))
        .select("_docId", "str_databaseid", "body", "n"))
    val r = Expectations.split(batch, rules, batchId = 7L)
    assert(r.pass.select("_docId").as[String].collect().toSet == Set("p1#1"))
    val q = r.quarantined
      .select("_docId", "_violated", "_batch_id")
      .as[(String, String, Long)].collect()
      .map { case (k, v, b) => k -> ((v, b)) }.toMap
    assert(q("p1#2") == (("nonempty_body", 7L)))
    assert(q("p1#3") == (("n_positive", 7L)))
    assert(q("p1#4") == (("n_positive,nonempty_body", 7L)))
    assert(q("p1#5")._1 == "nonempty_body")
  }

  test("enforce: clean rows returned, violations land atomically, replay converges") {
    val qdir = java.nio.file.Files.createTempDirectory("graft-exq").toString
    val main = java.nio.file.Files.createTempDirectory("graft-exm").toString
    val batch = docs(
      ("p1#1", "p1", "ok", 5L), ("p1#2", "p1", "", 5L),
      ("p2#1", "p2", "also", 1L))
    val clean = Expectations.enforce(spark, qdir, batch, rules, batchId = 1L)
    TxLog.merge(spark, main, clean)
    assert(TxLog.read(spark, main).count() == 2)
    assert(TxLog.read(spark, qdir).select("_docId").as[String]
      .collect().toSeq == Seq("p1#2"))
    // at-least-once redelivery: the same batch re-enforced changes nothing
    val clean2 = Expectations.enforce(spark, qdir, batch, rules, batchId = 1L)
    TxLog.merge(spark, main, clean2)
    assert(TxLog.read(spark, main).count() == 2)
    assert(TxLog.read(spark, qdir).count() == 1)
    // an operator fixes the quarantined row and re-merges it
    val fixed = TxLog.read(spark, qdir)
      .withColumn("body", lit("repaired"))
      .select("_docId", "str_databaseid", "body", "n")
    TxLog.merge(spark, main, Expectations.enforce(spark, qdir, fixed, rules))
    assert(TxLog.read(spark, main).count() == 3)
  }

  test("a clean batch writes nothing to the quarantine table") {
    val qdir = java.nio.file.Files.createTempDirectory("graft-exq2").toString
    val clean = Expectations.enforce(spark, qdir,
      docs(("p1#1", "p1", "ok", 1L)), rules)
    assert(clean.count() == 1)
    assert(!TxLog.isTable(spark, qdir), "empty quarantine got a commit")
  }
}
