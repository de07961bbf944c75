package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CHECK constraints on TxLog tables: existing-row validation at ADD,
  * batch validation at every merge (violating batches change nothing),
  * NULL-is-violation semantics, drop, checkpoint survival, and
  * enforcement through the format("txlog") write path.
  */
class TxLogConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (String, String, Int)*) =
    rows.toSeq.toDF("_docId", "str_databaseid", "qty")

  test("add validates existing rows; merges are gated; drop lifts the gate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ck1").toString
    TxLog.merge(spark, dir, docs(("dbA#a1", "dbA", 5), ("dbA#a2", "dbA", 9)))
    // existing rows violate → refused, nothing committed
    val v0 = TxLog.snapshot(spark, dir).version
    intercept[IllegalArgumentException] {
      TxLog.addCheckConstraint(spark, dir, "qty_big", "qty > 6")
    }
    assert(TxLog.snapshot(spark, dir).version == v0)
    assert(TxLog.snapshot(spark, dir).constraints.isEmpty)
    // a satisfiable constraint lands as a metadata-only commit
    TxLog.addCheckConstraint(spark, dir, "qty_pos", "qty > 0")
    val snap = TxLog.snapshot(spark, dir)
    assert(snap.version == v0 + 1)
    assert(snap.constraints == Map("qty_pos" -> "qty > 0"))
    assert(snap.files.map(_.path).toSet ==
      TxLog.snapshotAt(spark, dir, v0).files.map(_.path).toSet)
    // violating batch: loud failure, table untouched (version AND rows)
    val before = TxLog.read(spark, dir).select("_docId", "qty")
      .as[(String, Int)].collect().toSet
    intercept[IllegalArgumentException] {
      TxLog.merge(spark, dir, docs(("dbA#a3", "dbA", 0)))
    }
    assert(TxLog.snapshot(spark, dir).version == v0 + 1)
    assert(TxLog.read(spark, dir).select("_docId", "qty")
      .as[(String, Int)].collect().toSet == before)
    // satisfying batch passes
    TxLog.merge(spark, dir, docs(("dbA#a3", "dbA", 7)))
    assert(TxLog.read(spark, dir).count() == 3)
    // drop → the previously-violating batch is accepted
    TxLog.dropCheckConstraint(spark, dir, "qty_pos")
    assert(TxLog.snapshot(spark, dir).constraints.isEmpty)
    TxLog.merge(spark, dir, docs(("dbA#a4", "dbA", 0)))
    assert(TxLog.read(spark, dir).count() == 4)
  }

  test("timestamp time travel resolves the newest commit at-or-before ts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ts1").toString
    TxLog.merge(spark, dir, docs(("dbA#a1", "dbA", 1)))
    // commit mtimes have second-ish granularity on some filesystems —
    // separate the two commits by a comfortable margin
    Thread.sleep(1100)
    val between = System.currentTimeMillis()
    Thread.sleep(1100)
    TxLog.merge(spark, dir, docs(("dbA#a1", "dbA", 2)))
    assert(TxLog.versionAt(spark, dir, between) == 0L)
    assert(TxLog.versionAt(spark, dir, System.currentTimeMillis()) == 1L)
    assert(TxLog.readAsOfTimestamp(spark, dir, between)
      .select("qty").as[Int].collect().toSeq == Seq(1))
    // the format option resolves the same way
    assert(spark.read.format("txlog")
      .option("timestampAsOf", between.toString).load(dir)
      .select("qty").as[Int].collect().toSeq == Seq(1))
    // before the first commit: no table state existed — loud failure
    intercept[IllegalArgumentException] {
      TxLog.versionAt(spark, dir, 1000L)
    }
  }

  test("NULL satisfies a CHECK (SQL semantics); explicit NOT NULL still gates") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ck2").toString
    TxLog.merge(spark, dir, docs(("dbA#a1", "dbA", 1)))
    TxLog.addCheckConstraint(spark, dir, "qty_pos", "qty > 0")
    // a NULL-valued expression is UNKNOWN, not FALSE → the row passes
    val withNull = Seq(("dbA#a2", "dbA", null.asInstanceOf[Integer]))
      .toDF("_docId", "str_databaseid", "qty")
    TxLog.merge(spark, dir, withNull)
    assert(TxLog.read(spark, dir).count() == 2)
    // and the narrow-upsert consequence: a batch OMITTING the
    // constrained column null-widens and passes too
    val narrow = Seq(("dbA#a3", "dbA")).toDF("_docId", "str_databaseid")
    TxLog.merge(spark, dir, narrow)
    assert(TxLog.read(spark, dir).count() == 3)
    // strictness is opt-in: author the NOT NULL explicitly — existing
    // null rows (a2, a3) then violate the strict form at ADD time
    intercept[IllegalArgumentException] {
      TxLog.addCheckConstraint(spark, dir, "qty_strict",
        "qty IS NOT NULL AND qty > 0")
    }
    assert(TxLog.snapshot(spark, dir).constraints.keySet == Set("qty_pos"))
  }

  test("strict NOT NULL constraint refuses null batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ck2b").toString
    TxLog.merge(spark, dir, docs(("dbA#a1", "dbA", 1)))
    TxLog.addCheckConstraint(spark, dir, "qty_strict",
      "qty IS NOT NULL AND qty > 0")
    val withNull = Seq(("dbA#a2", "dbA", null.asInstanceOf[Integer]))
      .toDF("_docId", "str_databaseid", "qty")
    intercept[IllegalArgumentException] {
      TxLog.merge(spark, dir, withNull)
    }
    assert(TxLog.read(spark, dir).count() == 1)
  }

  test("case-differing batch column counts as present in validation") {
    // withColumn resolves case-insensitively; the widening filter must
    // match, or a batch spelling `QTY` gets its real values silently
    // replaced by nulls during validation
    val dir = java.nio.file.Files.createTempDirectory("graft-ck5").toString
    TxLog.merge(spark, dir, docs(("dbA#a1", "dbA", 5)))
    TxLog.addCheckConstraint(spark, dir, "qty_strict",
      "qty IS NOT NULL AND qty > 0")
    val upper = Seq(("dbA#a2", "dbA", 7))
      .toDF("_docId", "str_databaseid", "QTY")
    TxLog.merge(spark, dir, upper) // valid data must NOT spuriously fail
    assert(TxLog.read(spark, dir).filter(col("qty") === 7).count() == 1)
  }

  test("append: narrow batch gets the schema diagnosis, not a constraint one") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ck6").toString
    TxLog.merge(spark, dir, docs(("dbA#a1", "dbA", 5)))
    TxLog.addCheckConstraint(spark, dir, "qty_strict",
      "qty IS NOT NULL AND qty > 0")
    val narrow = Seq(("dbA#a2", "dbA")).toDF("_docId", "str_databaseid")
    val e = intercept[IllegalArgumentException] {
      TxLog.append(spark, dir, narrow)
    }
    assert(e.getMessage.contains("batch columns"),
      s"expected the column-set diagnosis, got: ${e.getMessage}")
  }

  test("qualified constraint reference still guards the rename") {
    // a qualified reference (`meta.qty`, a struct-field access) must
    // register EVERY name part — old behavior registered only `meta`,
    // so renaming a same-named top-level column slipped past the guard;
    // the over-refusal here (refusing the rename of top-level `qty`
    // even though the constraint reads the struct field) is deliberate:
    // safer than bricking writes on the true-collision spelling
    val dir = java.nio.file.Files.createTempDirectory("graft-ck7").toString
    val rows = Seq(("dbA#a1", "dbA", 5, 9))
      .toDF("_docId", "str_databaseid", "qty", "inner_qty")
      .withColumn("meta", struct(col("inner_qty").as("qty")))
      .drop("inner_qty")
    TxLog.merge(spark, dir, rows)
    TxLog.addCheckConstraint(spark, dir, "q_pos", "meta.qty > 0")
    val e = intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, dir, "qty", "quantity")
    }
    assert(e.getMessage.contains("CHECK"),
      s"expected the constraint-rename refusal, got: ${e.getMessage}")
  }

  test("constraints survive checkpoints and gate the txlog format write path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ck3").toString
    TxLog.merge(spark, dir, docs(("dbA#a1", "dbA", 1)))
    TxLog.addCheckConstraint(spark, dir, "qty_pos", "qty > 0")
    // push the log past a checkpoint boundary so resolution goes
    // checkpoint-first; the constraint must still be in force
    (0 until TxLog.CheckpointInterval + 2).foreach { i =>
      TxLog.merge(spark, dir, docs((s"dbA#b$i", "dbA", i + 1)))
    }
    assert(TxLog.snapshot(spark, dir).version > TxLog.CheckpointInterval)
    assert(TxLog.snapshot(spark, dir).constraints ==
      Map("qty_pos" -> "qty > 0"))
    // the DataFrame write path routes through merge → same gate
    intercept[IllegalArgumentException] {
      docs(("dbB#x", "dbB", -1)).write.format("txlog")
        .mode(org.apache.spark.sql.SaveMode.Append).save(dir)
    }
    assert(TxLog.read(spark, dir)
      .filter(col("str_databaseid") === "dbB").count() == 0)
  }
}
