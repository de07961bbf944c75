package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.TxLog

/** Incremental view maintenance over the change feed: the maintained
  * count/sum rollup must equal a full recompute at every step, and
  * emptied groups must disappear from the rollup table. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (String, String, String, Double)*) =
    rows.toSeq.toDF("_docId", "str_databaseid", "category", "value")

  private def recompute(src: String): Set[(String, Long, Double)] =
    TxLog.read(spark, src).groupBy("category")
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("total"))
      .as[(String, Long, Double)].collect().toSet

  private def rollupRows(roll: String): Set[(String, Long, Double)] =
    TxLog.read(spark, roll).select(col("category"), col("n"), col("total"))
      .as[(String, Long, Double)].collect().toSet

  test("rollup equals full recompute through inserts, cross-group updates, and deletes") {
    val src = java.nio.file.Files.createTempDirectory("graft-iva-src").toString
    val roll = java.nio.file.Files.createTempDirectory("graft-iva-roll").toString + "/r"
    // v0: initial inserts
    TxLog.merge(spark, src, docs(
      ("dbA#1", "dbA", "red", 1.0), ("dbA#2", "dbA", "red", 2.0),
      ("dbA#3", "dbA", "blue", 5.0)))
    // v1: update moves a doc red → blue (pre-image decrements red)
    TxLog.merge(spark, src, docs(("dbA#2", "dbA", "blue", 4.0)))
    // v2: delete the original blue doc
    TxLog.merge(spark, src, docs(("dbA#4", "dbA", "green", 7.0)),
      Seq("dbA#3").toDF("_docId"))
    val head = TxLog.snapshot(spark, src).version
    IncrementalAgg.maintainRange(spark, src, roll, -1, head,
      dims = Seq("category"), valueCol = Some("value"))
    assert(rollupRows(roll) === recompute(src))
    assert(rollupRows(roll) === Set(
      ("red", 1L, 1.0), ("blue", 1L, 4.0), ("green", 1L, 7.0)))

    // continue incrementally from the cursor — no re-bootstrap
    TxLog.merge(spark, src, docs(("dbA#5", "dbA", "red", 10.0)),
      Seq("dbA#4").toDF("_docId"))
    val head2 = TxLog.snapshot(spark, src).version
    IncrementalAgg.maintainRange(spark, src, roll, head, head2,
      dims = Seq("category"), valueCol = Some("value"))
    assert(rollupRows(roll) === recompute(src))
    // the emptied group is DELETED from the rollup, not left at zero
    assert(!rollupRows(roll).exists(_._1 == "green"))
  }

  test("LIVE follower maintains the rollup end-to-end while the source commits") {
    val src = java.nio.file.Files.createTempDirectory("graft-iva3-src").toString
    val roll = java.nio.file.Files.createTempDirectory("graft-iva3-roll").toString + "/r"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-iva3-ck").toString
    TxLog.merge(spark, src, docs(
      ("dbA#1", "dbA", "red", 1.0), ("dbA#2", "dbA", "blue", 2.0)))
    val q = ChangeFeed.follow(spark, src, ckpt) { (changes, _, _) =>
      IncrementalAgg.applyChanges(spark, roll, changes,
        dims = Seq("category"), valueCol = Some("value"))
    }
    try {
      q.processAllAvailable()
      assert(rollupRows(roll) === recompute(src))
      // source keeps committing: an update that moves groups + a delete
      TxLog.merge(spark, src, docs(("dbA#2", "dbA", "red", 3.0)),
        Seq("dbA#1").toDF("_docId"))
      q.processAllAvailable()
      assert(rollupRows(roll) === recompute(src))
      assert(rollupRows(roll) === Set(("red", 1L, 3.0)))
    } finally q.stop()
  }

  test("RANDOMIZED: rollup equals recompute through 25 random insert/update/delete commits") {
    val src = java.nio.file.Files.createTempDirectory("graft-iva4-src").toString
    val roll = java.nio.file.Files.createTempDirectory("graft-iva4-roll").toString + "/r"
    val rnd = new scala.util.Random(20250814L)
    val cats = Vector("red", "blue", "green", "teal")
    // model of live keys → (category, value)
    val model = scala.collection.mutable.Map.empty[Int, (String, Double)]
    var applied = -1L
    (1 to 25).foreach { step =>
      val op = rnd.nextInt(3)
      if (op == 0 || model.isEmpty) {
        // insert or overwrite 1-3 keys
        val rows = (1 to 1 + rnd.nextInt(3)).map { _ =>
          val k = rnd.nextInt(30)
          val row = (cats(rnd.nextInt(cats.size)), rnd.nextInt(100).toDouble)
          model(k) = row
          (s"dbA#$k", "dbA", row._1, row._2)
        }
        TxLog.merge(spark, src, docs(rows.distinct: _*))
      } else if (op == 1) {
        // update an existing key, possibly across groups
        val k = model.keys.toSeq(rnd.nextInt(model.size))
        val row = (cats(rnd.nextInt(cats.size)), rnd.nextInt(100).toDouble)
        model(k) = row
        TxLog.merge(spark, src, docs((s"dbA#$k", "dbA", row._1, row._2)))
      } else {
        // delete an existing key
        val k = model.keys.toSeq(rnd.nextInt(model.size))
        model.remove(k)
        TxLog.merge(spark, src, docs(), Seq(s"dbA#$k").toDF("_docId"))
      }
      val head = TxLog.snapshot(spark, src).version
      IncrementalAgg.maintainRange(spark, src, roll, applied, head,
        dims = Seq("category"), valueCol = Some("value"))
      applied = head
      // every few steps, compare against both the recompute AND the model
      if (step % 5 == 0) {
        assert(rollupRows(roll) === recompute(src), s"step $step")
        val expect = model.values.groupBy(_._1).map { case (c, vs) =>
          (c, vs.size.toLong, vs.map(_._2).sum)
        }.toSet
        assert(rollupRows(roll) === expect, s"step $step vs model")
      }
    }
  }

  private def recomputeMinMax(src: String): Set[(String, Long, Double, Double)] =
    TxLog.read(spark, src).groupBy("category")
      .agg(count(lit(1)).as("n"), min(col("value")).as("mn"),
        max(col("value")).as("mx"))
      .as[(String, Long, Double, Double)].collect().toSet

  private def minMaxRows(roll: String): Set[(String, Long, Double, Double)] =
    TxLog.read(spark, roll).select(col("category"), col("n"),
        col("mn"), col("mx"))
      .as[(String, Long, Double, Double)].collect().toSet

  test("min/max rollup survives bound-deletes via group-local rescans") {
    val src = java.nio.file.Files.createTempDirectory("graft-ivm-src").toString
    val roll = java.nio.file.Files.createTempDirectory("graft-ivm-roll").toString + "/r"
    TxLog.merge(spark, src, docs(
      ("dbA#1", "dbA", "red", 1.0), ("dbA#2", "dbA", "red", 9.0),
      ("dbA#3", "dbA", "red", 5.0), ("dbA#4", "dbA", "blue", 3.0)))
    // v1: delete the red MAX (9.0) — the non-self-maintainable case:
    // the bound must re-derive from the remaining rows, not linger
    TxLog.merge(spark, src, docs(("dbA#5", "dbA", "blue", 2.0)),
      Seq("dbA#2").toDF("_docId"))
    // v2: update moves the red MIN into blue (pre-image breaks red's
    // min, post-image extends blue's)
    TxLog.merge(spark, src, docs(("dbA#1", "dbA", "blue", 11.0)))
    val head = TxLog.snapshot(spark, src).version
    IncrementalAgg.maintainRangeMinMax(spark, src, roll, -1, head,
      dims = Seq("category"), valueCol = "value")
    assert(minMaxRows(roll) === recomputeMinMax(src))
    assert(minMaxRows(roll) === Set(
      ("red", 1L, 5.0, 5.0), ("blue", 3L, 2.0, 11.0)))
    // interior delete (bounds untouched) maintains WITHOUT a rescan
    // reaching different values; emptied group disappears
    TxLog.merge(spark, src, docs(), Seq("dbA#5").toDF("_docId")) // blue 2.0 = min! rescan
    TxLog.merge(spark, src, docs(), Seq("dbA#3").toDF("_docId")) // red emptied
    val head2 = TxLog.snapshot(spark, src).version
    IncrementalAgg.maintainRangeMinMax(spark, src, roll, head, head2,
      dims = Seq("category"), valueCol = "value")
    assert(minMaxRows(roll) === recomputeMinMax(src))
    assert(minMaxRows(roll) === Set(("blue", 2L, 3.0, 11.0)))
  }

  test("min/max rescan finds NULL-dim groups (null-safe stitch join)") {
    val src = java.nio.file.Files.createTempDirectory("graft-ivmN-src").toString
    val roll = java.nio.file.Files.createTempDirectory("graft-ivmN-roll").toString + "/r"
    // the NULL category is a real group (the rollup keys it "<null>")
    TxLog.merge(spark, src, docs(
      ("dbA#1", "dbA", null, 4.0), ("dbA#2", "dbA", null, 9.0),
      ("dbA#3", "dbA", "red", 1.0)))
    // delete the NULL group's MAX → group-local rescan of a NULL-dim
    // group; a null-dropping equi-join would find no rows and write
    // NULL mn/mx
    TxLog.merge(spark, src, docs(), Seq("dbA#2").toDF("_docId"))
    val head = TxLog.snapshot(spark, src).version
    IncrementalAgg.maintainRangeMinMax(spark, src, roll, -1, head,
      dims = Seq("category"), valueCol = "value")
    val got = TxLog.read(spark, roll)
      .select(col("category"), col("n"), col("mn"), col("mx"))
      .as[(Option[String], Long, Option[Double], Option[Double])]
      .collect().toSet
    assert(got === Set(
      (None, 1L, Some(4.0), Some(4.0)),
      (Some("red"), 1L, Some(1.0), Some(1.0))))
  }

  test("min/max rollup equals recompute under a seeded random op sequence") {
    val src = java.nio.file.Files.createTempDirectory("graft-ivm2-src").toString
    val roll = java.nio.file.Files.createTempDirectory("graft-ivm2-roll").toString + "/r"
    val rnd = new scala.util.Random(4242)
    val model = scala.collection.mutable.Map[Int, (String, Double)]()
    var nextId = 0
    var applied = -1L
    (1 to 20).foreach { step =>
      val op = if (model.isEmpty) 0 else rnd.nextInt(3)
      op match {
        case 0 => // insert 1-3 rows
          val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
            nextId += 1
            val cat = Seq("red", "blue", "green")(rnd.nextInt(3))
            val v = math.floor(rnd.nextDouble() * 100) // exact doubles
            model(nextId) = (cat, v)
            (s"dbA#$nextId", "dbA", cat, v)
          }
          TxLog.merge(spark, src, docs(rows: _*))
        case 1 => // update a row (possibly cross-group, possibly a bound)
          val k = model.keys.toSeq(rnd.nextInt(model.size))
          val cat = Seq("red", "blue", "green")(rnd.nextInt(3))
          val v = math.floor(rnd.nextDouble() * 100)
          model(k) = (cat, v)
          TxLog.merge(spark, src, docs((s"dbA#$k", "dbA", cat, v)))
        case _ => // delete a row
          val k = model.keys.toSeq(rnd.nextInt(model.size))
          model.remove(k)
          TxLog.merge(spark, src, docs(), Seq(s"dbA#$k").toDF("_docId"))
      }
      val head = TxLog.snapshot(spark, src).version
      IncrementalAgg.maintainRangeMinMax(spark, src, roll, applied, head,
        dims = Seq("category"), valueCol = "value")
      applied = head
      if (step % 4 == 0) {
        assert(minMaxRows(roll) === recomputeMinMax(src), s"step $step")
        val expect = model.values.groupBy(_._1).map { case (c, vs) =>
          (c, vs.size.toLong, vs.map(_._2).min, vs.map(_._2).max)
        }.toSet
        assert(minMaxRows(roll) === expect, s"step $step vs model")
      }
    }
  }

  test("rollup batches are atomic commits: a reader never sees a half-applied version") {
    val src = java.nio.file.Files.createTempDirectory("graft-iva2-src").toString
    val roll = java.nio.file.Files.createTempDirectory("graft-iva2-roll").toString + "/r"
    TxLog.merge(spark, src, docs(
      ("dbA#1", "dbA", "red", 1.0), ("dbA#2", "dbA", "blue", 2.0)))
    IncrementalAgg.maintainRange(spark, src, roll, -1, 0,
      dims = Seq("category"), valueCol = Some("value"))
    val pinned = TxLog.snapshot(spark, roll).version
    val before = rollupRows(roll)
    // apply another source version; the pinned rollup snapshot is
    // unchanged (snapshot isolation of the maintained table)
    TxLog.merge(spark, src, docs(("dbA#3", "dbA", "red", 3.0)))
    IncrementalAgg.maintainRange(spark, src, roll, 0, 1,
      dims = Seq("category"), valueCol = Some("value"))
    val pinnedRows = TxLog.read(spark, roll, asOfVersion = Some(pinned))
      .select(col("category"), col("n"), col("total"))
      .as[(String, Long, Double)].collect().toSet
    assert(pinnedRows === before)
    assert(rollupRows(roll) === recompute(src))
  }
}
