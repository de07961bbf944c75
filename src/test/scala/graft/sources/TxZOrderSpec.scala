package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, LessThanOrEqual}

import graft.SparkSpec

/** OPTIMIZE ZORDER over a transaction-log table: z-curve clustering,
  * per-column numeric footer stats in the commit, numRanges file
  * skipping in TxLog.read, and the pushed-filter path through
  * `format("txlog")`. */
class TxZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(dir: String, n: Int = 8000): Unit = {
    val df = spark.range(n).select(
      concat(lit("dbA#k"), col("id")).as("_docId"),
      lit("dbA").as("str_databaseid"),
      (col("id") * 2654435761L % 997).as("x"),
      (col("id") * 40503L % 991).as("y"))
    TxLog.merge(spark, dir, df)
  }

  test("optimizeZOrder: numRanges prunes files on BOTH z columns, results exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zo1").toString
    mkTable(dir)
    val written = TxLog.optimizeZOrder(spark, dir, Seq("x", "y"),
      targetRowsPerFile = 300)
    assert(written >= 16, s"expected a multi-file layout, got $written")
    val all = TxLog.read(spark, dir)
    assert(all.count() === 8000)
    assert(all.inputFiles.length === written)
    // stats survived serialization: every live file carries both columns
    val snap = TxLog.snapshot(spark, dir)
    assert(snap.files.forall(f =>
      f.numStats.contains("x") && f.numStats.contains("y")))

    // the first z column holds the higher interleave position within
    // each bit pair, so per-file y extents run ~2× x extents — both
    // must still prune far below the all-files read a linear x sort
    // would need for any y predicate
    def check(c: String, lo: Double, hi: Double, maxFrac: Double): Unit = {
      val pruned = TxLog.read(spark, dir,
        numRanges = Map(c -> (lo, hi)))
      assert(pruned.inputFiles.length <= (written * maxFrac).toInt,
        s"$c range should skip most files: " +
          s"${pruned.inputFiles.length} of $written read")
      // pruning is superset-safe: the filtered rows are identical
      val exact = all.filter(col(c) >= lo && col(c) <= hi)
        .select("_docId").as[String].collect().toSet
      val got = pruned.filter(col(c) >= lo && col(c) <= hi)
        .select("_docId").as[String].collect().toSet
      assert(got === exact)
      assert(got.nonEmpty)
    }
    // a linear sort could serve only ONE of these
    check("x", 100, 160, 0.5)
    check("y", 700, 760, 0.6)
    // the pre-optimize version still reads (time travel over the rewrite)
    assert(TxLog.read(spark, dir, asOfVersion = Some(0L)).count() === 8000)
  }

  test("format(\"txlog\"): pushed numeric range filters skip files and stay exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zo2").toString
    mkTable(dir)
    TxLog.optimizeZOrder(spark, dir, Seq("x", "y"), targetRowsPerFile = 600)
    val df = spark.read.format("txlog").load(dir)
    val got = df.filter(col("y") >= 700 && col("y") <= 760)
      .select("_docId").as[String].collect().toSet
    val exact = TxLog.read(spark, dir)
      .filter(col("y") >= 700 && col("y") <= 760)
      .select("_docId").as[String].collect().toSet
    assert(got === exact && got.nonEmpty)
    // the filter→range translation drives the same skipping read()
    val rel = TxLogRelation(spark.sqlContext, dir, None, None, None,
      "_docId", "str_databaseid")
    val ranges = rel.numRangesOf(Array(
      GreaterThanOrEqual("y", 700L), LessThanOrEqual("y", 760L)))
    assert(ranges === Map("y" -> (700.0, 760.0)))
    // intersecting filters tighten; equality pins both bounds; the key
    // and partition columns stay with their own pruning paths
    assert(rel.numRangesOf(Array(EqualTo("x", 42))) ===
      Map("x" -> (42.0, 42.0)))
    assert(rel.numRangesOf(Array(EqualTo("_docId", "k"),
      EqualTo("str_databaseid", "dbA"))).isEmpty)
  }

  test("optimizeZOrder is transactional: a racing merge is never lost") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zo3").toString
    mkTable(dir, n = 2000)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val extra = Seq(("dbA#late", "dbA", 5L, 5L))
      .toDF("_docId", "str_databaseid", "x", "y")
    val fOpt = Future(TxLog.optimizeZOrder(spark, dir, Seq("x", "y"),
      targetRowsPerFile = 600))
    val fMerge = Future(TxLog.merge(spark, dir, extra))
    Await.result(fOpt, 120.seconds)
    Await.result(fMerge, 120.seconds)
    val rows = TxLog.read(spark, dir)
    assert(rows.count() === 2001)
    assert(rows.filter(col("_docId") === "dbA#late").count() === 1)
  }
}
