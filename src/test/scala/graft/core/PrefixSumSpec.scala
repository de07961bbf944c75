package graft.core

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The stitched two-level scans must be BIT-IDENTICAL to the naive
  * single-task windows they replace — on adversarial shapes: skewed
  * groups, sparse/dense ids, shard-boundary-straddling runs, and a
  * group smaller than one shard. */
class PrefixSumSpec extends SparkSpec {

  private def sameRows(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Boolean = {
    // joins reorder columns (using-keys first); compare on a fixed order
    val cols = a.columns.sorted.map(org.apache.spark.sql.functions.col).toSeq
    val (x, y) = (a.select(cols: _*), b.select(cols: _*))
    x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty
  }

  private def mkDocs(n: Int, sources: Int) = {
    import spark.implicits._
    // deterministic pseudo-random values + deliberately sparse ids for
    // half the rows (shard occupancy varies 1..width)
    (0 until n).map { i =>
      val id = if (i % 2 == 0) i.toLong else 100000L + i * 37L
      (id, s"src${i % sources}", (i * 2654435761L % 97L) + 1L)
    }.toDF("doc_id", "source", "v")
  }

  test("exclusive running total matches the naive per-group window") {
    val df = mkDocs(5000, 3)
    val naive = df.withColumn("cum_before",
      coalesce(sum("v").over(Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val stitched = PrefixSum.exclusive(df, "v", "doc_id", Seq("source"),
      shardWidth = 256L)
    assert(stitched.columns.sorted.sameElements(naive.columns.sorted))
    assert(sameRows(naive, stitched))
  }

  test("NULL group values survive the stitch (window treats NULL as a partition)") {
    import spark.implicits._
    // every third row's group is NULL — a plain equi-stitch would drop
    // them; the window semantics we claim keep them as one partition
    val df = mkDocs(3000, 3).withColumn("source",
      when(col("doc_id") % 3 === 0, lit(null: String))
        .otherwise(col("source")))
    val naive = df.withColumn("cum_before",
      coalesce(sum("v").over(Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val stitched = PrefixSum.exclusive(df, "v", "doc_id", Seq("source"),
      shardWidth = 128L)
    assert(stitched.count() == df.count(), "stitch dropped NULL-group rows")
    assert(sameRows(naive, stitched))
    // rowNumber path too
    val naiveRn = df.withColumn("rn",
      row_number().over(Window.partitionBy("source").orderBy("doc_id"))
        .cast("long"))
    val stitchedRn = PrefixSum.rowNumber(df, Seq("source"),
      Seq(col("doc_id")), expr("doc_id DIV 128"))
    assert(stitchedRn.count() == df.count())
    assert(sameRows(naiveRn, stitchedRn))
  }

  test("exclusive running total, ungrouped (global) variant") {
    val df = mkDocs(2000, 1).drop("source")
    val naive = df.withColumn("cum_before",
      coalesce(sum("v").over(Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val stitched = PrefixSum.exclusive(df, "v", "doc_id",
      shardWidth = 100L)
    assert(sameRows(naive, stitched))
  }

  test("rowNumber matches the naive window incl. a group smaller than a shard") {
    val df = mkDocs(4000, 5).withColumn("h", pmod(xxhash64(col("doc_id")),
      lit(1L << 31)))
    val naive = df.withColumn("rn",
      row_number().over(Window.partitionBy("source").orderBy("h", "doc_id"))
        .cast("long"))
    val stitched = PrefixSum.rowNumber(df, Seq("source"),
      Seq(col("h"), col("doc_id")), shiftright(col("h"), 19), "rn")
    assert(sameRows(naive, stitched))
  }

  test("rowNumber with a struct shard key (prefix of a two-column order)") {
    val df = mkDocs(3000, 4).withColumn("nt", col("v") % 8) // heavy ties
    val naive = df.withColumn("rn",
      row_number().over(Window.partitionBy("source").orderBy("nt", "doc_id"))
        .cast("long"))
    val stitched = PrefixSum.rowNumber(df, Seq("source"),
      Seq(col("nt"), col("doc_id")),
      struct(col("nt"), expr("doc_id DIV 512")), "rn")
    assert(sameRows(naive, stitched))
  }

  test("every per-row window in the stitched plans carries a fine shard key") {
    val df = mkDocs(3000, 2)
    val sp = PrefixSum.exclusive(df, "v", "doc_id", Seq("source"))
      .queryExecution.sparkPlan
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    val coarse = sp.collect {
      case w: WindowExec
          if !w.partitionSpec.flatMap(_.references.map(_.name))
            .contains("__shard") &&
            w.child.collectFirst { case a: BaseAggregateExec => a }.isEmpty =>
        w.partitionSpec.mkString(",")
    }
    assert(coarse.isEmpty, s"coarse-partitioned corpus window(s): $coarse")
  }
}
