package graft.llmops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TopFraction must reproduce the naive global/per-group rank selection
  * EXACTLY — including at the k boundary inside a tie run, with scores
  * that collide into one histogram bucket, and with BIGINT scores past
  * any double rounding concern. */
class TopFractionSpec extends SparkSpec {

  private def sameRows(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Boolean = {
    // joins reorder columns (using-keys first); compare on a fixed order
    val cols = a.columns.sorted.map(col).toSeq
    val (x, y) = (a.select(cols: _*), b.select(cols: _*))
    x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty
  }

  private def naiveMark(df: org.apache.spark.sql.DataFrame,
      scoreCol: String, fraction: Double, groupCols: Seq[String]) = {
    val w = (if (groupCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(groupCols.map(col): _*))
      .orderBy(col(scoreCol).desc, col("doc_id"))
    val wc = if (groupCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("selected",
      rank().over(w) <= ceil(lit(fraction) * count(lit(1)).over(
        wc.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing))).cast("long"))
  }

  test("global top-25% matches the naive rank, dense double scores") {
    import spark.implicits._
    val df = (1 to 4000).map { i =>
      (i.toLong, (i * 2654435761L % 1009L).toDouble / 7.0)
    }.toDF("doc_id", "score")
    val naive = naiveMark(df, "score", 0.25, Nil)
    val fast = TopFraction.mark(df, "score", "doc_id", 0.25)
    assert(sameRows(naive, fast))
  }

  test("boundary falls inside a heavy tie run: doc_id breaks it identically") {
    import spark.implicits._
    // 100 distinct scores, ~40 rows each — fraction 0.25 lands mid-tie
    val df = (1 to 4000).map { i => (i.toLong, (i % 100).toDouble) }
      .toDF("doc_id", "score")
    val naive = naiveMark(df, "score", 0.25, Nil)
    val fast = TopFraction.mark(df, "score", "doc_id", 0.25)
    assert(sameRows(naive, fast))
  }

  test("degenerate single-score corpus still selects exactly ceil(f*n)") {
    import spark.implicits._
    val df = (1 to 1000).map { i => (i.toLong, 42.0) }.toDF("doc_id", "score")
    val fast = TopFraction.mark(df, "score", "doc_id", 0.25)
    assert(fast.filter(col("selected")).count() == 250)
    // selection is the doc_id head (score ties break ascending)
    assert(fast.filter(col("selected") && col("doc_id") > 250).count() == 0)
  }

  test("per-group selection with skewed group sizes matches naive") {
    import spark.implicits._
    val df = (1 to 5000).map { i =>
      val g = if (i % 10 == 0) s"small${i % 3}" else "big"
      (i.toLong, g, (i * 48271L % 7919L).toDouble)
    }.toDF("doc_id", "source", "score")
    val naive = naiveMark(df, "score", 0.25, Seq("source"))
    val fast = TopFraction.mark(df, "score", "doc_id", 0.25, Seq("source"))
    assert(sameRows(naive, fast))
  }

  test("NULL group values form a real partition, matching the naive window") {
    import spark.implicits._
    val df = (1 to 4000).map { i =>
      val g: String = if (i % 4 == 0) null else s"src${i % 3}"
      (i.toLong, g, (i * 48271L % 997L).toDouble)
    }.toDF("doc_id", "source", "score")
    val naive = naiveMark(df, "score", 0.25, Seq("source"))
    val fast = TopFraction.mark(df, "score", "doc_id", 0.25, Seq("source"))
    assert(fast.count() == df.count(), "mark dropped NULL-group rows")
    assert(sameRows(naive, fast))
  }

  test("BIGINT scores above 2^53 keep exact order despite double bucketing") {
    import spark.implicits._
    // adjacent longs that collapse to the SAME double: the bucket can't
    // separate them, the within-bucket exact-long rank must
    val base = (1L << 53) + 8L
    val df = (0 until 64).map { i => (i.toLong, base + i) }
      .toDF("doc_id", "score")
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    val naive = df.withColumn("selected", rank().over(w) <= 16L)
    val fast = TopFraction.mark(df, "score", "doc_id", 0.25)
    assert(sameRows(naive, fast))
  }

  test("plan shape: no unpartitioned window over a non-aggregated child") {
    import spark.implicits._
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    val df = (1 to 1000).map { i => (i.toLong, i.toDouble % 37) }
      .toDF("doc_id", "score")
    val sp = TopFraction.mark(df, "score", "doc_id", 0.25)
      .queryExecution.sparkPlan
    val bad = sp.collect {
      case w: WindowExec if w.partitionSpec.isEmpty &&
          w.child.collectFirst { case a: BaseAggregateExec => a }.isEmpty =>
        w.simpleStringWithNodeId()
    }
    assert(bad.isEmpty, s"corpus-sized unpartitioned window(s): $bad")
  }
}
