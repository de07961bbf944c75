package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only micro-attribution (not part of the engine surface). */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"DEV $label ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    import graft.llmops.Text
    (1 to 3).foreach { p =>
      t(s"p$p o3idx_full")(noop(
        SparkEntry.queries("o3_bm25_rank_indexed")(spark, d)))
      val root = graft.query.TermIndex.attach(spark, s"docs:$d",
        spark.read.parquet(s"$d/documents.parquet")
          .filter(length(trim(col("text"))) > 0)
          .select(col("doc_id"), Text.tokens(col("text")).as("tk")))
      t(s"p$p o3idx_construct") {
        graft.query.TermIndex.rank(spark, root, Seq("dup", "merge", "scan"), 100)
      }
      t(s"p$p o3idx_scores_only")(noop(
        graft.query.TermIndex.scores(spark, root, Seq("dup", "merge", "scan"))))
    }
    spark.stop()
  }
}
