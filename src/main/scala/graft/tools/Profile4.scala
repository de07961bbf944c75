package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llmops.Text

/** Scratch: is Generate(explode(<HOF expr>)) really re-evaluated per
  * output row in Spark 4.1.2, or can the arrays cache be dropped? */
object Profile4 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    for (pass <- 1 to 2) {
      println(s"== pass $pass")
      spark.sharedState.cacheManager.clearCache()
      val docs = Tables.load(spark, sfDir, "documents")

      // variant 1: current — persist arrays, explode cached column
      val arrays = docs
        .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
        .select(col("doc_id"), Text.shingles(col("tk")).as("grams"))
        .persist()
      arrays.count()
      time("explode over cached arrays")(
        arrays.select(col("doc_id"), explode(col("grams")).as("gram"))
          .withColumn("g", Text.hash60(col("gram"))).count())
      arrays.unpersist(true)

      // variant 2: no cache — explode directly over the HOF expression
      time("explode over raw HOF expr")(
        docs.select(col("doc_id"),
            explode(Text.shingles(Text.tokens(col("text")))).as("gram"))
          .withColumn("g", Text.hash60(col("gram"))).count())
    }
    spark.stop()
  }
}
