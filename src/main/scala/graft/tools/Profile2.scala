package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llmops.Similarity

/** Scratch profiler #2: f7 restructure candidates + similarity queries. */
object Profile2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    for (pass <- 1 to 2) {
      println(s"== pass $pass")
      spark.sharedState.cacheManager.clearCache()

      // f7 current shape: two shuffles
      time("f7 current") {
        val kv = Tables.load(spark, sfDir, "lineitem")
          .groupBy(col("l_orderkey"), col("l_linenumber"))
          .agg(max(col("l_quantity").cast("int")).cast("string").as("v"))
          .select(col("l_orderkey"),
            concat(lit("line_"), col("l_linenumber")).as("k"), col("v"))
        val md = kv.groupBy("l_orderkey")
          .agg(map_from_entries(collect_list(struct(col("k"), col("v")))).as("MD"))
        md.filter(map_contains_key(col("MD"), "line_3") &&
            exists(map_values(col("MD")), _.contains("2")))
          .select("l_orderkey").orderBy("l_orderkey").count()
      }

      // f7 single-shuffle: pre-partition by l_orderkey, both aggs reuse it
      time("f7 repartitioned") {
        val kv = Tables.load(spark, sfDir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("int").as("q"))
          .repartition(col("l_orderkey"))
          .groupBy(col("l_orderkey"), col("l_linenumber"))
          .agg(max(col("q")).cast("string").as("v"))
          .select(col("l_orderkey"),
            concat(lit("line_"), col("l_linenumber")).as("k"), col("v"))
        val md = kv.groupBy("l_orderkey")
          .agg(map_from_entries(collect_list(struct(col("k"), col("v")))).as("MD"))
        md.filter(map_contains_key(col("MD"), "line_3") &&
            exists(map_values(col("MD")), _.contains("2")))
          .select("l_orderkey").orderBy("l_orderkey").count()
      }

      val e = Tables.load(spark, sfDir, "embeddings")
      time("embeddings count")(e.count())
      time("sim_topk") {
        Similarity.bruteForceTopK(e.filter(col("vec_id") < 10), e, k = 5)
          .orderBy("q_id", "rank").count()
      }
      time("sim_lsh") {
        Similarity.lshTopK(e.filter(col("vec_id") < 10), e, k = 5)
          .orderBy("q_id", "rank").count()
      }
    }
    spark.stop()
  }
}
