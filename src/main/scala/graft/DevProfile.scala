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

    val docs = spark.read.parquet(s"$d/documents.parquet")
    val keyed = docs.select(col("doc_id"),
      array_join(slice(split(trim(lower(col("text"))), "\\s+", 9), 1, 8), " ")
        .as("k"))
    val batch = keyed.filter(col("doc_id") % 3 === 0)
    val ref = keyed.filter(col("doc_id") % 3 =!= 0)

    (1 to 3).foreach { p =>
      t(s"p$p keyed_scan")(noop(keyed))
      t(s"p$p blooms") {
        graft.functions.GraftFunctions.register(spark)
        noop(ref.groupBy(pmod(xxhash64(col("k")), lit(8L)).as("__shard"))
          .agg(call_function("graft_bloom_agg",
            xxhash64(col("k")), lit(1L << 17), lit(1L << 20)).as("__bf")))
      }
      t(s"p$p refkeys_distinct")(noop(ref.select(col("k")).distinct()))
      t(s"p$p full")(noop(
        SparkEntry.queries("llm_dedup_bloom_sharded")(spark, d)))
      t(s"p$p no_sort")(noop(
        graft.llmops.BloomDedup.flagDupsSharded(
          batch = batch, ref = ref, keyCol = "k")
          .select(col("doc_id"), col("is_dup"))))
      t(s"p$p persist_sort") {
        val r = graft.llmops.BloomDedup.flagDupsSharded(
          batch = batch, ref = ref, keyCol = "k")
          .select(col("doc_id"), col("is_dup")).persist()
        noop(r.orderBy("doc_id"))
        r.unpersist()
      }
      t(s"p$p ckpt_sort") {
        noop(graft.llmops.BloomDedup.flagDupsSharded(
          batch = batch, ref = ref, keyCol = "k")
          .select(col("doc_id"), col("is_dup"))
          .localCheckpoint()
          .orderBy("doc_id"))
      }
    }
    spark.stop()
  }
}
