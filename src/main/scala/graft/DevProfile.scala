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
    val tokA = docs.filter(length(trim(col("text"))) > 0)
      .repartition(32, col("doc_id"))
      .select(col("doc_id"), col("lang"),
        split(trim(lower(col("text"))), "\\s+").as("tk"))
      .persist()
    tokA.count()
    val withLang = tokA
    val bigrams = when(size(col("tk")) >= 2,
      transform(sequence(lit(0), size(col("tk")) - 2), i =>
        concat_ws(" ", element_at(col("tk"), i + 1),
          element_at(col("tk"), i + 2))))
      .otherwise(array().cast("array<string>"))
    val ref = withLang.filter(col("lang") === "en")
    val uni = ref.select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))

    def oldForm(): DataFrame = {
      val bi = ref.select(explode(bigrams).as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("c2"))
      val docbg = withLang
        .select(col("doc_id"), col("tk"),
          posexplode(bigrams).as(Seq("i", "bg")))
        .select(col("doc_id"), col("bg"),
          element_at(col("tk"), col("i") + 1).as("w1"))
      docbg
        .join(bi.hint("shuffle_hash"), Seq("bg"), "left")
        .join(uni.hint("shuffle_hash"), col("w1") === col("w"), "left")
        .crossJoin(broadcast(vocab))
        .select(col("doc_id"),
          floor(lit(1000000000.0) * (coalesce(col("c2"), lit(0L)) + 1) /
            (coalesce(col("c1"), lit(0L)) + col("v")))
            .cast("long").as("q"))
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_bigrams"), sum("q").as("score_fp"))
    }
    def newForm(): DataFrame = {
      val docbg = withLang
        .select(col("doc_id"), (col("lang") === "en").as("is_en"),
          explode(bigrams).as("bg"))
      val qtab = docbg
        .groupBy("bg").agg(
          sum(when(col("is_en"), lit(1L)).otherwise(lit(0L))).as("c2"))
        .withColumn("w1", substring_index(col("bg"), " ", 1))
        .join(uni.hint("shuffle_hash"), col("w1") === col("w"), "left")
        .crossJoin(broadcast(vocab))
        .select(col("bg"),
          floor(lit(1000000000.0) * (col("c2") + 1) /
            (coalesce(col("c1"), lit(0L)) + col("v")))
            .cast("long").as("q"))
      docbg
        .join(qtab.hint("shuffle_hash"), Seq("bg"))
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_bigrams"), sum("q").as("score_fp"))
    }

    (1 to 3).foreach { p =>
      t(s"p$p old")(noop(oldForm()))
      t(s"p$p new")(noop(newForm()))
    }
    spark.stop()
  }
}
