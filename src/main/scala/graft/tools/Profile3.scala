package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llmops.{MinHash, Text}

/** Scratch profiler #3: dedup pipeline restructure candidates. */
object Profile3 {

  /** i<j pairs of a sorted distinct array, as array<struct<a,b>>. */
  def pairArray(ds: Column): Column =
    flatten(transform(sequence(lit(1), size(ds) - 1), i =>
      transform(sequence(lit(0), i - 1), j =>
        struct(element_at(ds, j + 1).as("a"), element_at(ds, i + 1).as("b")))))

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

      val docs = Tables.load(spark, sfDir, "documents")
      val arrays = docs
        .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
        .select(col("doc_id"), Text.shingles(col("tk")).as("grams"))
        .persist()
      val gh = arrays.select(col("doc_id"), explode(col("grams")).as("gram"))
        .withColumn("g", Text.hash60(col("gram")))
        .persist()
      val ghd = gh.select("doc_id", "g").distinct().persist()
      time("build arrays+gh+ghd")(ghd.count())

      val docsets = ghd.groupBy("doc_id")
        .agg(sort_array(collect_list(col("g"))).as("gs"), count(lit(1)).as("n"))
        .persist()
      time("docsets")(docsets.count())

      // variant A: pair gen via per-gram grouping + HOF pair array
      val byGram = ghd.groupBy("g")
        .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .filter(size(col("ds")) > 1)
      val pairsA = byGram.select(explode(pairArray(col("ds"))).as("p"))
        .select(col("p.a").as("a_id"), col("p.b").as("b_id"))
      val sharedA = pairsA.groupBy("a_id", "b_id").agg(count(lit(1)).as("shared"))
      time("A: groupBy-g pair gen")(sharedA.count())

      // variant B: current self-join
      val a = ghd.select(col("doc_id").as("a_id"), col("g"))
      val b = ghd.select(col("doc_id").as("b_id"), col("g"))
      val sharedB = a.join(b, Seq("g"))
        .filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("shared"))
      time("B: self-join pair gen")(sharedB.count())

      // finish with broadcast sizes (variant A result)
      val sharedP = sharedA.persist()
      sharedP.count()
      val jac = col("shared").cast("double") /
        (col("na") + col("nb") - col("shared"))
      time("finish broadcast sizes")(
        sharedP
          .join(broadcast(docsets.select(col("doc_id").as("a_id"),
            col("n").as("na"))), "a_id")
          .join(broadcast(docsets.select(col("doc_id").as("b_id"),
            col("n").as("nb"))), "b_id")
          .filter(jac >= 0.5).count())

      // minhash: sig from ghd, broadcast est + intersect verify
      val sig = ghd.groupBy("doc_id")
        .agg(MinHash.minhash(col("g")).as("sig")).persist()
      time("sig from ghd")(sig.count())

      val bandStructs = array((0 until MinHash.NumBands).map { bnd =>
        struct(lit(bnd).as("band"),
          concat_ws("_", slice(col("sig"), bnd * MinHash.BandRows + 1,
            MinHash.BandRows)).as("bkey"))
      }: _*)
      val bands = sig.select(col("doc_id"), explode(bandStructs).as("b"))
        .select(col("doc_id"), col("b.band").as("band"), col("b.bkey").as("bkey"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
        .distinct().persist()
      time("bands+cand")(cand.count())

      val withSets = cand
        .join(broadcast(docsets.select(col("doc_id").as("a_id"),
          col("gs").as("gs_a"), col("n").as("na"))), "a_id")
        .join(broadcast(docsets.select(col("doc_id").as("b_id"),
          col("gs").as("gs_b"), col("n").as("nb"))), "b_id")
        .withColumn("shared", size(array_intersect(col("gs_a"), col("gs_b"))).cast("long"))
      time("verify via intersect")(withSets.count())

      val est = cand
        .join(broadcast(sig.select(col("doc_id").as("a_id"), col("sig").as("sig_a"))), "a_id")
        .join(broadcast(sig.select(col("doc_id").as("b_id"), col("sig").as("sig_b"))), "b_id")
        .withColumn("n_match", aggregate(
          zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v))
      time("est broadcast")(est.count())
    }
    spark.stop()
  }
}
