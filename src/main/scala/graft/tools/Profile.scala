package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llmops.{MinHash, SimHash, Text}

/** Ad-hoc stage profiler for the hot bench queries (not part of the
  * library surface; a developer tool like scripts/verify.sh).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
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
    time("docs.count")(docs.count())

    val arrays = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
      .select(col("doc_id"), Text.shingles(col("tk")).as("grams"))
      .persist()
    time("shingle arrays build")(arrays.count())

    val gh = arrays.select(col("doc_id"), explode(col("grams")).as("gram"))
      .withColumn("g", Text.hash60(col("gram")))
      .persist()
    time("gram hashes explode+md5")(gh.count())

    val ghd = gh.select("doc_id", "g").distinct().persist()
    time("ghd distinct")(ghd.count())

    val a = ghd.select(col("doc_id").as("a_id"), col("g"))
    val b = ghd.select(col("doc_id").as("b_id"), col("g"))
    val shared = a.join(b, Seq("g"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("shared"))
      .persist()
    time("pair self-join+group")(shared.count())

    val sizes = ghd.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val jac = col("shared").cast("double") /
      (col("na") + col("nb") - col("shared"))
    time("jaccard finish")(
      shared
        .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
        .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
        .filter(jac >= 0.5).count())

    val sig = gh.groupBy("doc_id")
      .agg(MinHash.minhash(col("g")).as("sig")).persist()
    time("minhash signatures")(sig.count())

    val bandStructs = array((0 until MinHash.NumBands).map { bnd =>
      struct(lit(bnd).as("band"),
        concat_ws("_", slice(col("sig"), bnd * MinHash.BandRows + 1,
          MinHash.BandRows)).as("bkey"))
    }: _*)
    val bands = sig.select(col("doc_id"), explode(bandStructs).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bkey").as("bkey"))
      .persist()
    time("band keys")(bands.count())

    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct().persist()
    time("band candidates")(cand.count())

    val est = cand
      .join(sig.select(col("doc_id").as("a_id"), col("sig").as("sig_a")), "a_id")
      .join(sig.select(col("doc_id").as("b_id"), col("sig").as("sig_b")), "b_id")
      .withColumn("n_match", aggregate(
        zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1L).otherwise(0L)),
        lit(0L), (acc, v) => acc + v))
    time("estimate join")(est.count())

    val sharedC = cand
      .join(ghd.select(col("doc_id").as("a_id"), col("g")), "a_id")
      .join(ghd.select(col("doc_id").as("b_id"), col("g").as("g_b")), "b_id")
      .filter(col("g") === col("g_b"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("shared"))
    time("exact-verify join")(sharedC.count())

    val fp = gh.groupBy("doc_id")
      .agg(SimHash.simhash(col("g")).as("sim_sig")).persist()
    time("simhash fingerprints")(fp.count())
    }

    spark.stop()
  }
}
