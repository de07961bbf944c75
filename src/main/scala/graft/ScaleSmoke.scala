package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale-smoke tooling (round-11 verdict task 3): generate an sf1
  * `documents`/`embeddings` pair with the same schema and distribution
  * family as the driver's testdata, then measure time(sf1)/time(sf0.1)
  * for the most expensive document-family queries. The driver's
  * generator is not in this repo, so sf1 is a REGENERATION — same
  * shape (vocab, token-length range, source/lang mix, planted
  * exact/near-dup rates, labeled embedding clusters), deliberately NOT
  * byte-compatible — which is exactly what a scaling measurement
  * needs: the absolute work differs, the GROWTH CURVE is the signal.
  */
object GenScale {

  private val Vocab = Array("batch", "part", "spark", "line", "column",
    "order", "small", "sort", "fast", "value", "scan", "a", "hash", "slow",
    "group", "agg", "filter", "big", "merge", "stream", "join", "table",
    "query", "key", "window", "data", "customer", "the", "vector", "row",
    "index")

  private val Langs =
    Array("en", "en", "en", "en", "zh", "zh", "es", "es", "fr", "de")

  /** splitmix64 — deterministic per (seed, counter), no RNG state. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private def textOf(id: Long): String = {
    val n = 8 + math.floorMod(mix(id * 31 + 7), 93L).toInt
    (0 until n).map { i =>
      Vocab(math.floorMod(mix(id * 131071 + i), Vocab.length.toLong).toInt)
    }.mkString(" ")
  }

  def documents(spark: SparkSession, nDocs: Long): DataFrame = {
    import spark.implicits._
    spark.range(nDocs).map { id =>
      // planted duplicate structure, proportional to sf0.1's: one
      // exact-dup group per 625 docs, one near-dup (suffix) per 50
      val text =
        if (id % 625 == 624 && id >= 2) textOf(id - 2)
        else if (id % 50 == 49 && id >= 1) textOf(id - 1) + " tail"
        else textOf(id)
      (id, text, Langs(math.floorMod(mix(id + 17), Langs.length.toLong).toInt),
        s"src${id % 20}", text.length)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  def embeddings(spark: SparkSession, nVecs: Long): DataFrame = {
    import spark.implicits._
    val dim = 64
    spark.range(nVecs).map { id =>
      val label = math.floorMod(mix(id + 3), 10L).toInt
      val v = Array.tabulate(dim) { d =>
        // cluster center (per label) + per-vector noise
        val c = (math.floorMod(mix(label * 64L + d), 2001L) - 1000L) / 2500.0f
        val nz = (math.floorMod(mix(id * 64L + d), 2001L) - 1000L) / 10000.0f
        (c + nz).toFloat
      }
      (id, v, label)
    }.toDF("vec_id", "embedding", "label")
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/root/repo/testdata-sf1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    documents(spark, 50000L).coalesce(4)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    embeddings(spark, 20000L).coalesce(4)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"wrote sf1 documents+embeddings under $out")
    spark.stop()
  }
}

/** Times each named query at two SF dirs (spark side only — the point
  * is the growth ratio, not the oracle), best of `Passes`, and prints
  * one JSON line: {"queries":{name:[t_small, t_big, ratio]},...}.
  * Session state (memoized side tables, caches) is cleared between
  * passes exactly like graft.Bench. */
object ScaleSmoke {

  private val Passes = 2

  def main(args: Array[String]): Unit = {
    val small = args(0)
    val big = args(1)
    val names = args.drop(2).toSeq
    require(names.nonEmpty, "usage: ScaleSmoke <smallDir> <bigDir> <q>...")
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: $unknown")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeOne(name: String, dir: String): Double = {
      val runs = (1 to Passes).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write
          .mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }
    val rows = names.map { n =>
      val ts = timeOne(n, small)
      val tb = timeOne(n, big)
      (n, ts, tb)
    }
    def f3(d: Double) = f"$d%.3f"
    val qjson = rows.map { case (n, ts, tb) =>
      s""""$n":[${f3(ts)},${f3(tb)},${f3(tb / math.max(ts, 1e-9))}]"""
    }.mkString("{", ",", "}")
    println(s"""{"small":"$small","big":"$big","passes":$Passes,""" +
      s""""queries":$qjson}""")
    spark.stop()
  }
}
