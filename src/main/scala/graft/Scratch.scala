package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._


/** Dev-only scratch harness for isolating the lshTopK r11→r12 perf
  * delta. Not part of any round artifact; delete freely. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SCRATCH_FALLBACK", "128"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    graft.functions.GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    e.persist().count()

    def dotF(a: Column, b: Column) = call_function("graft_dot", a, b)
    def asD(c: Column) = c.cast("array<double>")
    val maxCell = SkewGuard.MaxCellSize
    val k = 5

    import org.apache.spark.sql.expressions.Window

    def qframe(withNorm: Boolean): DataFrame = {
      val base = e.filter(col("vec_id") < 100)
        .select(col("vec_id").as("q_id"), asD(col("embedding")).as("q_vec"))
      if (withNorm) base.withColumn("q_nrm", sqrt(dotF(col("q_vec"), col("q_vec"))))
      else base
    }
    def cframe(withNorm: Boolean): DataFrame = {
      val base = e.select(col("vec_id").as("cand_id"),
        asD(col("embedding")).as("c_vec"))
      if (withNorm) base.withColumn("c_nrm", sqrt(dotF(col("c_vec"), col("c_vec"))))
      else base
    }

    // candidate pairs with cb cap via AGG (r12 shape)
    def pairsAgg(c: DataFrame, q: DataFrame): DataFrame = {
      val cbArr = c.select(col("cand_id"),
        Similarity.lshBucketArray(col("c_vec")).as("tbs")).persist()
      cbArr.count()
      val qb = q.select(col("q_id"),
        posexplode(Similarity.lshBucketArray(col("q_vec"))).as(Seq("t", "b")))
      val cb = cbArr.select(col("cand_id"),
          posexplode(col("tbs")).as(Seq("t", "b")))
        .groupBy("t", "b")
        .agg(TopK.smallestK(maxCell)(col("cand_id"), col("cand_id")).as("p"))
        .select(col("t"), col("b"), explode(transform(
          sequence(lit(1), (size(col("p")) / lit(2)).cast("int")),
          i => element_at(col("p"), i * 2))).as("cand_id"))
      val r = qb.join(cb, Seq("t", "b"))
        .filter(col("q_id") =!= col("cand_id"))
        .select("q_id", "cand_id").distinct()
      r
    }

    // candidate pairs with cb cap via WINDOW (r11 shape)
    def pairsWin(c: DataFrame, q: DataFrame): DataFrame = {
      val cbArr = c.select(col("cand_id"),
        Similarity.lshBucketArray(col("c_vec")).as("tbs")).persist()
      cbArr.count()
      val qb = q.select(col("q_id"),
        posexplode(Similarity.lshBucketArray(col("q_vec"))).as(Seq("t", "b")))
      val cb = cbArr.select(col("cand_id"),
          posexplode(col("tbs")).as(Seq("t", "b")))
        .withColumn("_rn", row_number().over(
          Window.partitionBy("t", "b").orderBy(col("cand_id"))))
        .filter(col("_rn") <= maxCell).drop("_rn")
      qb.join(cb, Seq("t", "b"))
        .filter(col("q_id") =!= col("cand_id"))
        .select("q_id", "cand_id").distinct()
    }

    def finishAgg(pairs: DataFrame, q: DataFrame, c: DataFrame): DataFrame = {
      val scored = pairs
        .join(broadcast(q), "q_id")
        .join(c, "cand_id")
        .withColumn("sim", Similarity.normedSim(
          dotF(col("q_vec"), col("c_vec")), col("q_nrm"), col("c_nrm")))
      Similarity.rankTopK(scored, k)
    }

    def finishWin(pairs: DataFrame, q: DataFrame, c: DataFrame): DataFrame =
      pairs
        .join(broadcast(q), "q_id")
        .join(c, "cand_id")
        .withColumn("sim", Similarity.cosine(col("q_vec"), col("c_vec")))
        .withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(col("sim").desc, col("cand_id").asc)))
        .filter(col("rank") <= k)
        .select("q_id", "rank", "cand_id", "sim")

    def time(name: String, passes: Int = 7)(mk: => DataFrame): Unit = {
      val ts = (1 to passes).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        mk.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SCRATCH $name min=${ts.min}%.3f all=" +
        ts.map(t => f"$t%.3f").mkString(","))
    }

    // warm every shape once
    finishAgg(pairsAgg(cframe(true), qframe(true)), qframe(true), cframe(true)).count()
    finishWin(pairsWin(cframe(false), qframe(false)), qframe(false), cframe(false)).count()

    // persist the pairs so finish timings see identical inputs
    val pA = pairsAgg(cframe(true), qframe(true)).persist()
    pA.count()
    time("finishAgg") { finishAgg(pA, qframe(true), cframe(true)) }
    time("finishWin") { finishWin(pA, qframe(false), cframe(false)) }
    time("pairsAgg_only") { pairsAgg(cframe(true), qframe(true)) }
    time("pairsWin_only") { pairsWin(cframe(false), qframe(false)) }
    spark.stop()
  }
}
