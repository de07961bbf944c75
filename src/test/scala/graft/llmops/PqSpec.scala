package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product-quantization ANN invariants: code-array shape/range (the
  * compression contract), ADC recall against the exact brute baseline,
  * and the L2-assignment kernel's agreement with a plain Scala
  * reference.
  */
class PqSpec extends SparkSpec {

  test("L2 nearest-centroid kernel matches a Scala reference") {
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    val cents = Array.fill(7)(Array.fill(4)(rnd.nextDouble() * 2 - 1))
    val vecs = Seq.fill(200)(Array.fill(4)(rnd.nextDouble() * 2 - 1))
    import spark.implicits._
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "e")
    val got = df.select(col("vec_id"),
        element_at(call_function("graft_nearest_centroids_l2",
          col("e"), typedLit(cents.map(_.toSeq).toSeq), lit(1)), 1).as("cid"))
      .as[(Long, Int)].collect().toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      val want = cents.indices.minBy { c =>
        val d2 = v.zip(cents(c)).map { case (a, b) => (a - b) * (a - b) }.sum
        (d2, c)
      }
      assert(got(i.toLong) == want, s"vec $i")
    }
  }

  test("PQ codes are m 4-bit ids and encoding is a narrow pass") {
    val e = spark.read.parquet(sf() + "/embeddings.parquet")
    val books = Similarity.pqCodebooks(e)
    assert(books.length == Similarity.PqSubspaces)
    assert(books.forall(_.length == Similarity.PqCodebookK))
    assert(books.forall(_.forall(_.length == Similarity.PqSubDim)))
    val enc = e.select(col("vec_id"),
      Similarity.pqEncode(Similarity.asDouble(col("embedding")), books)
        .as("codes"))
    // every code is a valid codebook id — 4 bits as claimed
    val bad = enc.filter(exists(col("codes"),
      c => c < 0 || c >= Similarity.PqCodebookK))
    assert(bad.isEmpty)
    assert(enc.filter(size(col("codes")) =!= Similarity.PqSubspaces).isEmpty)
    // narrow: no exchange in the encode plan
    val p = enc.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(1500))
  }

  test("PQ recall@5 vs brute clears the floor at every scale factor") {
    for (dir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val e = spark.read.parquet(sf(dir) + "/embeddings.parquet")
      val q = e.filter(col("vec_id") < 10)
      val brute = Similarity.bruteForceTopK(q, e, k = 5)
        .select("q_id", "cand_id")
      val pq = Similarity.pqTopK(q, e, k = 5)
        .select("q_id", "cand_id").withColumn("hit", lit(1))
      val row = brute.join(pq, Seq("q_id", "cand_id"), "left")
        .agg(count(lit(1)).as("np"),
          coalesce(sum("hit"), lit(0L)).as("nh"))
        .collect()(0)
      val recall = row.getLong(1).toDouble / row.getLong(0)
      info(s"$dir pq recall@5 = $recall")
      assert(recall >= 0.55, s"$dir recall $recall")
    }
  }
}
