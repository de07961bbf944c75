package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SemDeDup cluster-scoped dedup: emitted pairs must be a SUBSET of the
  * exact pairwise result (scores are exact; only candidate scope is
  * approximate) and recall against the full pair set must clear a
  * floor at every scale factor.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val Tau = 0.45

  test("pairs are exact-subset and recall clears the floor") {
    for (dir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val e = spark.read.parquet(sf(dir) + "/embeddings.parquet")
      val sem = Similarity.semDedupPairs(e, Tau)
        .select("dup_id", "keep_id").as[(Long, Long)].collect().toSet
      val v = e.select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("e"))
      graft.functions.GraftFunctions.register(spark)
      val exact = v.as("a").join(v.as("b"),
          col("a.vec_id") < col("b.vec_id"))
        .withColumn("sim",
          Similarity.cosine(col("a.e"), col("b.e")))
        .filter(col("sim") >= Tau)
        .select(col("b.vec_id").as("dup_id"), col("a.vec_id").as("keep_id"))
        .as[(Long, Long)].collect().toSet
      assert(sem.subsetOf(exact), s"$dir emitted non-exact pairs")
      val recall = if (exact.isEmpty) 1.0 else sem.size.toDouble / exact.size
      info(s"$dir semdedup pairs=${sem.size}/${exact.size} recall=$recall")
      assert(recall >= 0.6, s"$dir recall $recall")
    }
  }
}
