package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search.
  *
  * Brute-force cosine top-k is the exact baseline: queries are broadcast
  * (they are small by construction), so the big side streams through one
  * codegen'd stage with no shuffle except the final per-query top-k.
  * The dot product is a sequential `aggregate` fold over `zip_with` —
  * deterministic evaluation order, so the DuckDB oracle matches bitwise.
  *
  * The scale path is [[lshBuckets]]: 16 deterministic pseudo-random
  * hyperplanes → 16-bit sign bucket; candidates = bucket equi-join
  * (plus probing neighbor buckets if recall needs it). At 100 TB the
  * bucket join shuffles only (bucket, id, vec) and each bucket is a
  * small local problem — no cross product ever materializes.
  */
object Similarity {

  /** Cast a float embedding column to array<double> (exact). */
  def asDouble(c: Column): Column = c.cast("array<double>")

  /** Sequential-fold dot product (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact top-k neighbors for each query row. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("vec_id").as("q_id"),
      asDouble(col("embedding")).as("q_vec"))
    val c = candidates.select(col("vec_id").as("cand_id"),
      asDouble(col("embedding")).as("c_vec"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("q_vec"), col("c_vec")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("cand_id").asc)))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "cand_id", "sim")
  }

  /** Number of hyperplanes (bucket bits). */
  val LshBits = 16

  /** Deterministic pseudo-random hyperplane component r(i)(d) ∈ [-0.5, 0.5).
    * Pure arithmetic — identical on any engine. */
  def planeComponent(i: Int, d: Column): Column =
    (((lit(i.toLong * 131L) + d) * 2654435761L) % 1000003L).cast("double") /
      1000003.0 - 0.5

  /** Sign-bucket id of an embedding under the LshBits hyperplanes. */
  def lshBucket(vec: Column): Column = {
    val bits = (0 until LshBits).map { i =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0L), lit(63L)), (x, d) => x * planeComponent(i, d)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate NN via LSH bucket equi-join; exact cosine re-rank inside
    * buckets. Recall improves with multiple tables; one table here. */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("vec_id").as("q_id"),
      asDouble(col("embedding")).as("q_vec"))
      .withColumn("bucket", lshBucket(col("q_vec")))
    val c = candidates.select(col("vec_id").as("cand_id"),
      asDouble(col("embedding")).as("c_vec"))
      .withColumn("bucket", lshBucket(col("c_vec")))
    q.join(c, Seq("bucket")).filter(col("q_id") =!= col("cand_id"))
      .withColumn("sim", cosine(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("sim").desc, col("cand_id").asc)))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "cand_id", "sim")
  }
}
