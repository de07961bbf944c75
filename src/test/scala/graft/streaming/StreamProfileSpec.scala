package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The incremental profile must equal the batch recompute on the exact
  * counters AFTER EVERY PREFIX of batches, estimate the true vocabulary
  * within HLL error, and treat both cross-batch redelivery and
  * same-batch-id retries as no-ops. (The estimate is deliberately NOT
  * compared bit-for-bit against a one-shot sketch: at small
  * cardinalities the one-shot sketch is still in exact sparse mode
  * while the streamed union has promoted to dense HLL.)
  */
class StreamProfileSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    .select("doc_id", "source", "text")

  private def counters(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
    df.select("source", "n_docs", "n_postings")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq

  test("readProfile before any batch is an empty profile, not an error") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sprof0").toString
    val empty = StreamProfile.readProfile(spark, dir)
    assert(empty.columns.toSeq ==
      Seq("source", "n_docs", "n_postings", "n_grams_est"))
    assert(empty.count() === 0L)
  }

  test("streamed profile equals the batch recompute after every prefix") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sprof").toString
    val batches = (0 until 4).map(i => docs.filter(col("doc_id") % 4 === i))
    batches.zipWithIndex.foreach { case (b, i) =>
      val streamed = StreamProfile.processBatch(spark, b, dir, i.toLong)
      val prefix = docs.filter(col("doc_id") % 4 <= i)
      assert(counters(streamed) == counters(StreamProfile.batchProfile(prefix)),
        s"prefix through batch $i")
    }
    // after all batches: counters match the oracle-gated exact profile
    // and the estimate is a real estimate of the exact vocabulary
    val got = StreamProfile.readProfile(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    val exactProfile = graft.SparkEntry.queries("llm_profile_vocab")(
        spark, sf("sf0.01"))
      .select("source", "n_docs", "n_postings", "n_grams")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.nonEmpty && got.size == exactProfile.size)
    got.foreach { case (src, nDocs, nPostings, est) =>
      val (eDocs, ePostings, eGrams) = exactProfile(src)
      assert(nDocs == eDocs, s"$src n_docs $nDocs vs $eDocs")
      assert(nPostings == ePostings, s"$src n_postings $nPostings vs $ePostings")
      // lgK 12 HLL: ~1.6% relative standard error; 3 sigma
      assert(math.abs(est - eGrams) <= math.max(3.0, 0.05 * eGrams),
        s"$src n_grams est $est vs exact $eGrams")
    }
  }

  test("redelivery changes nothing: same batch id, new batch id, in-batch dups") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sprof2").toString
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    val b1 = docs.filter(col("doc_id") % 2 === 1)
    // within-batch duplicate delivery must not inflate the counters
    StreamProfile.processBatch(spark, b0.unionAll(b0), dir, 0L)
    val after = counters(StreamProfile.processBatch(spark, b1, dir, 1L))
    assert(after == counters(StreamProfile.batchProfile(docs)))
    // foreachBatch retry: SAME batch id re-sent (crash-recovery path)
    assert(counters(StreamProfile.processBatch(spark, b1, dir, 1L)) == after)
    // at-least-once across batches: old docs under a NEW batch id
    assert(counters(StreamProfile.processBatch(spark, b0, dir, 2L)) == after)
  }
}
