package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental MinHash dedup: the cumulative pairs emitted across
  * micro-batches must equal the batch-mode band-collision pairs over the
  * full corpus — and redelivery must emit nothing new.
  */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-sdedup").toString

  private def docs = spark.read.parquet(sf() + "/documents.parquet")
    .select("doc_id", "text")

  /** batch-mode truth: all band-collision pairs over `d`. */
  private def batchPairs(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val b = StreamDedup.bands(d)
    b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"))
      .distinct().as[(Long, Long)].collect().toSet
  }

  test("cumulative stream emissions equal the batch recompute at every prefix") {
    val dir = freshDir()
    val parts = (0 until 3).map(i => docs.filter(col("doc_id") % 3 === i))
    var emitted = Set.empty[(Long, Long)]
    var prefix = spark.emptyDataFrame
    for ((p, i) <- parts.zipWithIndex) {
      val out = StreamDedup.processBatch(spark, p, dir)
        .as[(Long, Long)].collect().toSet
      // pairs never re-emit
      assert(out.intersect(emitted).isEmpty, s"batch $i re-emitted pairs")
      emitted ++= out
      prefix = if (i == 0) p else prefix.unionByName(p)
      assert(emitted == batchPairs(prefix),
        s"after batch $i: stream ${emitted.size} vs batch ${batchPairs(prefix).size}")
    }
    assert(emitted.nonEmpty) // the corpus has near-dups; non-vacuous
  }

  test("redelivered batch emits nothing and does not grow state") {
    val dir = freshDir()
    val first = docs.filter(col("doc_id") < 100)
    StreamDedup.processBatch(spark, first, dir)
    val stateBefore = spark.read.parquet(dir + "/band_index").count()
    val replay = StreamDedup.processBatch(spark, first, dir)
    assert(replay.isEmpty)
    assert(spark.read.parquet(dir + "/band_index").count() == stateBefore)
  }
}
