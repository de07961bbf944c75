package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Model-based arrival-order fuzz for the band-store streaming screen —
  * the randomized generalization of IncrementalDedupSpec's fixed
  * 2-batch scenarios, in the spirit of TxLogModelFuzzSpec.
  *
  * Random micro-batch SEQUENCES of docs drawn from a small set of
  * duplicate families are driven through a live [[IncrementalDedup
  * .streamScreen]] stream, interleaved with at-least-once REPLAYS of
  * earlier batches (what a crash between the fold and the checkpoint
  * commit looks like to foreachBatch) and store MAINTENANCE
  * (compact + vacuum). After every step the verdict ledger must equal
  * the reference model:
  *   - a doc is a dup iff a family mate is VISIBLE to it — the
  *     family's stored keeper (the first-arrived copy) or a lower-id
  *     mate in the SAME batch — and its reported twin is the
  *     highest-id visible mate (bestAgg orders by (n_match, c_id));
  *   - replays never change a verdict and never grow the store;
  *   - maintenance changes nothing observable.
  * At the end the store must hold exactly the family keepers. Family
  * members share IDENTICAL text (n_match = 64 certain), so the model
  * is exact — near-dup recall mechanics are pinned separately in
  * IncrementalDedupSpec/LshDedupSpec. Seeded — failures reproduce. */
class StreamScreenFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def rng(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L)
      .drop(1).map(x => x & Long.MaxValue)

  private def familyText(f: Int): String =
    (1 to 50).map(k => s"f${f}w${(f * 131 + k * 17) % 9973}").mkString(" ")

  test("random batch sequences with replays and maintenance track the model") {
    (1 to 2).foreach { round =>
      val r = rng(round * 7907L)
      val store = java.nio.file.Files
        .createTempDirectory(s"graft-ssfz-$round").toString + "/sigs"
      val src = java.nio.file.Files
        .createTempDirectory(s"graft-ssfzsrc-$round").toString

      var nextId = 100L
      val keeper = scala.collection.mutable.Map.empty[Int, Long] // family → first id
      val expected = scala.collection.mutable.Map.empty[Long, (Boolean, Option[Long])]
      val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, String, Int)]]
      val flags = scala.collection.concurrent.TrieMap.empty[Long, (Boolean, Option[Long])]
      val sink: DataFrame => Unit = df =>
        df.select(col("doc_id"), col("is_dup"), col("dup_of"))
          .as[(Long, Boolean, Option[Long])].collect()
          .foreach { case (id, d, of) => flags(id) = (d, of) }

      val stream = spark.readStream
        .schema("doc_id LONG, text STRING").parquet(src)
      val q = IncrementalDedup.streamScreen(stream, store, sink)
      try {
        (1 to 8).foreach { step =>
          r.next() % 4 match {
            case 0 | 1 => // fresh batch: 1-4 docs over random families
              val docs = (1 to (1 + (r.next() % 4)).toInt).map { _ =>
                nextId += 1
                val f = (r.next() % 6).toInt
                (nextId, familyText(f), f)
              }
              // model: visible mates = stored keeper + lower-id mates in
              // THIS batch; twin = the highest-id visible mate
              docs.foreach { case (id, _, f) =>
                val sameBatchLower = docs.collect {
                  case (i2, _, f2) if f2 == f && i2 < id => i2 }
                val visible = keeper.get(f).toSeq ++ sameBatchLower
                expected(id) =
                  if (visible.isEmpty) (false, None)
                  else (true, Some(visible.max))
                if (!keeper.contains(f)) keeper(f) = id
              }
              batches += docs
              // ONE file per logical batch: a multi-file write leaves a
              // window where the file source could take the files in
              // separate triggers, turning batch-internal lower-id-wins
              // into file-arrival-order — the model must see the batch
              // arrive whole
              docs.map(d => (d._1, d._2)).toDF("doc_id", "text")
                .coalesce(1).write.mode("append").parquet(src)
              q.processAllAvailable()
            case 2 if batches.nonEmpty => // at-least-once replay
              val b = batches((r.next() % batches.length).toInt)
              b.map(d => (d._1, d._2)).toDF("doc_id", "text")
                .coalesce(1).write.mode("append").parquet(src)
              q.processAllAvailable() // expected verdicts unchanged
            case _ => // maintenance must be observation-invisible
              IncrementalDedup.optimize(spark, store)
          }
          assert(flags.toMap == expected.toMap,
            s"round $round step $step: verdicts diverged " +
              s"wrong=${expected.collect { case (k, v) if flags.get(k) != Some(v) => (k, v, flags.get(k)) }.take(4)}")
        }
        // the store holds exactly the family keepers — replays and dup
        // arrivals never folded anything in
        if (graft.sources.TxLog.isTable(spark, store)) {
          val stored = IncrementalDedup.loadSignatures(spark, store)
            .select("doc_id").as[Long].collect().toSet
          assert(stored == keeper.values.toSet,
            s"round $round: store should hold exactly the keepers " +
              s"(got $stored, want ${keeper.values.toSet})")
        } else assert(keeper.isEmpty,
          s"round $round: keepers exist but no store was created")
      } finally q.stop()
    }
  }
}
