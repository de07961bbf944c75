package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llmops.Text

/** Model-based interleaving fuzz for the inverted index — the third
  * member of the family (TxLogModelFuzzSpec, StreamScreenFuzzSpec).
  *
  * Seeded random sequences of index maintenance — adds of fresh docs,
  * UPDATES (the documented remove-before-image-then-index contract),
  * keyed removes, at-least-once REPLAYS of the last add batch, and
  * `optimize` (postings compaction + vacuum) — with the invariant
  * that after EVERY step the index-served ranking equals the
  * corpus-scan BM25 ranker over the reference model's documents, for
  * randomized multi-term queries (including terms no document holds).
  * The fixed TermIndexSpec scenarios pin each op once; this drives the
  * seams between them (update after optimize, replay after remove,
  * stats drift across mixed sequences). Seeded — failures reproduce. */
class TermIndexFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def rng(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L)
      .drop(1).map(x => x & Long.MaxValue)

  private val Pool: Vector[String] =
    (0 until 20).map(i => s"t$i").toVector ++ Vector("alpha", "beta")

  private def docsOf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), Text.tokens(col("text")).as("tk"))

  test("random maintenance interleavings keep index == scan ranking") {
    (1 to 2).foreach { round =>
      val r = rng(round * 48611L)
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-tifz-$round").toString + "/idx"
      def word(): String = Pool((r.next() % Pool.length).toInt)
      def text(): String =
        (1 to (4 + (r.next() % 6)).toInt).map(_ => word()).mkString(" ")

      var nextId = 0L
      val model = scala.collection.mutable.LinkedHashMap.empty[Long, String]
      var lastAdd: Seq[(Long, String)] = Seq.empty

      // seed so the index always exists and the model is never empty
      val seed = (1 to 5).map { _ => nextId += 1; (nextId, text()) }
      TermIndex.indexDocs(spark, root, docsOf(seed))
      model ++= seed
      lastAdd = seed

      (1 to 8).foreach { step =>
        r.next() % 6 match {
          case 0 | 1 => // add fresh docs
            val rows = (1 to (1 + (r.next() % 3)).toInt)
              .map { _ => nextId += 1; (nextId, text()) }
            TermIndex.indexDocs(spark, root, docsOf(rows))
            model ++= rows
            lastAdd = rows
          case 2 => // update: remove the before-image, index the new text
            val ids = model.keys.toVector
            val id = ids((r.next() % ids.length).toInt)
            val updated = text()
            TermIndex.removeDocs(spark, root, docsOf(Seq(id -> model(id))))
            TermIndex.indexDocs(spark, root, docsOf(Seq(id -> updated)))
            model(id) = updated
          case 3 if model.size > 1 => // keyed remove with the before-image
            val ids = model.keys.toVector
            val id = ids((r.next() % ids.length).toInt)
            TermIndex.removeDocs(spark, root, docsOf(Seq(id -> model(id))))
            model -= id
          case 4 if lastAdd.nonEmpty => // at-least-once replay (idempotent)
            TermIndex.indexDocs(spark, root, docsOf(lastAdd.filter {
              case (id, txt) => model.get(id).contains(txt) // not since removed/updated
            }))
          case _ => // maintenance must be ranking-invisible
            TermIndex.optimize(spark, root)
        }
        // invariant: index-served == corpus-scan, randomized queries
        (1 to 2).foreach { _ =>
          val terms = ((1 to (1 + (r.next() % 2)).toInt)
            .map(_ => word()) :+ "nosuchterm").distinct
          val viaIndex = TermIndex.rank(spark, root, terms, 50)
            .as[(Long, Long)].collect().toSeq
          val viaScan = Bm25.rank(docsOf(model.toSeq), "doc_id", "tk", terms, 50)
            .as[(Long, Long)].collect().toSeq
          assert(viaIndex == viaScan,
            s"round $round step $step terms=$terms: index diverged from scan " +
              s"(index=${viaIndex.take(5)} scan=${viaScan.take(5)})")
        }
      }
    }
  }
}
