package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[BandStore.prunedRead]]'s over-cap fallback: a probe batch with
  * more than [[BandStore.MaxProbeKeys]] distinct cells skips the
  * file-level prefix pruning and prunes by shard alone — the screen
  * results must be row-identical to the pruned path's. Every prior
  * gate probed protocol-sized batches, so the fallback branch was
  * live-but-unexercised.
  */
class BandStoreProbeCapSpec extends SparkSpec {
  import spark.implicits._

  test("over-cap probe falls back to shard pruning with identical screen rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bcap").toString
    // store: 100 cells × 2 docs
    val stored = spark.range(200).selectExpr(
      "concat('d', id) AS id", "cast(id % 100 AS long) AS c",
      "id * 7 AS payload")
    BandStore.writeRows(spark, dir, stored, "id", Seq(col("c")),
      out = Seq(col("c"), col("payload"), col("id")))

    def screen(read: org.apache.spark.sql.DataFrame,
        batch: org.apache.spark.sql.DataFrame) =
      read.join(batch.select("c").distinct(), Seq("c"))
        .select("id", "c", "payload")
        .collect().map(_.toSeq).toSet

    // under-cap probe: 50 of the store's cells → prefix-pruned read
    val small = spark.range(50).selectExpr("cast(id AS long) AS c")
    val prunedRead = BandStore.prunedRead(spark, dir, small,
      Seq(col("c"))).get
    // over-cap probe: same 50 cells + enough synthetic cells to blow
    // past MaxProbeKeys → the prefix collect aborts, shard-only pruning
    val big = spark.range(BandStore.MaxProbeKeys + 1000)
      .selectExpr("cast(id AS long) AS c")
    val fallbackRead = BandStore.prunedRead(spark, dir, big,
      Seq(col("c"))).get
    // ground truth: the unpruned store
    val full = graft.sources.TxLog.read(spark, dir)

    val want = screen(full, small)
    assert(want.nonEmpty)
    assert(screen(prunedRead, small) == want, "pruned path diverged")
    // the fallback read, screened against the same 50 cells, must see
    // exactly the same store rows (its read frame is a superset; the
    // screen join is what every consumer applies)
    assert(screen(fallbackRead, small) == want, "fallback path diverged")
    // and screened against its own full batch: still exactly the
    // store's matching rows, nothing dropped by the shard-only pruning
    assert(screen(fallbackRead, big) == screen(full, big))
  }
}
