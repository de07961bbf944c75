package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Arrival-time near-duplicate screening for IMAGE corpora — the
  * perceptual-hash twin of [[IncrementalDedup]]: the batch operator
  * (`llm_mm_phash`) finds near-dup pairs inside a static corpus; this
  * screens each arriving micro-batch against everything seen so far,
  * so an image ingest drops dups the moment they arrive instead of
  * re-pairing the corpus.
  *
  * Signature: the 64-bit average-hash ([[Multimodal.aHashBands]] —
  * codegen'd byte kernel, decode stubbed exactly as the batch op) as
  * 4 × 16-bit LSH bands. Pigeonhole: any pair within hamming distance
  * 3 shares at least one band; pairs 4..[[MaxHamming]] surface on band
  * collisions (banded-LSH semantics, the batch operator's contract).
  *
  * Store layout: [[IncrementalDedup]]'s band-sharded TxLog treatment,
  * inherited wholesale — one APPENDED row per (band j, band value,
  * doc), the full packed hash denormalized into the row (verify never
  * joins a corpus side), key `shard#j#band#doc` so files key-cluster
  * by cell, probes pruned by shard AND by cell key prefix
  * ([[graft.sources.TxLog.read]]'s `keyPrefixes`), writes Θ(batch)
  * via [[graft.sources.TxLog.append]], replays growth-free (the
  * probe's hamming-0 self-matches identify already-stored docs).
  */
object PhashDedup {

  /** Near-dup verify bound (full 64-bit hamming), = the batch
    * operator's `llm_mm_phash` threshold. */
  val MaxHamming = 10

  /** Cap on corpus candidates per band cell (smallest doc ids win —
    * recall contract identical to [[IncrementalDedup.MaxCell]]: an
    * over-cap cell still flags the batch doc, the cap only bounds
    * WHICH twin is reported). */
  val MaxCell = 64

  /** This store's cell = (j, band): the band index and its 16-bit
    * value (plumbing shared via [[BandStore]]). */
  private def cell = Seq(col("j"), col("band"))

  /** (doc_id, b0..b3) + packed 64-bit hash. Docs shorter than 64
    * bytes cannot hash (same floor as the batch operator) and are
    * excluded here; [[streamScreen]] still surfaces them as
    * `is_dup = false`. */
  def hashed(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    Multimodal.aHashBands(
        docs.filter(length(col(textCol)) >= 64), textCol)
      .select(col(idCol), col("b0"), col("b1"), col("b2"), col("b3"),
        (col("b0").cast("long") + shiftleft(col("b1").cast("long"), 16) +
          shiftleft(col("b2").cast("long"), 32) +
          shiftleft(col("b3").cast("long"), 48)).as("h"))

  /** (idCol, j, band, h): the 4 band rows of one hash. */
  private def bandRows(hs: DataFrame, idCol: String): DataFrame = {
    val bandStructs = array((0 until 4).map { j =>
      struct(lit(j).as("j"), col(s"b$j").cast("int").as("band"))
    }: _*)
    hs.select(col(idCol), col("h"), explode(bandStructs).as("b"))
      .select(col(idCol), col("b.j").as("j"), col("b.band").as("band"),
        col("h"))
  }

  /** 64-bit hamming distance between two packed hashes. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  /** Fold hashes into the band store at `tablePath`: append-only (the
    * [[IncrementalDedup]] write contract — hashes are
    * content-determined, replays re-insert identical rows, readers
    * dedup by id; cost Θ(batch), never Θ(store)). */
  def mergeHashes(spark: SparkSession, tablePath: String,
      hs: DataFrame, idCol: String = "doc_id"): Unit =
    BandStore.writeRows(spark, tablePath, bandRows(hs, idCol), idCol, cell,
      out = Seq(col("j"), col("band"),
        col(idCol).cast("long").as("doc_id"), col("h")))

  /** Store maintenance — [[BandStore.optimize]]. */
  def optimize(spark: SparkSession, tablePath: String): Unit =
    BandStore.optimize(spark, tablePath)

  /** Stored hashes back as one `(doc_id, h)` row per doc (j-0 rows
    * carry the full hash; append replays dedup here). */
  def loadHashes(spark: SparkSession, tablePath: String): DataFrame =
    graft.sources.TxLog.read(spark, tablePath)
      .filter(col("j") === 0)
      .select("doc_id", "h")
      .dropDuplicates("doc_id")

  /** Screen `bHashed` (a delta) against `cHashed` (both `(idCol, h)`
    * + bands): `(b_id, c_id, hamming)` pairs with hamming <=
    * `maxHamming`, corpus cells capped to the `maxCell` smallest ids.
    * Batch bands broadcast; the corpus side is semi-join-pruned to
    * batch-touched cells before the capping aggregate, never
    * self-joined, never broadcast. */
  def screen(bHashed: DataFrame, cHashed: DataFrame,
      idCol: String = "doc_id", maxHamming: Int = MaxHamming,
      maxCell: Int = MaxCell): DataFrame = {
    val bBands = bandRows(bHashed, idCol)
      .select(col(idCol).as("b_id"), col("j"), col("band"),
        col("h").as("h_b"))
    val cBands = bandRows(cHashed, idCol)
      .select(col("j"), col("band"), col(idCol).cast("long").as("c_id"),
        col("h").as("h_c"))
    screenBands(bBands, cBands, maxHamming, maxCell)
  }

  /** [[screen]] against the PERSISTENT band store — probe pruned to
    * the batch's shards and (under [[MaxProbeKeys]]) cell-prefix
    * files, the [[IncrementalDedup.screenStore]] shape. */
  def screenStore(bHashed: DataFrame, storePath: String,
      idCol: String = "doc_id", maxHamming: Int = MaxHamming,
      maxCell: Int = MaxCell): DataFrame = {
    val spark = bHashed.sparkSession
    val bBands = bandRows(bHashed, idCol)
      .select(col(idCol).as("b_id"), col("j"), col("band"),
        col("h").as("h_b"))
    BandStore.prunedRead(spark, storePath, bBands, cell) match {
      case None => bBands.limit(0)
        .select(col("b_id"), lit(0L).as("c_id"), lit(0L).as("hamming"))
      case Some(df) => screenBands(bBands,
        df.select(col("j"), col("band"), col("doc_id").as("c_id"),
          col("h").as("h_c")),
        maxHamming, maxCell)
    }
  }

  private def screenBands(bBands: DataFrame, cBands: DataFrame,
      maxHamming: Int, maxCell: Int): DataFrame = {
    val touched = bBands.select("j", "band").distinct()
    val capped = cBands
      .join(broadcast(touched), Seq("j", "band"), "left_semi")
      .groupBy("j", "band")
      .agg(TopK.smallestKSig(maxCell)(col("c_id"), array(col("h_c")))
        .as("p"))
      .select(col("j"), col("band"), explode(col("p")).as("q"))
      .select(col("j"), col("band"), col("q._1").as("c_id"),
        element_at(col("q._2"), 1).as("h_c"))
    capped.join(broadcast(bBands), Seq("j", "band"))
      .withColumn("hamming", hamming(col("h_b"), col("h_c")))
      .filter(col("hamming") <= maxHamming)
      .groupBy("b_id", "c_id")
      .agg(min(col("hamming")).as("hamming"))
  }

  /** Streaming ingest dedup, the [[IncrementalDedup.streamScreen]]
    * contract on images: per micro-batch, screen against the store ∪
    * the batch itself (lower id wins within a batch; arrival order
    * decides between batches), hand EVERY batch doc to `sink` as
    * `(idCol, is_dup, dup_of, hamming)` — `dup_of` the closest twin
    * (ties to the smallest id), docs too short to hash pass as
    * `is_dup = false` — then fold the novel docs' hashes. Replays
    * converge growth-free: the store probe's hamming-0 self-matches
    * are filtered from the verdict AND identify already-stored docs,
    * so the append-only fold re-inserts nothing. */
  def streamScreen(newDocs: DataFrame, storePath: String,
      sink: DataFrame => Unit, idCol: String = "doc_id",
      textCol: String = "text"): StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch.sparkSession, storePath, batch, sink,
          idCol, textCol)
      }
      .start()

  /** One micro-batch of [[streamScreen]] (public so deterministic
    * batch replays — gates, crash drills — drive the identical code
    * path the stream runs). */
  def processBatch(spark: SparkSession, storePath: String,
      batch: DataFrame, sink: DataFrame => Unit,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val hs = hashed(batch, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try BandStore.screenFold(batch, hs, idCol,
      probe = screenStore(hs, storePath, idCol),
      selfPairs = screen(hs, hs, idCol)
        .filter(col("b_id") > col("c_id")),
      bestAgg = min(struct(col("hamming"), col("c_id"))),
      bestCols = Seq(col("m.c_id").as("dup_of"),
        col("m.hamming").as("hamming")),
      sink = sink,
      foldNovel = novel => mergeHashes(spark, storePath, novel, idCol))
    finally { hs.unpersist(); () }
  }
}
