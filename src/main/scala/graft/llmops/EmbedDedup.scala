package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Arrival-time EMBEDDING near-duplicate screening — the third member
  * of the band-store family ([[IncrementalDedup]] text MinHash,
  * [[PhashDedup]] image aHash): each arriving micro-batch of vectors
  * screens against everything seen so far at exact cosine >=
  * [[SimThreshold]], candidates drawn from the SAME 10 x 6-bit
  * random-hyperplane LSH tables as the batch operator
  * (`llm_dedup_embed_lsh`, [[Similarity.lshBucketArray]] — pure
  * integer hyperplanes, so an oracle reproduces bucket assignment
  * exactly).
  *
  * Store layout: the [[IncrementalDedup]] treatment — one APPENDED row
  * per (table, bucket, vec), with the vector AND its norm denormalized
  * into the row so the cosine verify never joins a corpus side
  * (LshTables x (8 B x dim) ≈ 5 KB/vec at dim 64 — the inverted-index
  * disk-for-probe-I/O trade, same as the signature stores). Probes
  * prune to the batch's bucket shards and cell-prefix files; writes
  * are Θ(batch) via [[graft.sources.TxLog.append]]; replays converge
  * growth-free (the probe's id self-matches identify stored vecs).
  *
  * Recall contract = the batch operator's: collide in >= 1 table
  * (miss for a 0.9-similar pair <= 0.47^10 ≈ 5e-4; intentionally
  * lossy near the 0.45 floor), corpus cells capped to the
  * [[SkewGuard.MaxCellSize]] smallest ids — an over-cap cell still
  * flags the arrival, the cap only bounds WHICH twin is reported.
  */
object EmbedDedup {

  /** Near-dup cosine floor, = `llm_dedup_embed_lsh`'s. */
  val SimThreshold = 0.45

  /** Per-cell candidate cap, = the batch operator's SkewGuard cap. */
  val MaxCell: Int = SkewGuard.MaxCellSize

  /** This store's cell = (t, b): LSH table index and bucket (plumbing
    * shared via [[BandStore]]). */
  private def cell = Seq(col("t"), col("b"))

  private def dot(x: Column, y: Column): Column =
    call_function("graft_dot", x, y)

  /** (idCol, e, nrm) — double vector + norm off the raw embedding. */
  def prepared(vecs: DataFrame, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.register(vecs.sparkSession)
    vecs.select(col(idCol), Similarity.asDouble(col(embCol)).as("e"))
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))
  }

  /** (idCol, t, b, e, nrm): one row per LSH table. */
  private def bandRows(vs: DataFrame, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(vs.sparkSession)
    vs.select(col(idCol), col("e"), col("nrm"),
        posexplode(Similarity.lshBucketArray(col("e"))).as(Seq("t", "b")))
  }

  /** Fold prepared vectors into the band store: append-only, one row
    * per (table, vec) with `[nrm, e...]` packed as the payload. */
  def mergeVectors(spark: SparkSession, tablePath: String,
      vs: DataFrame, idCol: String = "vec_id"): Unit =
    BandStore.writeRows(spark, tablePath, bandRows(vs, idCol), idCol, cell,
      out = Seq(col("t"), col("b"), col(idCol).cast("long").as("vec_id"),
        concat(array(col("nrm")), col("e")).as("p")))

  /** Store maintenance — cell-cap BEFORE compact: the 10×6-bit LSH
    * bucket space is ≤ 640 cells TOTAL, so without the cap every cell
    * grows with the corpus and a probe reads Θ(store) per trigger
    * (the text/image stores' cells are plentiful and rarely bind, so
    * they skip this step). [[BandStore.capCells]] is result-invisible
    * — it deletes exactly the rows the probe-side cap could never
    * report — and bounds a probe to ≤ cells × [[MaxCell]] rows at any
    * corpus size. Note [[loadVectors]] thereafter returns the
    * SCREENABLE corpus (capped-out vectors' rows are gone). */
  def optimize(spark: SparkSession, tablePath: String): Unit = {
    BandStore.capCells(spark, tablePath, Seq("t", "b"), "vec_id", MaxCell)
    BandStore.optimize(spark, tablePath)
  }

  /** Stored vectors back as one `(vec_id, e, nrm)` row per vec
    * (table-0 rows carry the payload; append replays dedup here). */
  def loadVectors(spark: SparkSession, tablePath: String): DataFrame =
    graft.sources.TxLog.read(spark, tablePath)
      .filter(col("t") === 0)
      .select(col("vec_id"),
        slice(col("p"), lit(2), size(col("p")) - 1).as("e"),
        element_at(col("p"), 1).as("nrm"))
      .dropDuplicates("vec_id")

  /** Screen `bVecs` (a delta, prepared) against `cVecs` (prepared):
    * `(b_id, c_id, sim)` pairs at sim >= `minSim`; corpus cells capped
    * to the `maxCell` smallest ids; batch bands broadcast, corpus side
    * semi-join-pruned to batch-touched cells, never self-joined or
    * broadcast. */
  def screen(bVecs: DataFrame, cVecs: DataFrame,
      idCol: String = "vec_id", minSim: Double = SimThreshold,
      maxCell: Int = MaxCell): DataFrame = {
    val bBands = bandRows(bVecs, idCol)
      .select(col(idCol).as("b_id"), col("t"), col("b"),
        col("e").as("e_b"), col("nrm").as("n_b"))
    val cBands = bandRows(cVecs, idCol)
      .select(col("t"), col("b"), col(idCol).cast("long").as("c_id"),
        concat(array(col("nrm")), col("e")).as("p"))
    screenBands(bBands, cBands, minSim, maxCell)
  }

  /** [[screen]] against the PERSISTENT band store — probe pruned to
    * the batch's shards and (under [[MaxProbeKeys]]) cell-prefix
    * files. An absent store screens as empty. */
  def screenStore(bVecs: DataFrame, storePath: String,
      idCol: String = "vec_id", minSim: Double = SimThreshold,
      maxCell: Int = MaxCell): DataFrame = {
    val spark = bVecs.sparkSession
    val bBands = bandRows(bVecs, idCol)
      .select(col(idCol).as("b_id"), col("t"), col("b"),
        col("e").as("e_b"), col("nrm").as("n_b"))
    BandStore.prunedRead(spark, storePath, bBands, cell) match {
      case None => bBands.limit(0)
        .select(col("b_id"), lit(0L).as("c_id"), lit(0.0).as("sim"))
      case Some(df) => screenBands(bBands,
        df.select(col("t"), col("b"), col("vec_id").as("c_id"), col("p")),
        minSim, maxCell)
    }
  }

  private def screenBands(bBands: DataFrame, cBands: DataFrame,
      minSim: Double, maxCell: Int): DataFrame = {
    val touched = bBands.select("t", "b").distinct()
    val capped = cBands
      .join(broadcast(touched), Seq("t", "b"), "left_semi")
      .groupBy("t", "b")
      .agg(TopK.smallestKVecD(maxCell)(col("c_id"), col("p")).as("q"))
      .select(col("t"), col("b"), explode(col("q")).as("r"))
      .select(col("t"), col("b"), col("r._1").as("c_id"),
        element_at(col("r._2"), 1).as("n_c"),
        slice(col("r._2"), lit(2), size(col("r._2")) - 1).as("e_c"))
    capped.join(broadcast(bBands), Seq("t", "b"))
      // zero-norm guard: 0/0 = NaN would fail every sim filter — so a
      // stored zero vector never self-matches and replay re-appends it
      // forever. A zero-norm double vector IS the zero vector exactly,
      // so two of them are identical (sim 1.0); one zero against a
      // non-zero vector is sim 0 (never a dup), matching the NaN
      // filter's old behavior for the mixed case.
      .withColumn("sim",
        when((col("n_b") === 0) && (col("n_c") === 0), lit(1.0))
          .when((col("n_b") === 0) || (col("n_c") === 0), lit(0.0))
          .otherwise(dot(col("e_b"), col("e_c")) /
            (col("n_b") * col("n_c"))))
      .filter(col("sim") >= minSim)
      .groupBy("b_id", "c_id")
      .agg(max(col("sim")).as("sim"))
  }

  /** Streaming ingest dedup, the family contract on vectors: per
    * micro-batch, screen against the store ∪ the batch itself (lower
    * id wins within a batch; arrival order decides between batches),
    * hand EVERY batch vec to `sink` as `(idCol, is_dup, dup_of, sim)`
    * — `dup_of` the most-similar stored twin (ties to the smallest
    * id) — then fold the novel vectors. Replays converge growth-free. */
  def streamScreen(newVecs: DataFrame, storePath: String,
      sink: DataFrame => Unit, idCol: String = "vec_id",
      embCol: String = "embedding"): StreamingQuery =
    newVecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch.sparkSession, storePath, batch, sink,
          idCol, embCol)
      }
      .start()

  /** One micro-batch of [[streamScreen]] (public for deterministic
    * batch replays — gates and crash drills). */
  def processBatch(spark: SparkSession, storePath: String,
      batch: DataFrame, sink: DataFrame => Unit,
      idCol: String = "vec_id", embCol: String = "embedding"): Unit = {
    val vs = prepared(batch, idCol, embCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // most-similar twin, ties to the smallest id (min on (-sim, id))
    try BandStore.screenFold(batch, vs, idCol,
      probe = screenStore(vs, storePath, idCol),
      selfPairs = screen(vs, vs, idCol)
        .filter(col("b_id") > col("c_id")),
      bestAgg = min(struct(negate(col("sim")).as("nsim"), col("c_id"))),
      bestCols = Seq(col("m.c_id").as("dup_of"),
        negate(col("m.nsim")).as("sim")),
      sink = sink,
      foldNovel = novel => mergeVectors(spark, storePath, novel, idCol))
    finally { vs.unpersist(); () }
  }
}
