package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[EmbedDedup]] — arrival-time embedding near-dup screening: the
  * vector member of the band-store family, same contract drills as
  * [[IncrementalDedupSpec]]/[[PhashDedupSpec]].
  */
class EmbedDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Pseudo-random 64-dim vectors: same seed ⇒ identical; different
    * seeds ⇒ cosine ≈ 0 (far below the 0.45 floor); seed+1000 ⇒ a
    * small perturbation of seed (cosine ≈ 0.99). */
  private def vec(seed: Int): Array[Float] = {
    val s = seed % 1000
    val base = Array.tabulate(64) { d =>
      val x0 = s * 2654435761L + d * 1099511628211L
      val x = x0 ^ (x0 >>> 13) ^ (x0 << 7)
      (math.floorMod(x, 2001L) - 1000L) / 1000.0f
    }
    if (seed >= 1000) base(3) += 0.5f
    base
  }

  private def vecs(rows: Seq[(Long, Int)]): DataFrame =
    rows.map { case (id, s) => (id, vec(s)) }.toDF("vec_id", "embedding")

  private def prep(rows: Seq[(Long, Int)]): DataFrame =
    EmbedDedup.prepared(vecs(rows))

  test("screen flags identical and perturbed vectors, not unrelated ones") {
    val corpus = prep((1 to 30).map(i => (i.toLong, i)))
    val batch = prep(Seq((101L, 3), (102L, 1007), (103L, 777)))
    val got = EmbedDedup.screen(batch, corpus)
      .select("b_id", "c_id", "sim").as[(Long, Long, Double)]
      .collect()
    assert(got.exists(r => r._1 == 101L && r._2 == 3L && r._3 > 0.999),
      s"identical vector not flagged: ${got.toSeq}")
    assert(got.exists(r => r._1 == 102L && r._2 == 7L && r._3 >= 0.9),
      s"perturbed vector not flagged: ${got.toSeq}")
    assert(!got.exists(_._1 == 103L), s"novel falsely flagged: ${got.toSeq}")
  }

  test("screenStore equals screen on the same corpus; probe is file-pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-estore").toString
    val corpus = prep((1 to 200).map(i => (i.toLong, i)))
    EmbedDedup.mergeVectors(spark, dir, corpus)
    graft.sources.TxLog.compact(spark, dir, partitionCol = "_shard",
      keyCol = "_docId", targetRowsPerFile = 8)
    val batch = prep(Seq((999L, 3), (998L, 1011)))
    val viaStore = EmbedDedup.screenStore(batch, dir)
    val got = viaStore.select("b_id", "c_id", "sim")
      .as[(Long, Long, Double)].collect().toSet
    val ref = EmbedDedup.screen(batch, corpus)
      .select("b_id", "c_id", "sim").as[(Long, Long, Double)]
      .collect().toSet
    assert(got == ref, s"store probe diverged:\n$got\n$ref")
    val snap = graft.sources.TxLog.snapshot(spark, dir)
    val scanned = viaStore.inputFiles.toSet
    val touchedShards = scanned.map(f =>
      f.substring(f.indexOf("_shard=")).split("/")(0))
    val shardFiles = snap.files
      .count(f => touchedShards.contains(s"_shard=${f.partition}"))
    assert(scanned.nonEmpty && scanned.size < shardFiles,
      s"expected file-level skipping: ${scanned.size} vs $shardFiles " +
        s"(total ${snap.files.size})")
  }

  test("streamScreen: store + batch-internal screen; novel-only growth; replay growth-free") {
    val store = java.nio.file.Files.createTempDirectory("graft-est").toString + "/vecs"
    val src = java.nio.file.Files.createTempDirectory("graft-esrc").toString
    EmbedDedup.mergeVectors(spark, store,
      prep((1 to 20).map(i => (i.toLong, i))))
    val flags = scala.collection.concurrent.TrieMap.empty[Long, (Boolean, Option[Long])]
    val sink: DataFrame => Unit = df =>
      df.select(col("vec_id"), col("is_dup"), col("dup_of"))
        .as[(Long, Boolean, Option[Long])].collect()
        .foreach { case (id, dup, of) => flags(id) = (dup, of) }
    // 101 near-dup of stored 5; 102 novel; 103 batch-internal copy of
    // 102 (lower id wins)
    val b1 = Seq((101L, 1005), (102L, 888), (103L, 888))
    vecs(b1).write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema(vecs(b1).schema).parquet(src)
    val q = EmbedDedup.streamScreen(stream, store, sink)
    try {
      q.processAllAvailable()
      assert(flags(101L) == ((true, Some(5L))), s"$flags")
      assert(flags(102L) == ((false, None)), s"$flags")
      assert(flags(103L) == ((true, Some(102L))),
        s"batch-internal dup not caught: $flags")
      // batch 2: dup of batch-1's novel vec — needs 102's fold
      vecs(Seq((201L, 888))).write.mode("append").parquet(src)
      q.processAllAvailable()
      assert(flags(201L) == ((true, Some(102L))), s"$flags")
      // REPLAY batch 1 after its fold: verdicts identical, store
      // unchanged (self-matches filtered AND excluded from the fold)
      val rowsBefore = graft.sources.TxLog.read(spark, store).count()
      vecs(b1).write.mode("append").parquet(src)
      q.processAllAvailable()
      assert(flags(102L) == ((false, None)),
        s"replayed novel vec self-flagged: ${flags(102L)}")
      assert(flags(101L) == ((true, Some(5L))), s"${flags(101L)}")
      assert(graft.sources.TxLog.read(spark, store).count() == rowsBefore,
        "replay grew the append-only store")
    } finally q.stop()
    val stored = EmbedDedup.loadVectors(spark, store)
      .select("vec_id").as[Long].collect().toSet
    assert(stored == (1L to 20L).toSet + 102L,
      s"store must grow by novel vecs only: $stored")
  }

  test("zero-norm vectors: replay growth-free, zero twins dedup, mixed pairs never match") {
    // regression: cosine 0/0 = NaN never passed the self-match filter,
    // so a stored zero vector was re-appended on EVERY redelivery —
    // unbounded store growth for degenerate vectors. A zero-norm
    // vector IS the zero vector exactly, so two are identical (sim 1)
    // and zero-vs-nonzero is sim 0 (never a dup).
    val store = java.nio.file.Files.createTempDirectory("graft-ez").toString + "/v"
    val zero = Array.fill(64)(0.0f)
    val zvecs = Seq((10L, zero), (11L, zero), (12L, vec(3)))
      .toDF("vec_id", "embedding")
    val verdicts = scala.collection.mutable.Map.empty[Long, (Boolean, Option[Long])]
    val sink: DataFrame => Unit = df =>
      df.select(col("vec_id"), col("is_dup"), col("dup_of"))
        .as[(Long, Boolean, Option[Long])].collect()
        .foreach { case (id, dup, of) => verdicts(id) = (dup, of) }
    EmbedDedup.processBatch(spark, store, zvecs, sink)
    assert(verdicts(10L) == ((false, None)), s"$verdicts")
    assert(verdicts(11L) == ((true, Some(10L))),
      s"identical zero vectors must dedup: $verdicts")
    assert(verdicts(12L) == ((false, None)),
      s"zero vs non-zero must never match: $verdicts")
    val rows = graft.sources.TxLog.read(spark, store).count()
    // at-least-once REPLAY: the stored zero vector must self-match
    // (sim 1.0, not NaN) and be excluded from the fold
    EmbedDedup.processBatch(spark, store, zvecs, sink)
    assert(verdicts(10L) == ((false, None)),
      s"replayed zero vec self-flagged: $verdicts")
    assert(graft.sources.TxLog.read(spark, store).count() == rows,
      "replay of a zero-norm vector grew the append-only store")
  }

  test("optimize cell-caps mega-cells: screen results identical, store bounded") {
    // 1100 identical vectors → ONE cell of size 1100 in each of the 10
    // LSH tables, over the MaxCell=1024 cap. The probe-side cap only
    // ever reports a cell's MaxCell smallest ids, so maintenance
    // deleting the rest is result-invisible — and it is what bounds
    // the embedding store's probe I/O (≤ 640 cells total in a 6-bit
    // bucket space: without the cap, cells grow with the corpus and
    // probes read Θ(store)).
    val N = EmbedDedup.MaxCell
    val dir = java.nio.file.Files.createTempDirectory("graft-ecap").toString
    val corpus = prep((1 to (N + 76)).map(i => (i.toLong, 7)))
    EmbedDedup.mergeVectors(spark, dir, corpus)
    val batch = prep(Seq((99999L, 7), (99998L, 333))).localCheckpoint()
    val before = EmbedDedup.screenStore(batch, dir)
      .select("b_id", "c_id", "sim").as[(Long, Long, Double)]
      .collect().toSet
    assert(before.exists(r => r._1 == 99999L && r._2 == 1L && r._3 > 0.999),
      s"fixture sanity: ${before.take(5)}")
    val rowsBefore = graft.sources.TxLog.read(spark, dir).count()
    EmbedDedup.optimize(spark, dir)
    val after = EmbedDedup.screenStore(batch, dir)
      .select("b_id", "c_id", "sim").as[(Long, Long, Double)]
      .collect().toSet
    assert(after == before, "cell cap changed screen results")
    val rowsAfter = graft.sources.TxLog.read(spark, dir).count()
    // (N+76) vecs × 10 tables → capped to N × 10
    assert(rowsAfter == 10L * N && rowsBefore == 10L * (N + 76),
      s"expected ${10L * (N + 76)} → ${10L * N} rows, " +
        s"got $rowsBefore → $rowsAfter")
    // loadVectors now returns the SCREENABLE corpus (the kept cap set)
    val loaded = EmbedDedup.loadVectors(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    assert(loaded == (1L to N.toLong).toSet, s"${loaded.size}")
    // idempotent: a second maintenance cycle deletes nothing
    EmbedDedup.optimize(spark, dir)
    assert(graft.sources.TxLog.read(spark, dir).count() == 10L * N,
      "cap re-deleted on an already-capped store")
  }

  test("loadVectors round-trips the denormalized payload") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ert").toString
    val vs = prep((1 to 10).map(i => (i.toLong, i)))
    EmbedDedup.mergeVectors(spark, dir, vs)
    val back = EmbedDedup.loadVectors(spark, dir)
    assert(back.count() == 10)
    val joined = back
      .withColumnRenamed("e", "e2").withColumnRenamed("nrm", "nrm2")
      .join(vs, "vec_id")
      .filter(not(col("e") === col("e2")) || col("nrm") =!= col("nrm2"))
    assert(joined.isEmpty, "stored payload differs from computed")
  }
}
