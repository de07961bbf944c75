package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[PhashDedup]] — arrival-time perceptual-hash screening: the
  * image-corpus twin of [[IncrementalDedupSpec]], same band-store
  * contract (pruned probe, append-only folds, growth-free replay).
  */
class PhashDedupSpec extends SparkSpec {
  import spark.implicits._

  /** ≥ 64-byte pseudo-random ASCII payloads; same seed ⇒ identical
    * bytes; seed pairs (x, x+1000) differ in two sampled bytes ⇒
    * near-dup (hamming a few bits); unrelated seeds differ in ~half
    * the hash bits (far above MaxHamming). Chars stay ≤ 126 so the
    * UTF-8 binary cast is byte-per-char. */
  private def payload(seed: Int): String = {
    val s = seed % 1000
    val base = Array.tabulate(128) { i =>
      // xorshift mix — a LINEAR byte rule would make different seeds
      // mere rotations of one residue cycle (colliding aHashes)
      val x0 = s * 2654435761L + i * 1099511628211L
      val x = x0 ^ (x0 >>> 13) ^ (x0 << 7)
      (33 + math.floorMod(x, 94L)).toChar
    }
    if (seed >= 1000) { base(2) = 126.toChar; base(4) = 126.toChar }
    new String(base)
  }

  private def hs(rows: Seq[(Long, String)]): DataFrame =
    PhashDedup.hashed(rows.toDF("doc_id", "text"))

  test("screen flags identical and near payloads, not unrelated ones") {
    val corpus = hs((1 to 30).map(i => (i.toLong, payload(i))))
    val batch = hs(Seq(
      (101L, payload(3)),            // identical to corpus 3
      (102L, payload(1007)),         // near-dup of corpus 7
      (103L, payload(777))))         // novel
    val got = PhashDedup.screen(batch, corpus)
      .select("b_id", "c_id", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    assert(got.exists { case (b, c, h) => b == 101L && c == 3L && h == 0L },
      s"identical payload not flagged: $got")
    assert(got.exists { case (b, c, h) =>
      b == 102L && c == 7L && h <= PhashDedup.MaxHamming }, s"$got")
    assert(!got.exists(_._1 == 103L), s"novel falsely flagged: $got")
  }

  test("screenStore equals screen on the same corpus; probe is file-pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-phstore").toString
    val corpus = hs((1 to 200).map(i => (i.toLong, payload(i))))
    PhashDedup.mergeHashes(spark, dir, corpus)
    graft.sources.TxLog.compact(spark, dir, partitionCol = "_shard",
      keyCol = "_docId", targetRowsPerFile = 4)
    val batch = hs(Seq((999L, payload(3)), (998L, payload(1011))))
    val viaStore = PhashDedup.screenStore(batch, dir)
    val got = viaStore.select("b_id", "c_id", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    val ref = PhashDedup.screen(batch, corpus)
      .select("b_id", "c_id", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == ref, s"store probe diverged:\n$got\n$ref")
    // pruning observed below shard granularity (the IncrementalDedup
    // contract: keyPrefixes at work, not just partition pruning)
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

  test("streamScreen: store + batch-internal screen; novel-only growth; short docs surface") {
    val store = java.nio.file.Files.createTempDirectory("graft-phst").toString + "/hashes"
    val src = java.nio.file.Files.createTempDirectory("graft-phsrc").toString
    PhashDedup.mergeHashes(spark, store,
      hs((1 to 20).map(i => (i.toLong, payload(i)))))
    val flags = scala.collection.concurrent.TrieMap.empty[Long, (Boolean, Option[Long])]
    val sink: DataFrame => Unit = df =>
      df.select(col("doc_id"), col("is_dup"), col("dup_of"))
        .as[(Long, Boolean, Option[Long])].collect()
        .foreach { case (id, dup, of) => flags(id) = (dup, of) }
    // 101 dup-of-5; 102 novel; 103 batch-internal copy of 102 (lower id
    // wins); 104 too short to hash — must still surface
    Seq((101L, payload(5)), (102L, payload(888)), (103L, payload(888)),
        (104L, "short"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(src)
    val q = PhashDedup.streamScreen(stream, store, sink)
    try {
      q.processAllAvailable()
      assert(flags(101L) == ((true, Some(5L))), s"$flags")
      assert(flags(102L) == ((false, None)), s"$flags")
      assert(flags(103L) == ((true, Some(102L))),
        s"batch-internal dup not caught: $flags")
      assert(flags(104L) == ((false, None)),
        s"sub-hash doc missing from the verdict: $flags")
      // batch 2: dup of batch-1's novel doc — caught only if 102's
      // hash was folded
      Seq((201L, payload(888))).toDF("doc_id", "text")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      assert(flags(201L) == ((true, Some(102L))), s"$flags")
    } finally q.stop()
    val stored = PhashDedup.loadHashes(spark, store)
      .select("doc_id").as[Long].collect().toSet
    assert(stored == (1L to 20L).toSet + 102L,
      s"store must grow by novel docs only: $stored")
  }

  test("streamScreen replay converges growth-free after the fold (crash window)") {
    // crash between mergeHashes and the checkpoint commit: the batch
    // replays with its novel hashes already stored — verdicts must be
    // identical (no self-flag) and the store must not grow
    val store = java.nio.file.Files.createTempDirectory("graft-phrp").toString + "/hashes"
    val src = java.nio.file.Files.createTempDirectory("graft-phrpsrc").toString
    PhashDedup.mergeHashes(spark, store,
      hs((1 to 10).map(i => (i.toLong, payload(i)))))
    val flags = scala.collection.concurrent.TrieMap.empty[Long, (Boolean, Option[Long])]
    val sink: DataFrame => Unit = df =>
      df.select(col("doc_id"), col("is_dup"), col("dup_of"))
        .as[(Long, Boolean, Option[Long])].collect()
        .foreach { case (id, dup, of) => flags(id) = (dup, of) }
    val rows = Seq((101L, payload(5)), (102L, payload(901)))
    rows.toDF("doc_id", "text").write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(src)
    val q = PhashDedup.streamScreen(stream, store, sink)
    try {
      q.processAllAvailable()
      val first = flags.toMap
      assert(first(101L) == ((true, Some(5L))) &&
        first(102L) == ((false, None)), s"$first")
      val rowsBefore = graft.sources.TxLog.read(spark, store).count()
      rows.toDF("doc_id", "text").write.mode("append").parquet(src)
      q.processAllAvailable()
      assert(flags(102L) == ((false, None)),
        s"replayed novel doc self-flagged: ${flags(102L)}")
      assert(flags(101L) == ((true, Some(5L))), s"${flags(101L)}")
      assert(graft.sources.TxLog.read(spark, store).count() == rowsBefore,
        "replay grew the append-only store")
    } finally q.stop()
  }
}
