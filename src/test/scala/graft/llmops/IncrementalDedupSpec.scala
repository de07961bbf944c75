package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[IncrementalDedup]] — batch-vs-corpus screening from signatures
  * alone, the TxLog signature store, and the streaming ingest loop.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Docs with planted near-duplicates: `mk(i, seed)` repeats seeded
    * tokens; same seed ⇒ identical text, seed pairs (x, x+1000) differ
    * by a one-token suffix ⇒ near-dup. */
  private def doc(seed: Int): String = {
    val s = seed % 1000
    val base = (1 to 40)
      .map(k => s"w${(s * 131 + k * 17) % 9973}").mkString(" ")
    if (seed >= 1000) base + " tail" else base
  }

  private def sigsOf(rows: Seq[(Long, String)]): DataFrame =
    IncrementalDedup.signaturesOf(rows.toDF("doc_id", "text"))

  test("screen equals the uncapped unhinted reference join on planted dups") {
    // corpus seeds 1..30; batch: 101 dup-of-corpus-3 (identical), 102
    // near-dup of corpus-7 (suffix), 103 novel
    val corpus = sigsOf((1 to 30).map(i => (i.toLong, doc(i))))
    val batch = sigsOf(Seq(
      (101L, doc(3)), (102L, doc(1007) /* near dup of 7 */),
      (103L, (1 to 40).map(k => s"z$k").mkString(" "))))
    val got = IncrementalDedup.screen(batch, corpus)
      .select("b_id", "c_id", "n_match").as[(Long, Long, Long)]
      .collect().toSet
    // reference: plain band join, no cap, no hints — same contract
    val bb = IncrementalDedup.bandKeys(batch).withColumnRenamed("doc_id", "b_id")
    val cb = IncrementalDedup.bandKeys(corpus).withColumnRenamed("doc_id", "c_id")
    val naive = bb.join(cb, Seq("band", "bkey")).select("b_id", "c_id").distinct()
      .join(batch.select(col("doc_id").as("b_id"), col("sig").as("sb")), "b_id")
      .join(corpus.select(col("doc_id").as("c_id"), col("sig").as("sc")), "c_id")
      .withColumn("n_match",
        IncrementalDedup.slotMatches(col("sb"), col("sc")))
      .filter(col("n_match") >= IncrementalDedup.DupThreshold)
      .select("b_id", "c_id", "n_match").as[(Long, Long, Long)]
      .collect().toSet
    assert(got == naive)
    assert(got.exists { case (b, c, n) => b == 101L && c == 3L && n == 64L },
      s"identical dup not flagged: $got")
    assert(got.exists { case (b, c, _) => b == 102L && c == 7L },
      s"near dup not flagged: $got")
    assert(!got.exists(_._1 == 103L), "novel doc falsely flagged")
  }

  test("over-cap corpus cells still flag the batch doc (recall contract)") {
    // 200 identical corpus docs — every band cell has 200 members, far
    // over the cap; one identical batch doc must still be flagged, with
    // candidates drawn from the cap's smallest ids
    val corpus = sigsOf((1 to 200).map(i => (i.toLong, doc(42))))
    val batch = sigsOf(Seq((999L, doc(42))))
    val got = IncrementalDedup.screen(batch, corpus, maxCell = 8)
      .select("c_id").as[Long].collect().toSet
    assert(got.nonEmpty && got == (1L to 8L).toSet,
      s"expected the 8 smallest corpus ids as candidates: $got")
  }

  test("plan: corpus side is never broadcast; batch bands are") {
    val corpus = sigsOf((1 to 50).map(i => (i.toLong, doc(i))))
    val batch = sigsOf(Seq((101L, doc(3))))
    val plan = IncrementalDedup.screen(batch, corpus)
      .queryExecution.executedPlan.toString
    // two broadcasts: the touched-cells semi-join and the candidate
    // join — both of BATCH-derived frames (tiny); the corpus reaches
    // its joins through exchanges/aggregates only
    assert(plan.contains("BroadcastExchange"), plan.take(2000))
    val stats = "BroadcastNestedLoop"
    assert(!plan.contains(stats), "corpus-sized broadcast in the plan")
  }

  test("screenStore equals screen on the same corpus (pruned probe, same contract)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bstore").toString
    val corpus = sigsOf((1 to 30).map(i => (i.toLong, doc(i))))
    IncrementalDedup.mergeSignatures(spark, dir, corpus)
    val batch = sigsOf(Seq(
      (101L, doc(3)), (102L, doc(1007)),
      (103L, (1 to 40).map(k => s"z$k").mkString(" "))))
    val viaStore = IncrementalDedup.screenStore(batch, dir)
      .select("b_id", "c_id", "n_match").as[(Long, Long, Long)]
      .collect().toSet
    val viaFrames = IncrementalDedup.screen(batch, corpus)
      .select("b_id", "c_id", "n_match").as[(Long, Long, Long)]
      .collect().toSet
    assert(viaStore == viaFrames,
      s"store probe diverged from the frame screen:\n$viaStore\n$viaFrames")
    assert(viaStore.exists { case (b, c, n) => b == 101L && c == 3L && n == 64L })
    // maintenance is row-invisible: the compaction+vacuum cycle the
    // probe's file skipping depends on changes nothing a screen sees
    IncrementalDedup.optimize(spark, dir)
    val afterOpt = IncrementalDedup.screenStore(batch, dir)
      .select("b_id", "c_id", "n_match").as[(Long, Long, Long)]
      .collect().toSet
    assert(afterOpt == viaFrames, "optimize changed screen results")
  }

  test("screenStore probe is PRUNED: scanned files are a strict subset of store files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bprune").toString
    // several appends → several files per shard; compact with a tiny
    // file target so shards split into KEY-DISJOINT files — the layout
    // a maintained store has — making file-level skipping observable
    (0 until 4).foreach { g =>
      IncrementalDedup.mergeSignatures(spark, dir,
        sigsOf((g * 50 + 1 to g * 50 + 50).map(i => (i.toLong, doc(i)))))
    }
    graft.sources.TxLog.compact(spark, dir, partitionCol = "_shard",
      keyCol = "_docId", targetRowsPerFile = 16)
    val snap = graft.sources.TxLog.snapshot(spark, dir)
    val allFiles = snap.files.map(_.path).toSet
    val batch = sigsOf(Seq((999L, doc(3)))) // one doc: 16 band cells
    val probed = IncrementalDedup.screenStore(batch, dir)
    val scanned = probed.inputFiles.toSet
    assert(scanned.nonEmpty, "probe must read the store")
    assert(scanned.size < allFiles.size,
      s"probe must skip files: scanned ${scanned.size} of ${allFiles.size}")
    // and the skipping goes BELOW shard granularity: fewer files than
    // the touched shards hold in total (keyPrefixes at work, not just
    // partition pruning)
    val touchedShards = scanned.map(f =>
      f.substring(f.indexOf("_shard=")).split("/")(0))
    val shardFiles = snap.files
      .count(f => touchedShards.contains(s"_shard=${f.partition}"))
    assert(scanned.size < shardFiles,
      s"expected file-level skipping inside shards: ${scanned.size} vs $shardFiles")
    // the pruned probe still finds the planted dup
    assert(probed.filter(col("c_id") === 3L).count() == 1)
  }

  test("smallestKSig: k smallest DISTINCT ids with payloads; replays don't consume slots") {
    val rows = Seq(
      (1L, Seq(10L, 11L)), (3L, Seq(30L, 31L)), (2L, Seq(20L, 21L)),
      (2L, Seq(20L, 21L)), (1L, Seq(10L, 11L)), // append replays
      (5L, Seq(50L, 51L)), (4L, Seq(40L, 41L)))
      .toDF("id", "sig").withColumn("g", lit("a"))
    val got = rows.groupBy("g")
      .agg(TopK.smallestKSig(3)(col("id"), col("sig")).as("p"))
      .select(explode(col("p")).as("q"))
      .select(col("q._1").as("id"), col("q._2").as("sig"))
      .as[(Long, Seq[Long])].collect().toSeq
    assert(got == Seq((1L, Seq(10L, 11L)), (2L, Seq(20L, 21L)),
      (3L, Seq(30L, 31L))), s"got $got")
  }

  test("TxLog signature store: merge is idempotent, load round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sigstore").toString
    val sigs = sigsOf((1 to 10).map(i => (i.toLong, doc(i))))
    IncrementalDedup.mergeSignatures(spark, dir, sigs)
    IncrementalDedup.mergeSignatures(spark, dir, sigs) // redelivery
    val back = IncrementalDedup.loadSignatures(spark, dir)
    assert(back.count() == 10)
    val joined = back.withColumnRenamed("sig", "sig2")
      .join(sigs, "doc_id")
      .filter(not(col("sig") === col("sig2")))
    assert(joined.isEmpty, "stored signatures differ from computed ones")
  }

  test("streamScreen: screens against the store AND earlier batches; store grows by novel docs only") {
    val store = java.nio.file.Files.createTempDirectory("graft-incs").toString + "/sigs"
    val src = java.nio.file.Files.createTempDirectory("graft-incsrc").toString
    // seed the store with corpus seeds 1..20
    IncrementalDedup.mergeSignatures(spark, store,
      sigsOf((1 to 20).map(i => (i.toLong, doc(i)))))
    val flags = scala.collection.concurrent.TrieMap.empty[Long, (Boolean, Option[Long])]
    val sink: DataFrame => Unit = df =>
      df.select(col("doc_id"), col("is_dup"), col("dup_of"))
        .as[(Long, Boolean, Option[Long])].collect()
        .foreach { case (id, d, of) => flags(id) = (d, of) }
    // batch 1: 101 dup-of-5, 102 novel, 103 batch-INTERNAL copy of 102
    // (the lower id wins: 102 stays novel, 103 flags dup_of 102), 104
    // too short to shingle — must still surface in the verdict frame
    Seq((101L, doc(5)), (102L, (1 to 40).map(k => s"q$k").mkString(" ")),
        (103L, (1 to 40).map(k => s"q$k").mkString(" ")),
        (104L, "too short"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(src)
    val q = IncrementalDedup.streamScreen(stream, store, sink)
    try {
      q.processAllAvailable()
      assert(flags(101L)._1 && flags(101L)._2.contains(5L), s"$flags")
      assert(!flags(102L)._1)
      assert(flags(103L)._1 && flags(103L)._2.contains(102L),
        s"batch-internal dup not caught: $flags")
      assert(flags.contains(104L) && !flags(104L)._1,
        s"sub-shingle doc missing from the verdict frame: $flags")
      // batch 2: 201 dup of batch-1's NOVEL doc 102 — caught only if
      // 102's signature was merged into the store
      Seq((201L, (1 to 40).map(k => s"q$k").mkString(" ")))
        .toDF("doc_id", "text").write.mode("append").parquet(src)
      q.processAllAvailable()
      assert(flags(201L)._1 && flags(201L)._2.contains(102L), s"$flags")
    } finally q.stop()
    // store holds corpus + the two novel docs; dups were NOT merged
    val stored = IncrementalDedup.loadSignatures(spark, store)
      .select("doc_id").as[Long].collect().toSet
    assert(stored == (1L to 20L).toSet + 102L,
      s"store must grow by novel docs only: $stored")
  }

  test("streamScreen replay converges: a batch re-screened AFTER its signatures merged does not self-flag") {
    // foreachBatch is at-least-once: a crash between mergeSignatures and
    // the checkpoint commit redelivers the batch with its novel docs
    // ALREADY in the store. Each redelivered doc then collides with its
    // own stored signature (n_match = 64) — without the b_id =!= c_id
    // guard on the store leg the self-match out-ranks any real twin and
    // the doc is reported as a dup of ITSELF. The verdicts must instead
    // be identical across the original run and the replay.
    val store = java.nio.file.Files.createTempDirectory("graft-rply").toString + "/sigs"
    val src = java.nio.file.Files.createTempDirectory("graft-rplysrc").toString
    IncrementalDedup.mergeSignatures(spark, store,
      sigsOf((1 to 10).map(i => (i.toLong, doc(i)))))
    val flags = scala.collection.concurrent.TrieMap.empty[Long, (Boolean, Option[Long])]
    val sink: DataFrame => Unit = df =>
      df.select(col("doc_id"), col("is_dup"), col("dup_of"))
        .as[(Long, Boolean, Option[Long])].collect()
        .foreach { case (id, d, of) => flags(id) = (d, of) }
    // 101 dup-of-5; 102 novel (will be merged, then redelivered)
    val rows = Seq((101L, doc(5)), (102L, (1 to 40).map(k => s"r$k").mkString(" ")))
    rows.toDF("doc_id", "text").write.mode("append").parquet(src)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(src)
    val q = IncrementalDedup.streamScreen(stream, store, sink)
    try {
      q.processAllAvailable()
      val first = flags.toMap
      assert(first(101L) == ((true, Some(5L))) && first(102L) == ((false, None)),
        s"pre-replay verdicts wrong: $first")
      // REPLAY: the same rows arrive again (new files, same content —
      // exactly what redelivery looks like to foreachBatch). 102's own
      // signature is now in the store.
      rows.toDF("doc_id", "text").write.mode("append").parquet(src)
      q.processAllAvailable()
      assert(flags(102L) == ((false, None)),
        s"replayed novel doc self-flagged as its own dup: ${flags(102L)}")
      assert(flags(101L) == ((true, Some(5L))),
        s"replayed dup lost its real twin: ${flags(101L)}")
    } finally q.stop()
    // idempotent re-merge: the store is unchanged by the replay
    val stored = IncrementalDedup.loadSignatures(spark, store)
      .select("doc_id").as[Long].collect().toSet
    assert(stored == (1L to 10L).toSet + 102L, s"store drifted on replay: $stored")
  }
}
