package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.TxLog

/** The incremental curation funnel: planted docs land in their stages,
  * replay converges, and the trickiest crash window (signature store
  * folded, everything else lost) re-derives identical verdicts.
  */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-cur").toString

  // ≥20 tokens with a ≥2% stopword ratio → passes the quality gate
  private val stopPad = Seq("the", "of", "and", "to", "in")
  private def words(id: Long): Seq[String] =
    stopPad ++ (1 to 20).map(w => s"w${id}_$w")
  private def doc(id: Long, ws: Seq[String]): (Long, String, String) =
    (id, if (id % 2 == 0) "web" else "books", ws.mkString(" "))
  private def normal(id: Long) = doc(id, words(id))

  private val b1 = Seq(normal(1L), normal(2L), normal(3L), normal(10L),
    normal(11L))
  private val b2 = Seq(
    doc(30L, words(10L)),                   // exact dup of doc 10
    (21L, "web", "tiny doc"),               // min_tokens fail
    doc(22L, (1 to 25).map(w => s"u$w")),   // stop_ratio fail
    normal(23L), normal(24L))
  private val b3 = Seq(
    doc(40L, words(11L).init :+ "changed"), // near dup of doc 11
    normal(41L), normal(42L))
  private val all = b1 ++ b2 ++ b3

  private def df(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "source", "text")

  private def stages(root: String): Map[Long, String] =
    TxLog.read(spark, CurationStream.decisionsPath(root))
      .select("doc_id", "stage").as[(Long, String)].collect().toMap

  test("planted docs land in their stages; every doc decided exactly once") {
    val root = freshDir()
    for ((b, i) <- Seq(b1, b2, b3).zipWithIndex)
      CurationStream.processBatch(spark, root, df(b), i.toLong)

    val dec = TxLog.read(spark, CurationStream.decisionsPath(root))
    assert(dec.count() == all.size.toLong)
    assert(dec.select("doc_id").distinct().count() == all.size.toLong)
    val st = stages(root)
    assert(st(30L) == "exact_dup", st.toString)
    assert(st(21L) == "quality_fail" && st(22L) == "quality_fail")
    assert(st(40L) == "near_dup", st.toString)
    for (id <- Seq(1L, 2L, 3L, 10L, 11L, 23L, 24L, 41L, 42L))
      assert(Set("train", "val", "test")(st(id)), s"doc $id: ${st(id)}")

    // quarantine carries the violated rule names
    val q = TxLog.read(spark, CurationStream.quarantinePath(root))
      .select("doc_id", "_violated").as[(Long, String)].collect().toMap
    assert(q(21L) == "min_tokens,stop_ratio" && q(22L) == "stop_ratio",
      q.toString)

    // curated = exactly the split-stage docs, with their split label
    val cur = TxLog.read(spark, CurationStream.curatedPath(root))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(cur.keySet == st.filter(kv =>
      Set("train", "val", "test")(kv._2)).keySet)
    assert(cur.forall { case (id, s) => st(id) == s })

    // accounting sums cover the corpus
    val acc = CurationStream.accounting(spark, root)
      .agg(sum("n_docs")).as[Long].head()
    assert(acc == all.size.toLong)
  }

  test("fully folded batch replays as a no-op") {
    val root = freshDir()
    CurationStream.processBatch(spark, root, df(b1), 0L)
    CurationStream.processBatch(spark, root, df(b2), 1L)
    val decBefore = stages(root)
    val curBefore = TxLog.read(spark, CurationStream.curatedPath(root)).count()
    val sigBefore = TxLog.read(spark, CurationStream.sigStorePath(root)).count()
    CurationStream.processBatch(spark, root, df(b2), 1L) // redelivery
    assert(stages(root) == decBefore)
    assert(TxLog.read(spark, CurationStream.curatedPath(root))
      .count() == curBefore)
    assert(TxLog.read(spark, CurationStream.sigStorePath(root))
      .count() == sigBefore)
  }

  test("start() wires the funnel onto a live stream (MemoryStream)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = freshDir()
    val mem = MemoryStream[(Long, String, String)]
    val q = CurationStream.start(
      mem.toDF().toDF("doc_id", "source", "text"), root)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()
    val st = stages(root)
    assert(st.size == all.size)
    assert(st(30L) == "exact_dup" && st(40L) == "near_dup" &&
      st(21L) == "quality_fail")
  }

  test("crash after the signature fold alone still converges on replay") {
    // two roots share batches 1-2; on the crashed one, batch 3's
    // signatures are already in the store (the fold that survived) but
    // no business rows exist — replay must stage batch 3 identically
    val control = freshDir()
    val crashed = freshDir()
    for (root <- Seq(control, crashed); (b, i) <- Seq(b1, b2).zipWithIndex)
      CurationStream.processBatch(spark, root, df(b), i.toLong)

    // the surviving fold wrote only the NOVEL signatures (doc 40 was
    // screened as a near-dup, so its signature never entered the store)
    val sigs3 = graft.llmops.IncrementalDedup.signaturesOf(
      CurationStream.featurize(df(b3))).filter(col("doc_id") =!= 40L)
    graft.llmops.IncrementalDedup.mergeSignatures(spark,
      CurationStream.sigStorePath(crashed), sigs3)

    CurationStream.processBatch(spark, control, df(b3), 2L)
    CurationStream.processBatch(spark, crashed, df(b3), 2L)
    assert(stages(crashed) == stages(control))
    // and the store did not double-grow
    assert(TxLog.read(spark, CurationStream.sigStorePath(crashed)).count() ==
      TxLog.read(spark, CurationStream.sigStorePath(control)).count())
  }
}
