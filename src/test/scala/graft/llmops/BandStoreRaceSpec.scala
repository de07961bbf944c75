package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Band-store maintenance vs probe CONCURRENCY: [[BandStore.optimize]]
  * (compact + vacuum) and replay appends race [[IncrementalDedup
  * .screenStore]] across two real JVMs. The store contract argues
  * row-invisibility from TxLog snapshot isolation (probes resolve a
  * committed snapshot; compaction supersedes files without deleting
  * them until the vacuum horizon); this spec exercises it — every
  * probe taken during the churn must equal the serial pre-race result.
  */
class BandStoreRaceSpec extends SparkSpec {
  import spark.implicits._

  private def doc(seed: Int): String = {
    val s = seed % 1000
    val base = (1 to 40)
      .map(k => s"w${(s * 131 + k * 17) % 9973}").mkString(" ")
    if (seed >= 1000) base + " tail" else base
  }

  private def sigsOf(rows: Seq[(Long, String)]): DataFrame =
    IncrementalDedup.signaturesOf(rows.toDF("doc_id", "text"))

  test("optimize + replay appends racing screenStore across processes: probes row-identical to the serial run") {
    val base = java.nio.file.Files.createTempDirectory("graft-bsrace")
    val store = s"$base/store"
    val sigsPath = s"$base/sigs.parquet"
    val ready = s"$base/_child.ready"
    val log = java.nio.file.Files.createTempFile("graft-bsrace-child", ".log").toFile
    val corpus = sigsOf((1 to 60).map(i => (i.toLong, doc(i))))
    corpus.write.parquet(sigsPath)
    IncrementalDedup.mergeSignatures(spark, store, corpus)
    val batch = sigsOf(Seq(
      (101L, doc(3)), (102L, doc(1007)),
      (103L, (1 to 40).map(k => s"z$k").mkString(" "))))
      .localCheckpoint()
    def probe(): Set[(Long, Long, Long)] =
      IncrementalDedup.screenStore(batch, store)
        .select("b_id", "c_id", "n_match").as[(Long, Long, Long)]
        .collect().toSet
    val serial = probe()
    assert(serial.exists { case (b, c, n) => b == 101L && c == 3L && n == 64L },
      s"fixture sanity: $serial")
    try {
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar"
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val cmd = Seq(
        s"${System.getProperty("java.home")}/bin/java") ++ addOpens ++ Seq(
        "-Xmx2g", "-cp", System.getProperty("java.class.path"),
        "graft.llmops.BandRaceChild", store, sigsPath, "3", ready)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      pb.redirectOutput(log)
      val child = pb.start()
      val readyP = java.nio.file.Paths.get(ready)
      val deadline = System.currentTimeMillis() + 180000
      while (!java.nio.file.Files.exists(readyP) && child.isAlive &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(java.nio.file.Files.exists(readyP),
        s"child JVM never came up:\n${scala.io.Source.fromFile(log).mkString.takeRight(2000)}")
      // the contention window: probe continuously while the child
      // appends and compacts; every result must match the serial run
      var probes = 0
      while (child.isAlive && System.currentTimeMillis() < deadline) {
        val got = probe()
        probes += 1
        assert(got == serial,
          s"probe #$probes diverged during maintenance churn:\n$got\n$serial")
      }
      assert(child.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        "child JVM did not finish")
      assert(child.exitValue() == 0,
        s"child JVM failed:\n${scala.io.Source.fromFile(log).mkString.takeRight(2000)}")
      assert(probes >= 2, s"contention window too short: $probes probes")
      // after the churn: probes still serial-identical, and the store
      // still loads one signature per doc (replays dedup on read)
      assert(probe() == serial, "post-race probe diverged")
      val loaded = IncrementalDedup.loadSignatures(spark, store)
        .select("doc_id").as[Long].collect().toSet
      assert(loaded == (1L to 60L).toSet, s"store lost/invented docs: $loaded")
    } finally log.delete()
  }
}
