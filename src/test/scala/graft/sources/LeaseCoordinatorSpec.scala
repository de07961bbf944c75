package graft.sources

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** Two-writer safety of [[LeaseFileCoordinator]] — the multi-JVM
  * commit seam (VERDICT r7 ask #6). Each "writer JVM" is modeled as its
  * own coordinator instance (distinct owner id, no shared in-process
  * lock — LeaseFileCoordinator deliberately has none, unlike
  * LocalAtomicCoordinator, so thread-level races exercise exactly the
  * cross-process protocol: O_EXCL lease create + publish under lease).
  */
class LeaseCoordinatorSpec extends SparkSpec {
  import spark.implicits._

  private def fsFor(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def read(dir: String, name: String): String = {
    val fs = fsFor(dir)
    val in = fs.open(new Path(dir, name))
    val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
      finally in.close()
    new String(bytes, "UTF-8")
  }

  test("exactly one of two concurrent publishers wins each version") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lease1").toString
    val fs = fsFor(dir)
    val a = new LeaseFileCoordinator()
    val b = new LeaseFileCoordinator()
    (0 until 20).foreach { v =>
      val dest = new Path(dir, f"$v%020d.json")
      val results = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val gate = new java.util.concurrent.CountDownLatch(1)
      def racer(name: String, c: LeaseFileCoordinator) = new Thread(() =>
        try { gate.await(); results.put(name, c.tryPublish(fs, dest, name)) }
        catch { case t: Throwable => errs.add(t) })
      val ta = racer("A", a); val tb = racer("B", b)
      ta.start(); tb.start(); gate.countDown(); ta.join(30000); tb.join(30000)
      assert(errs.isEmpty, errs.toString)
      val wins = Seq("A", "B").filter(results.get(_))
      assert(wins.size == 1, s"v$v: winners=$wins")
      // the file holds the WINNER's body intact — no torn/mixed publish
      assert(read(dir, f"$v%020d.json") == wins.head)
    }
    // no lease left behind after clean releases
    assert(!fs.exists(new Path(dir, "_commit.lease")))
  }

  test("two concurrent writers merge to a serializable, loss-free history") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lease2").toString
    TxLog.setCoordinator(dir, new LeaseFileCoordinator())
    try {
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val gate = new java.util.concurrent.CountDownLatch(1)
      val K = 6
      def writer(db: String) = new Thread(() =>
        try {
          gate.await()
          (0 until K).foreach { i =>
            TxLog.merge(spark, dir,
              Seq((s"$db#k$i", db, s"$db-v$i"))
                .toDF("_docId", "str_databaseid", "payload"))
          }
        } catch { case t: Throwable => errs.add(t) })
      val wa = writer("dbA"); val wb = writer("dbB")
      wa.start(); wb.start(); gate.countDown()
      wa.join(120000); wb.join(120000)
      assert(errs.isEmpty, errs.toString)
      // every row from both writers present exactly once — no lost update
      val rows = TxLog.read(spark, dir)
        .select("_docId", "payload").as[(String, String)].collect().toSeq.sorted
      val expected = (for {
        db <- Seq("dbA", "dbB"); i <- 0 until K
      } yield (s"$db#k$i", s"$db-v$i")).sorted
      assert(rows == expected)
      // the log is a gap-free serial history: versions 0..2K-1, each a
      // single-writer commit published under the lease
      val versions = TxLog.history(spark, dir).map(_._1).sorted
      assert(versions == (0L until 2L * K).toVector, versions.toString)
    } finally TxLog.clearCoordinator(dir)
  }

  test("a REAL second JVM contends on the same table: loss-free, gap-free history") {
    // the claim the in-JVM races cannot falsify: O_EXCL lease creation
    // is arbitrated by the OS across PROCESSES. Spawn an actual
    // `java -cp` child running LeaseRaceChild against the same table
    // directory while this JVM merges concurrently.
    val dir = java.nio.file.Files.createTempDirectory("graft-lease-xjvm").toString
    TxLog.setCoordinator(dir, new LeaseFileCoordinator())
    val K = 5
    val log = java.nio.file.Files.createTempFile("graft-lease-child", ".log").toFile
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
        "graft.sources.LeaseRaceChild", dir, "dbB", K.toString)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      pb.redirectOutput(log)
      val child = pb.start()
      // overlap the contention window: wait for the child session, then
      // merge from THIS JVM while the child merges from its own
      val ready = java.nio.file.Paths.get(dir, "_child.ready")
      val deadline = System.currentTimeMillis() + 120000
      while (!java.nio.file.Files.exists(ready) && child.isAlive &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(java.nio.file.Files.exists(ready),
        s"child JVM never came up:\n${scala.io.Source.fromFile(log).mkString.takeRight(2000)}")
      (0 until K).foreach { i =>
        TxLog.merge(spark, dir,
          Seq((s"dbA#k$i", "dbA", s"dbA-v$i"))
            .toDF("_docId", "str_databaseid", "payload"))
      }
      assert(child.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        "child JVM did not finish")
      assert(child.exitValue() == 0,
        s"child JVM failed:\n${scala.io.Source.fromFile(log).mkString.takeRight(2000)}")
      // loss-free: every row from both processes, exactly once
      val rows = TxLog.read(spark, dir)
        .select("_docId", "payload").as[(String, String)].collect().toSeq.sorted
      val expected = (for {
        db <- Seq("dbA", "dbB"); i <- 0 until K
      } yield (s"$db#k$i", s"$db-v$i")).sorted
      assert(rows == expected, s"lost/extra rows: $rows")
      // gap-free serial history across the two processes
      val versions = TxLog.history(spark, dir).map(_._1).sorted
      assert(versions == (0L until 2L * K).toVector, versions.toString)
      assert(!fsFor(dir).exists(new Path(dir, "_commit.lease")))
    } finally {
      TxLog.clearCoordinator(dir)
      log.delete()
    }
  }

  test("four-writer stress: every version has exactly one winner and an intact body") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lease-stress").toString
    val fs = fsFor(dir)
    val writers = (0 until 4).map(i => i -> new LeaseFileCoordinator()).toMap
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // each writer claims versions optimistically from a shared counter —
    // the TxLog writer loop in miniature: publish, on loss re-read head
    // and try the next version
    val next = new java.util.concurrent.atomic.AtomicLong(0)
    val won = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
    val Total = 24
    val threads = writers.map { case (id, c) =>
      new Thread(() =>
        try {
          var v = next.get()
          while (v < Total) {
            val dest = new Path(dir, f"$v%020d.json")
            if (c.tryPublish(fs, dest, s"w$id-v$v")) {
              val prev = won.put(v, Integer.valueOf(id))
              assert(prev eq null, s"v$v won twice: $prev and $id")
            }
            next.set(math.max(next.get(), v + 1))
            v = next.get()
          }
        } catch { case t: Throwable => errs.add(t) })
    }.toSeq
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errs.isEmpty, errs.toString)
    // a gap-free history in which every committed body is the winner's,
    // written whole (no torn file, no clobber by a loser)
    (0L until Total).foreach { v =>
      val w = won.get(v)
      assert(w != null, s"v$v never won")
      assert(read(dir, f"$v%020d.json") == s"w$w-v$v")
    }
    assert(!fs.exists(new Path(dir, "_commit.lease")))
  }

  test("compaction races concurrent merges under the lease with no lost update") {
    // the LocalAtomicCoordinator race spec (TxLogSpec), replayed through
    // the lease protocol: merge retries + OPTIMIZE's staged-base
    // recheck + lease acquire/release must compose
    val dir = java.nio.file.Files.createTempDirectory("graft-lease-opt").toString
    TxLog.setCoordinator(dir, new LeaseFileCoordinator())
    try {
      TxLog.merge(spark, dir,
        Seq(("dbA#a1", "dbA", "seed"), ("dbB#b1", "dbB", "b1"))
          .toDF("_docId", "str_databaseid", "payload"))
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val writers = (1 to 3).map { i =>
        Future(TxLog.merge(spark, dir,
          Seq((s"dbA#m$i", "dbA", s"v$i"))
            .toDF("_docId", "str_databaseid", "payload")))
      }
      val compactors = (1 to 2).map { _ => Future(TxLog.compact(spark, dir)) }
      (writers ++ compactors).foreach(Await.result(_, 300.seconds))
      val rows = TxLog.read(spark, dir)
        .select("_docId", "payload").as[(String, String)].collect().toSet
      assert(rows == Set(("dbA#a1", "seed"), ("dbB#b1", "b1"),
        ("dbA#m1", "v1"), ("dbA#m2", "v2"), ("dbA#m3", "v3")))
      // linear history, every version resolvable, no lease left behind
      val head = TxLog.snapshot(spark, dir).version
      (0L to head).foreach(v => TxLog.snapshotAt(spark, dir, v))
      assert(!fsFor(dir).exists(
        new Path(s"$dir/_txlog", "_commit.lease")))
    } finally TxLog.clearCoordinator(dir)
  }

  test("an expired lease from a crashed holder is taken over") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lease3").toString
    val fs = fsFor(dir)
    // simulate a holder that died mid-commit: lease expired 1 s ago
    val lease = new Path(dir, "_commit.lease")
    val out = fs.create(lease, false)
    out.write(s"dead-owner ${System.currentTimeMillis() - 1000}"
      .getBytes("UTF-8")); out.close()
    val c = new LeaseFileCoordinator(acquireTimeoutMs = 10000)
    val dest = new Path(dir, "00000000000000000000.json")
    assert(c.tryPublish(fs, dest, "recovered"))
    assert(read(dir, "00000000000000000000.json") == "recovered")
  }

  test("a live lease blocks publishing; an unexpired one times out loud") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lease4").toString
    val fs = fsFor(dir)
    val lease = new Path(dir, "_commit.lease")
    val out = fs.create(lease, false)
    out.write(s"live-owner ${System.currentTimeMillis() + 3600000}"
      .getBytes("UTF-8")); out.close()
    val c = new LeaseFileCoordinator(acquireTimeoutMs = 300)
    val dest = new Path(dir, "00000000000000000000.json")
    val e = intercept[IllegalStateException] {
      c.tryPublish(fs, dest, "blocked")
    }
    assert(e.getMessage.contains("lease not acquired"))
    assert(!fs.exists(dest))
    // holder releases → the same publisher succeeds on retry
    fs.delete(lease, false)
    assert(c.tryPublish(fs, dest, "after-release"))
  }

  test("losing the version race under the lease returns false, not a clobber") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lease5").toString
    val fs = fsFor(dir)
    val c = new LeaseFileCoordinator()
    val dest = new Path(dir, "00000000000000000000.json")
    assert(c.tryPublish(fs, dest, "first"))
    assert(!c.tryPublish(fs, dest, "second"))
    assert(read(dir, "00000000000000000000.json") == "first")
  }
}
