package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.core.Tables

/** ST-series: the EventOps transforms run identically in batch (oracle-
  * verified) and streaming; doc maintenance converges under at-least-once
  * redelivery.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("tumbling window over readStream equals the batch result") {
    // the REAL driver fixture, not a rewritten copy: readStream sees the
    // raw physical ts shape (NTZ micros / nanos long) and the shared
    // normalization must make event-time work on it (r7's break)
    val batchDf = Tables.events(spark, sf())
    val streamDf = Tables.eventsStream(spark, sf())
      .withWatermark("ts", "1 hour")
    val q = EventOps.tumbling(streamDf, col("ts"), "1 hour", col("event_type"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("ws"),
        col("event_type"), col("n"), col("total"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("tumbling_out")
      .as[(String, String, Long, Double)].collect().toSet
    val batch = EventOps.tumbling(batchDf, col("ts"), "1 hour", col("event_type"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("ws"),
        col("event_type"), col("n"), col("total"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("STREAM-STREAM interval attribution join over the real fixture equals batch") {
    // two independent watermarked readStreams of the same fixture —
    // Spark's stream-stream inner join with the time-range condition
    // keeps per-side state bounded to watermark + horizon; the result
    // multiset must equal the batch form (the ev5 oracle query)
    val batch = {
      val ev = Tables.events(spark, sf())
      EventOps.attributionJoin(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "purchase"), "1 HOUR")
        .select(col("conv_event_id"), col("src_event_id"), col("lag_us"))
        .as[(Long, Long, Long)].collect().toSet
    }
    val views = Tables.eventsStream(spark, sf())
      .filter(col("event_type") === "view").withWatermark("ts", "2 hours")
    val purchases = Tables.eventsStream(spark, sf())
      .filter(col("event_type") === "purchase").withWatermark("ts", "2 hours")
    val q = EventOps.attributionJoin(views, purchases, "1 HOUR")
      .select(col("conv_event_id"), col("src_event_id"), col("lag_us"))
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_join_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("attr_join_out")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("watermark drops late events in append-mode windowed aggregation") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft-late").toString
    def ev(id: Long, ts: String, v: Double) =
      (id, Timestamp.valueOf(ts), "click", v)
    val schema = Seq(ev(0, "2024-01-01 01:00:00", 1.0))
      .toDF("event_id", "ts", "event_type", "value").schema
    // batch 1: three events in the 01:00 window + one at 03:10 that
    // advances the watermark (1h) past the 01:00 window's end
    Seq(ev(1, "2024-01-01 01:05:00", 1.0), ev(2, "2024-01-01 01:10:00", 1.0),
      ev(3, "2024-01-01 01:20:00", 1.0), ev(4, "2024-01-01 03:10:00", 1.0))
      .toDF("event_id", "ts", "event_type", "value")
      .write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", "1 hour")
    val agg = EventOps.tumbling(stream, col("ts"), "1 hour", col("event_type"))
      .select(date_format(col("window.start"), "HH:mm").as("ws"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_out")
      .start()
    try {
      q.processAllAvailable() // batch 1: watermark advances to 02:10
      // batch 2: a LATE event for the 01:00 window (behind the 02:10
      // watermark → must be dropped) plus a fresh event advancing time;
      // the SAME query instance carries the watermark across batches
      Seq(ev(5, "2024-01-01 01:30:00", 99.0), ev(6, "2024-01-01 05:00:00", 1.0))
        .toDF("event_id", "ts", "event_type", "value")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("late_out").as[(String, Long)].collect().toMap
    // the 01:00 window finalized with THREE events — the late arrival
    // (event 5) was excluded by the watermark, not merged in
    assert(rows.get("01:00").contains(3L), rows.toString)
  }

  test("watermarked session windows: merge while open, emit on close, drop late (MemoryStream)") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")
    val agg = EventOps.sessionAggStream(events, "ts", "10 minutes",
      col("user_id"), "30 minutes")
      .select(col("user_id"),
        date_format(col("sw.start"), "HH:mm").as("ss"), col("n_events"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sess_wm").start()
    try {
      // one session for user 1: two events 10 min apart (same 30-min gap
      // session); nothing can emit yet — the session is open
      mem.addData((1L, ts("2024-01-01 01:00:00"), 1.0),
        (1L, ts("2024-01-01 01:10:00"), 1.0))
      q.processAllAvailable()
      assert(spark.table("sess_wm").count() == 0, "open session emitted early")
      // an event far in the future closes it: watermark (max − 10 min)
      // passes 01:40 = last + gap
      mem.addData((2L, ts("2024-01-01 04:00:00"), 1.0))
      q.processAllAvailable()
      // a LATE event that would have extended the closed session (01:20,
      // far behind the ~03:50 watermark) must be dropped, not merged and
      // not re-emitted as its own session
      mem.addData((1L, ts("2024-01-01 01:20:00"), 99.0))
      q.processAllAvailable()
      mem.addData((2L, ts("2024-01-01 06:00:00"), 1.0)) // flush batch
      q.processAllAvailable()
    } finally q.stop()
    val user1 = spark.table("sess_wm").filter(col("user_id") === 1)
      .as[(Long, String, Long)].collect().toSeq
    // exactly one closed session, with exactly the two ON-TIME events
    assert(user1 == Seq((1L, "01:00", 2L)), user1.toString)
  }

  test("watermarked sliding windows drop late rows from every overlapping window") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")
    val agg = EventOps.slidingStream(events, "ts", "10 minutes",
      "1 hour", "30 minutes")
      .select(date_format(col("window.start"), "HH:mm").as("ws"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("slide_wm").start()
    try {
      // 01:05 lands in sliding windows [00:30,01:30) and [01:00,02:00)
      mem.addData((1L, ts("2024-01-01 01:05:00"), 1.0))
      q.processAllAvailable()
      mem.addData((1L, ts("2024-01-01 05:00:00"), 1.0)) // advance watermark
      q.processAllAvailable()
      // late row for the same windows — dropped from BOTH
      mem.addData((1L, ts("2024-01-01 01:06:00"), 99.0))
      q.processAllAvailable()
      mem.addData((1L, ts("2024-01-01 08:00:00"), 1.0)) // flush
      q.processAllAvailable()
    } finally q.stop()
    val byWindow = spark.table("slide_wm").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(byWindow.get("00:30").contains(1L), byWindow.toString)
    assert(byWindow.get("01:00").contains(1L), byWindow.toString)
  }

  test("built-in session_window aggregates match the window-function sessionization") {
    val gapMin = 30
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    // per-session (count, total) multiset from the oracle-gated
    // lag+cumsum form...
    val fromSessionize = EventOps.sessionize(ev, col("user_id"), col("ts"),
        gapMin * 60L * 1000000L)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select("user_id", "n_events", "total")
      .as[(Long, Long, Double)].collect().toSeq.sorted
    // ...must equal the built-in session_window form
    val fromBuiltin = EventOps.sessionAgg(ev, col("user_id"), col("ts"),
        s"$gapMin minutes")
      .select("user_id", "n_events", "total")
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(fromBuiltin.nonEmpty)
    assert(fromBuiltin == fromSessionize)
  }

  test("latestByKey is idempotent under redelivery (at-least-once ST3)") {
    val batch1 = Seq((1L, "k1", 10, "v1"), (2L, "k1", 20, "v2"), (3L, "k2", 5, "x"))
      .toDF("event_id", "key", "ver", "payload")
    val redelivered = batch1.unionByName(batch1) // duplicate delivery
    def compact(df: org.apache.spark.sql.DataFrame) =
      EventOps.latestByKey(df, col("key"),
        Seq(col("ver").desc, col("event_id").desc))
        .select("key", "ver", "payload")
    assert(compact(redelivered).collect().toSet == compact(batch1).collect().toSet)
    assert(compact(batch1).as[(String, Int, String)].collect().toSet ==
      Set(("k1", 20, "v2"), ("k2", 5, "x")))
  }

  test("stateful (flatMapGroupsWithState) sessionization equals the window form") {
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsMicros"))
      .as[EventOps.SessionEvent]
    val gap = 1800L * 1000000
    val stateful = EventOps.sessionizeStateful(ev, gap)
      .select("user_id", "event_id", "session_seq")
      .as[(Long, Long, Long)].collect().toSet
    val windowed = EventOps.sessionize(Tables.events(spark, sf()),
        col("user_id"), col("ts"), gap)
      .select(col("user_id"), col("event_id"), col("session_seq").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(stateful == windowed)
    assert(stateful.nonEmpty)
  }

  test("stateful sessionization over readStream matches batch (single replay)") {
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsMicros"))
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toString
    ev.write.mode("overwrite").parquet(dir)
    val streamed = EventOps.sessionizeStateful(
      spark.readStream.schema(ev.schema).parquet(dir).as[EventOps.SessionEvent],
      1800L * 1000000)
    val q = streamed.writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("sess_out")
      .select("user_id", "event_id", "session_seq")
      .as[(Long, Long, Long)].collect().toSet
    val batch = EventOps.sessionizeStateful(
      Tables.events(spark, sf())
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("tsMicros")).as[EventOps.SessionEvent],
      1800L * 1000000)
      .select("user_id", "event_id", "session_seq")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("stateful sessionization over the REAL events fixture (readStream) matches batch") {
    // end-to-end over the driver's parquet exactly as shipped — the twin
    // that silently vanished in r7 when the fixture went NTZ: readStream
    // the fixture, normalize, derive micros, run the stateful form
    val streamed = EventOps.sessionizeStateful(
      Tables.eventsStream(spark, sf())
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("tsMicros")).as[EventOps.SessionEvent],
      1800L * 1000000)
    val q = streamed.writeStream.outputMode("append")
      .format("memory").queryName("sess_fixture_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("sess_fixture_out")
      .select("user_id", "event_id", "session_seq")
      .as[(Long, Long, Long)].collect().toSet
    val batch = EventOps.sessionize(Tables.events(spark, sf()),
        col("user_id"), col("ts"), 1800L * 1000000)
      .select(col("user_id"), col("event_id"), col("session_seq").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("stateful transitions over the REAL fixture (readStream) match the lead() pairs") {
    val streamed = EventOps.transitionsStateful(
      Tables.eventsStream(spark, sf())
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("tsMicros"), col("event_type"))
        .as[EventOps.TypedEvent])
    val q = streamed.writeStream.outputMode("append")
      .format("memory").queryName("trans_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("trans_out")
      .select("user_id", "from_type", "to_type", "to_event_id")
      .as[(Long, String, String, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val batch = Tables.events(spark, sf())
      .withColumn("to_type", lead("event_type", 1).over(w))
      .withColumn("to_event_id", lead("event_id", 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col("user_id"), col("event_type"), col("to_type"), col("to_event_id"))
      .as[(Long, String, String, Long)].collect().toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("stateful transitions chain ACROSS micro-batches (chunked in-order replay)") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String)]
    val streamed = EventOps.transitionsStateful(mem.toDS()
      .toDF("user_id", "event_id", "tsMicros", "event_type")
      .as[EventOps.TypedEvent])
    val q = streamed.writeStream.outputMode("append")
      .format("memory").queryName("trans_chunked")
      .trigger(Trigger.ProcessingTime(0)).start()
    // batch 1: two users' first events + one transition
    mem.addData((1L, 10L, 1000L, "view"), (1L, 11L, 2000L, "click"),
      (2L, 20L, 1000L, "view"))
    q.processAllAvailable()
    // batch 2: continues BOTH users — the cross-batch edge must use the
    // state stored from batch 1
    mem.addData((1L, 12L, 3000L, "purchase"), (2L, 21L, 5000L, "click"))
    q.processAllAvailable()
    val got = spark.table("trans_chunked")
      .select("user_id", "from_type", "to_type", "to_event_id")
      .as[(Long, String, String, Long)].collect().toSet
    q.stop()
    assert(got == Set(
      (1L, "view", "click", 11L),
      (1L, "click", "purchase", 12L),
      (2L, "view", "click", 21L)))
  }

  test("sessionize splits on gap and keeps within-gap events together") {
    val t0 = 1700000000000000L // micros
    val rows = Seq(
      (1L, 100L, t0),
      (2L, 100L, t0 + 60L * 1000000),            // +1 min  → same session
      (3L, 100L, t0 + 3600L * 1000000),          // +1 h    → new session
      (4L, 200L, t0))
      .map { case (id, u, us) =>
        (id, u, new java.sql.Timestamp(us / 1000))
      }.toDF("event_id", "user_id", "ts")
    val got = EventOps.sessionize(rows, col("user_id"), col("ts"),
        gapMicros = 1800L * 1000000)
      .groupBy("user_id", "session_seq").count()
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((100L, 1L, 2L), (100L, 2L, 1L), (200L, 1L, 1L)))
  }
}
