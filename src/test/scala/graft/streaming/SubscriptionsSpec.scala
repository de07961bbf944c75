package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SubscriptionsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming fan-out notifies each (event, subscriber) exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("graft-subs").toString
    val events = Seq((1L, 10L), (2L, 20L), (3L, 99L))
      .toDF("event_id", "entity_id")
    events.write.mode("overwrite").parquet(dir)
    val subs = Seq((10L, "alice"), (10L, "bob"), (20L, "carol"))
      .toDF("entity_id", "subscriber")
    val sent = scala.collection.concurrent.TrieMap.empty[(Long, Long, String), Int]
    val stream = spark.readStream.schema(events.schema).parquet(dir)
    val q = Subscriptions.notifyOnChanges(stream, () => subs,
      (e, ent, sub) => { sent.updateWith((e, ent, sub))(v => Some(v.getOrElse(0) + 1)); () })
    try q.processAllAvailable() finally q.stop()
    assert(sent.keySet == Set(
      (1L, 10L, "alice"), (1L, 10L, "bob"), (2L, 20L, "carol")))
    assert(sent.values.forall(_ == 1)) // entity 99 has no subscribers
  }

  test("dispatch is the batch twin: same rows as a plain equi-join") {
    val ev = Seq((1L, 10L), (2L, 20L)).toDF("event_id", "entity_id")
    val subs = Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("entity_id", "subscriber")
    val got = Subscriptions.dispatch(ev, subs)
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 10L, "a"), (2L, 20L, "b")))
  }
}
