package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Subscriptions / notifications (VERDICT r1 "What's missing" item 5).
  *
  * Reference: `backend/backend/handlers/subscription/subscriptionService.py`
  * — a subscriptions table keyed `eventName_entityName` /
  * `entityName_entityId` with a `subscribers` list (`:78-137`), listed
  * with per-entity enrichment (asset name batch-get `:60-76`), and an
  * SNS notification fan-out when the subscribed event occurs on the
  * entity (`:139-226`; the only wired event is 'Asset Version Change'
  * on 'Asset', `:29-35`).
  *
  * Spark shape: the listing is a groupBy + enrichment join; dispatch is
  * a per-micro-batch equi-join of the (small) event batch against the
  * subscriptions table — the batch side broadcasts, the subscriptions
  * table never re-partitions, and each (event, subscriber) pair is
  * emitted exactly once per delivery.
  */
object Subscriptions {

  /** Notification rows for a batch of entity events: event ⋈
    * subscriptions on the entity id, one output row per subscriber.
    * `events`: (event_id, entity_id, ts, ...); `subs`:
    * (entity_id, subscriber). */
  def dispatch(events: DataFrame, subs: DataFrame): DataFrame =
    events.join(subs, Seq("entity_id"))
      .select(col("event_id"), col("entity_id"), col("subscriber"))

  /** Streaming fan-out: per micro-batch, join arriving entity events to
    * the subscriptions snapshot and hand the notification rows to the
    * transport (the SNS-publish stand-in). The micro-batch is the small
    * side — broadcast it so the subscriptions table never shuffles. */
  def notifyOnChanges(
      events: DataFrame, // streaming, with entity_id
      subs: () => DataFrame,
      send: (Long, Long, String) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        dispatch(broadcast(batch), subs())
          .collect() // notification batch — transport-sized, not table-sized
          .foreach(r => send(r.getLong(0), r.getLong(1), r.getString(2)))
      }
      .start()
}
