package graft.llmops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TxLog

/** A PERSISTENT, MAINTAINED IVF index — the similarity-search story's
  * missing operational half: [[Similarity.ivfTopK]] trains and probes
  * in one shot (right for a batch job, wasteful for a serving index),
  * while a 100 TB deployment builds the index ONCE and maintains it as
  * vectors arrive and leave, exactly like [[graft.query.TermIndex]]
  * maintains postings.
  *
  *  - `centroids` — a tiny TxLog table, one row per (cid, centroid),
  *    FROZEN at [[build]]: assignment must stay deterministic for the
  *    life of the index or the lists silently mis-route. (Re-training
  *    is a new index — the standard vector-DB contract.) Cached on the
  *    driver per committed version, [[graft.query.TermIndex]]'s
  *    stats-cache pattern.
  *  - `lists` — one row per vector `(cid, vec_id, e, nrm)`, a TxLog
  *    table PARTITIONED BY the centroid id. A search probes only its
  *    `nprobe` nearest lists — metadata-level partition pruning, the
  *    inverted-file property realized as a scan shape. Maintenance is
  *    KEYED MERGE (`cid#vec_id`): adds/updates are LWW and idempotent
  *    under redelivery, removes are precise keyed deletes off the
  *    caller's before-image ([[graft.query.TermIndex.removeDocs]]'s
  *    contract — assignment is deterministic, so the before-image
  *    re-derives the list), and with merge's file-level victim pruning
  *    a micro-batch rewrites only the key-overlapping files of the
  *    touched lists, never whole lists.
  *
  * Search results are EXACTLY those of a fresh one-shot index sharing
  * the same centroids over the same corpus (spec-pinned): maintenance
  * changes when work happens, never what the probe sees.
  */
object IvfIndex {

  private def centroidsPath(root: String) = s"$root/centroids"
  private def listsPath(root: String) = s"$root/lists"

  /** (root → (centroids version, centroid matrix)). */
  private val centCache =
    new ConcurrentHashMap[String, (Long, Array[Array[Double]])]()

  /** The frozen centroid matrix (driver-cached per committed version —
    * k × dim doubles, protocol-sized by construction). */
  def centroids(spark: SparkSession, root: String): Array[Array[Double]] = {
    val p = centroidsPath(root)
    val v = TxLog.snapshot(spark, p).version
    val hit = centCache.get(root)
    if (hit != null && hit._1 == v) hit._2
    else {
      val m = TxLog.read(spark, p)
        .select(col("cid"), col("c")).collect()
        .sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)
      centCache.put(root, (v, m))
      m
    }
  }

  /** Train centroids on `vecs` (distributed k-means, farthest-point
    * seeding — [[Similarity.kmeansCentroids]]) and load the initial
    * corpus into the lists. One-time; later vectors go through
    * [[addVectors]]/[[removeVectors]]. */
  def build(spark: SparkSession, root: String, vecs: DataFrame,
      nCentroids: Int = Similarity.IvfCentroids): Unit = {
    import spark.implicits._
    val cents = Similarity.kmeansCentroids(vecs, nCentroids)
    TxLog.merge(spark, centroidsPath(root),
      cents.zipWithIndex.map { case (c, i) => (s"$i#c", i, c.toSeq) }
        .toSeq.toDF("_docId", "cid", "c")
        .withColumn("_shard", col("cid").cast("string")),
      keyCol = "_docId", partitionCol = "_shard")
    addVectors(spark, root, vecs)
  }

  /** Assignment rows `(key, shard, cid, vec_id, e, nrm)` for a vector
    * batch under the index's frozen centroids. */
  private def assigned(spark: SparkSession, root: String,
      vecs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val centLit = typedLit(centroids(spark, root).map(_.toSeq).toSeq)
    // NULL embeddings never enter (or leave) the lists — the Similarity
    // operator contract; a null vector has no assignable centroid
    vecs.filter(col("embedding").isNotNull)
      .select(col("vec_id").cast("long").as("vec_id"),
        Similarity.asDouble(col("embedding")).as("e"))
      .withColumn("cid", element_at(call_function(
        "graft_nearest_centroids", col("e"), centLit, lit(1)), 1))
      .select(
        concat(col("cid").cast("string"), lit("#"),
          col("vec_id").cast("string")).as("_docId"),
        col("cid").cast("string").as("_shard"),
        col("cid"), col("vec_id"), col("e"),
        sqrt(call_function("graft_dot", col("e"), col("e"))).as("nrm"))
  }

  /** Add (or re-add — LWW, idempotent) a vector batch. */
  def addVectors(spark: SparkSession, root: String,
      vecs: DataFrame): Unit =
    TxLog.merge(spark, listsPath(root), assigned(spark, root, vecs),
      keyCol = "_docId", partitionCol = "_shard")

  /** Remove a vector batch, given WITH its vectors (the before-image
    * re-derives each vector's list under the frozen centroids — a
    * precise keyed delete, never a lists scan). */
  def removeVectors(spark: SparkSession, root: String,
      vecs: DataFrame): Unit = {
    val keys = assigned(spark, root, vecs).select("_docId")
    TxLog.merge(spark, listsPath(root),
      assigned(spark, root, vecs).limit(0), keys,
      keyCol = "_docId", partitionCol = "_shard")
  }

  /** Top-`k` cosine search: probe the `nprobe` nearest lists per query
    * (the union of probed cids prunes the lists READ at the partition
    * level), exact re-rank inside them. Queries broadcast (small by
    * contract); the lists side never broadcasts. */
  def search(spark: SparkSession, root: String, queries: DataFrame,
      k: Int, nprobe: Int = Similarity.IvfProbes): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val centLit = typedLit(centroids(spark, root).map(_.toSeq).toSeq)
    val probes = queries.filter(col("embedding").isNotNull)
      .select(col("vec_id").cast("long").as("q_id"),
        Similarity.asDouble(col("embedding")).as("q_vec"))
      // query norm ONCE per query, not per probed pair
      .withColumn("q_nrm", sqrt(call_function("graft_dot",
        col("q_vec"), col("q_vec"))))
      .withColumn("cid", explode(call_function(
        "graft_nearest_centroids", col("q_vec"), centLit, lit(nprobe))))
    val probedCids = probes.select("cid").distinct()
      .collect().map(_.getInt(0).toString).toSet
    val lists = TxLog.read(spark, listsPath(root),
        partitions = Some(probedCids))
      .select(col("cid"), col("vec_id").as("cand_id"), col("e"),
        col("nrm"))
    // rank via the bounded top-k aggregate ([[Similarity.rankTopK]]):
    // probed-list candidates are a corpus FRACTION per query, and a
    // row_number window would sort each query's whole fraction in one
    // task
    Similarity.rankTopK(lists.join(broadcast(probes), Seq("cid"))
      .filter(col("q_id") =!= col("cand_id"))
      .withColumn("sim", Similarity.normedSim(call_function("graft_dot",
        col("q_vec"), col("e")), col("q_nrm"), col("nrm"))), k)
  }

  /** Maintain the index from a vector table's CHANGE FEED (the
    * [[graft.query.TermIndex.syncTx]] shape): deletes and update
    * pre-images are keyed removals, inserts and post-images are
    * merges. Returns the vector-table version the index reflects. */
  def syncTx(spark: SparkSession, vecsTable: String, root: String,
      fromVersion: Long): Long = {
    val head = TxLog.snapshot(spark, vecsTable)
    var from = fromVersion
    if (from < 0) {
      addVectors(spark, root,
        TxLog.read(spark, vecsTable, asOfVersion = Some(0L))
          .select(col("vec_id"), col("embedding")))
      from = 0
    }
    if (head.version <= from) return head.version
    val ch = TxLog.changes(spark, vecsTable, from, head.version)
      .select(col("vec_id"), col("embedding"), col("_change_type"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val removed = ch.filter(
        col("_change_type").isin("delete", "update_preimage"))
      if (!removed.isEmpty) removeVectors(spark, root, removed)
      val added = ch.filter(
        col("_change_type").isin("insert", "update_postimage"))
      if (!added.isEmpty) addVectors(spark, root, added)
    } finally { ch.unpersist(); () }
    head.version
  }
}
