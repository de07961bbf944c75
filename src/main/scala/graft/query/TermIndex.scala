package graft.query

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llmops.Text
import graft.sources.TxLog

/** O3 at 100 TB — a TERM-level inverted index serving BM25 without a
  * corpus scan.
  *
  * The reference's `_score` ordering is OpenSearch's term index at work
  * (`search.py:614,994,1311`): a query touches the postings of ITS OWN
  * terms, never the corpus. [[Bm25.rank]] reproduces the scores exactly
  * but pays a full tokenize+scan per query; this component is the
  * lakehouse analogue of the inverted index itself:
  *
  *  - `postings` — one row per (doc, term): `(term, doc_id, tf, dl)`,
  *    a [[TxLog]] table PARTITIONED BY a term-hash shard. A query reads
  *    only its terms' shards (metadata-level partition pruning — at 64
  *    shards and 3 query terms, ≤ 3/64ths of the postings, then the
  *    term equality prunes further via parquet pushdown). The document
  *    length is DENORMALIZED into the posting row — the classic index
  *    layout choice — so scoring never joins a corpus-sized side.
  *  - `doclen` — one row per doc `(doc_id, dl)`, keyed and partitioned
  *    by a doc-id shard. The corpus stats (n, Σdl) derive from it by ONE
  *    aggregation per COMMITTED VERSION (cached below): queries between
  *    maintenance cycles pay zero, and because doclen mutates only
  *    through keyed merges/removes, add/remove are IDEMPOTENT — a
  *    replayed batch cannot drift the stats (an incremental +Δ/−Δ
  *    counter would double-count on redelivery). At extreme scale the
  *    aggregate itself can be maintained by `IncrementalAgg` off the
  *    doclen change feed; the contract here stays the same.
  *
  * Query cost is therefore Θ(postings of the query's terms): one pruned
  * scan → broadcast idf/stats → per-row integer score → one map-side-
  * combined doc aggregation → TakeOrderedAndProject top-k. The scores
  * are the IDENTICAL fixed-point integers [[Bm25.rank]] computes — the
  * `o3_bm25_rank_indexed` gate runs against the very same oracle SQL.
  *
  * Writers follow the [[TextIndex]] contract: the indexer that lands
  * the documents maintains the index ([[indexDocs]]/[[removeDocs]] —
  * idempotent keyed merges, atomic per batch, snapshot-isolated
  * readers); one logical writer at a time (the multi-writer case is
  * [[graft.sources.TxLog]]'s lease coordinator, as for any table).
  *
  * Consistency note: postings and doclen are two tables, each
  * snapshot-isolated but not atomically co-committed — a query racing
  * an in-flight index batch can score new postings against the
  * previous batch's (n, Σdl). Between maintenance cycles reads are
  * exact; during one they are eventually consistent, the refresh-in-
  * progress contract search indexes conventionally give. A reader
  * needing a frozen view pins both tables' versions (TxLog tags).
  */
object TermIndex {

  /** Term-hash partition count of the postings table. 64 keeps the
    * shard count far below the file count at any real scale while
    * pruning a few-term query's read to a few 64ths of the postings. */
  val Shards = 64

  private def postingsPath(root: String) = s"$root/postings"
  private def doclenPath(root: String) = s"$root/doclen"

  private def shardOf(term: Column): Column =
    pmod(Text.hash60(term), lit(Shards)).cast("string")

  /** Postings rows of a doc batch: `(shard, term, doc_id, tf, dl)`,
    * keyed `shard#term#doc_id` for idempotent merge/remove. */
  private def postingRows(docs: DataFrame, idCol: String,
      tkCol: String): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"), col(tkCol).as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        explode(col("tk")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("long").as("tf"), first(col("dl")).as("dl"))
      .select(
        concat(shardOf(col("term")), lit("#"), col("term"), lit("#"),
          col("doc_id").cast("string")).as("_docId"),
        shardOf(col("term")).as("shard"),
        col("term"), col("doc_id"), col("tf"), col("dl"))

  /** Doclen rows of a doc batch: keyed `shard#doc_id`, partitioned by
    * a doc-id shard (independent of the TERM sharding — a doc's length
    * row has one home regardless of its vocabulary). */
  private def doclenRows(docs: DataFrame, idCol: String,
      tkCol: String): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"), col(tkCol).as("tk"))
      .filter(size(col("tk")) > 0)
      .select(
        concat(pmod(col("doc_id"), lit(Shards.toLong)).cast("string"),
          lit("#"), col("doc_id").cast("string")).as("_docId"),
        pmod(col("doc_id"), lit(Shards.toLong)).cast("string").as("dshard"),
        col("doc_id"), size(col("tk")).cast("long").as("dl"))

  /** (root → (doclen version, n, sumdl)): corpus stats derive from the
    * doclen table by ONE aggregation per committed version — the cache
    * key IS the version, so any maintenance invalidates it and queries
    * between maintenance cycles pay a directory listing, not a job. */
  private val statsCache = new ConcurrentHashMap[String, (Long, Long, Long)]()

  private def readStats(spark: SparkSession, root: String): (Long, Long) =
    if (!TxLog.isTable(spark, doclenPath(root))) (0L, 0L)
    else {
      val v = TxLog.snapshot(spark, doclenPath(root)).version
      val hit = statsCache.get(root)
      if (hit != null && hit._1 == v) (hit._2, hit._3)
      else {
        val r = TxLog.read(spark, doclenPath(root), asOfVersion = Some(v))
          .agg(count(lit(1)).cast("long"),
            coalesce(sum("dl"), lit(0L)).cast("long")).collect()(0)
        statsCache.put(root, (v, r.getLong(0), r.getLong(1)))
        (r.getLong(0), r.getLong(1))
      }
    }

  /** Add (or re-add) a batch of documents `(idCol, tkCol)`: keyed
    * merges into the touched postings shards and the doclen table.
    * IDEMPOTENT — replaying the same batch converges (both merges are
    * keyed; the stats derive from doclen, so nothing double-counts).
    * Re-indexing a CHANGED doc must [[removeDocs]] the old version
    * first (same contract as every inverted index: the writer knows
    * the before-image). */
  def indexDocs(spark: SparkSession, root: String, docs: DataFrame,
      idCol: String = "doc_id", tkCol: String = "tk"): Unit = {
    TxLog.merge(spark, postingsPath(root), postingRows(docs, idCol, tkCol),
      keyCol = "_docId", partitionCol = "shard")
    TxLog.merge(spark, doclenPath(root), doclenRows(docs, idCol, tkCol),
      keyCol = "_docId", partitionCol = "dshard")
  }

  /** Remove a batch of documents. Takes the docs WITH their token
    * arrays (the writer's before-image) so the delete is KEYED —
    * precise `shard#term#doc` removals, never a postings scan.
    * Idempotent like [[indexDocs]] (removing an absent key no-ops). */
  def removeDocs(spark: SparkSession, root: String, docs: DataFrame,
      idCol: String = "doc_id", tkCol: String = "tk"): Unit = {
    // idempotence requires tolerating keys whose partition has already
    // emptied out (a replayed removal): restrict the delete set to the
    // partitions the table still commits — removing an absent key from
    // a LIVE partition is already a no-op, and a fully-gone partition
    // has nothing left to remove (TxLog's key-shape guard would refuse
    // the dangling reference otherwise)
    def rm(path: String, rows: DataFrame, partCol: String): Unit = {
      if (!TxLog.isTable(spark, path)) return
      val live = TxLog.snapshot(spark, path).files.map(_.partition).toSet
      if (live.isEmpty) return
      val keys = rows.select("_docId").filter(
        split(col("_docId"), "#").getItem(0).isin(live.toSeq: _*))
      if (!keys.isEmpty)
        TxLog.merge(spark, path, rows.limit(0), keys,
          keyCol = "_docId", partitionCol = partCol)
    }
    rm(postingsPath(root), postingRows(docs, idCol, tkCol), "shard")
    rm(doclenPath(root), doclenRows(docs, idCol, tkCol), "dshard")
  }

  /** Fixed-point BM25 scores of EVERY doc matching ≥ 1 query term,
    * served from the index: `(doc_id, score_fp)` with `score_fp > 0`.
    * The building block under [[rank]] (top-k) and under index-served
    * search façades (join the filtered hit set against this — still
    * Θ(postings of the query's terms), never a corpus pass). */
  def scores(spark: SparkSession, root: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    graft.functions.GraftFunctions.register(spark)
    val (n, sumdl) = readStats(spark, root)
    if (n == 0L) { // empty index: nothing can match
      import spark.implicits._
      return Seq.empty[(Long, Long)].toDF("doc_id", "score_fp")
    }
    val termShards: Set[String] = terms
      .map(t => (math.floorMod(Text.hash60Value(t), Shards.toLong)).toString)
      .toSet
    // metadata-level partition pruning to the query terms' shards, then
    // FILE-level skipping on the `shard#term#` key prefix (postings are
    // key-clustered by [[optimize]], so a maintained index opens only
    // the files holding the query's own postings lists), then
    // parquet-pushed term equality inside what remains
    val termPrefixes: Seq[String] = terms.map { t =>
      s"${math.floorMod(Text.hash60Value(t), Shards.toLong)}#$t#"
    }
    val posts = TxLog.read(spark, postingsPath(root),
        partitions = Some(termShards), keyPrefixes = Some(termPrefixes))
      .filter(col("term").isin(terms: _*))
      .select("term", "doc_id", "tf", "dl")
    // per-query-term document frequencies via a term-partitioned window
    // over the pruned postings themselves — the postings ARE the df
    // (tiny: the query's own lists), and the window keeps everything in
    // ONE pass where a separate aggregate + broadcast join paid an extra
    // job + broadcast build per query (the index route's fixed cost is
    // what it competes on; the work per row is identical)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("term")
    // the length-norm constants q = (18432·n) DIV Σdl, r = (18432·n)
    // MOD Σdl are LONG math on the driver (18432·n is safe for any
    // n < 5·10^14 docs — Bm25.scala's documented bound) and enter the
    // SQL as L-suffixed BIGINT literals: a bare interpolated integer
    // parses as INT32 and overflows under ANSI once n·18432 > 2^31
    val q = n * 18432L / sumdl
    val r = n * 18432L % sumdl
    val scored = posts
      .withColumn("df", count(lit(1)).over(w).cast("long"))
      .withColumn("idf_fp", call_function("graft_log2_fp",
        lit(n * 2 + 2), col("df") * 2L + lit(1L)))
      .withColumn("score_t", expr(
        s"(idf_fp * 44 * tf * 1024) DIV " +
          s"((tf * 20 + 6) * 1024 + " +
          s"dl * ${q}L + (dl * ${r}L) DIV ${sumdl}L)"))
      .groupBy("doc_id")
      .agg(sum("score_t").as("score_fp"))
      .filter(col("score_fp") > 0)
      .select("doc_id", "score_fp")
    scored
  }

  /** BM25 top-`k` served from the index — identical output contract to
    * [[Bm25.rank]] over the same corpus: `(doc_id, score_fp)`, scores
    * `> 0`, ordered `(score_fp DESC, doc_id)`, as a
    * TakeOrderedAndProject over [[scores]]. */
  def rank(spark: SparkSession, root: String, terms: Seq[String],
      k: Int): DataFrame =
    scores(spark, root, terms)
      .orderBy(col("score_fp").desc, col("doc_id"))
      .limit(k)

  /** Index maintenance hygiene: every [[indexDocs]]/[[syncTx]] batch
    * adds a file per touched shard, so a long-lived follower fragments
    * the postings table. Key-clustered COMPACTION folds the fragments
    * (per shard, key-disjoint output files with tight footer stats —
    * the same TxLog maintenance every table gets) and the VACUUM
    * reclaims superseded files: postings are DERIVED data nobody
    * time-travels, the [[TextIndex.syncTx]] precedent. Safe to run
    * concurrently with readers (snapshot isolation) and retried under
    * writer conflicts. */
  def optimize(spark: SparkSession, root: String): Unit = {
    TxLog.compact(spark, postingsPath(root),
      partitionCol = "shard", keyCol = "_docId")
    TxLog.vacuum(spark, postingsPath(root))
    TxLog.compact(spark, doclenPath(root),
      partitionCol = "dshard", keyCol = "_docId")
    TxLog.vacuum(spark, doclenPath(root))
    ()
  }

  /** Maintain the index from a document table's CHANGE FEED — the
    * reference's core indexing flow (`assetIndexer.py` consumes the
    * DynamoDB stream and upserts OpenSearch docs; here the TxLog change
    * feed drives the same maintenance): deletions and update
    * pre-images are KEYED removals (the feed carries the before-image,
    * satisfying [[removeDocs]]' contract for free), inserts and update
    * post-images are merges. Returns the document-table version the
    * index now reflects — callers loop `from = syncTx(...)` exactly
    * like [[TextIndex.syncTx]] / `ChangeFeed.follow`. */
  def syncTx(spark: SparkSession, docsTable: String, root: String,
      fromVersion: Long, idCol: String = "doc_id",
      textCol: String = "text"): Long = {
    val head = TxLog.snapshot(spark, docsTable)
    var from = fromVersion
    if (from < 0) { // bootstrap: v0's snapshot as inserts (the
      // change-feed stream source's first-batch convention)
      indexDocs(spark, root,
        TxLog.read(spark, docsTable, asOfVersion = Some(0L))
          .filter(length(trim(col(textCol))) > 0)
          .select(col(idCol), Text.tokens(col(textCol)).as("tk")),
        idCol)
      from = 0
    }
    if (head.version <= from) return head.version
    val ch = TxLog.changes(spark, docsTable, from, head.version)
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), col(textCol), col("_change_type"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def toks(df: DataFrame): DataFrame =
        df.select(col(idCol), Text.tokens(col(textCol)).as("tk"))
      val removed = ch.filter(
        col("_change_type").isin("delete", "update_preimage"))
      if (!removed.isEmpty) removeDocs(spark, root, toks(removed), idCol)
      val added = ch.filter(
        col("_change_type").isin("insert", "update_postimage"))
      if (!added.isEmpty) indexDocs(spark, root, toks(added), idCol)
    } finally { ch.unpersist(); () }
    head.version
  }

  // ── build-once attachment for the gated query (dev/test shape; in
  //    production the document writer maintains the index, TextIndex
  //    contract) ─────────────────────────────────────────────────────

  private val attached = new ConcurrentHashMap[String, String]()
  private val processScope =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getName
      .replaceAll("[^A-Za-z0-9]", "-")

  /** Index root for corpus `key`, built by `docs` on first use in this
    * process (keyed merge — concurrent first callers converge). */
  def attach(spark: SparkSession, key: String,
      docs: => DataFrame): String =
    attached.computeIfAbsent(key, { _ =>
      // the directory embeds the FULL sanitized key (a hashCode-only
      // path would silently merge two corpora on a 32-bit collision)
      val safe = key.replaceAll("[^A-Za-z0-9._-]", "_").take(80)
      val root = s"${System.getProperty("java.io.tmpdir")}" +
        s"/graft-termindex-$processScope/$safe"
      indexDocs(spark, root, docs)
      root
    })
}
