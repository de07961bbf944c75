package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Minimal transaction-log table format — Delta-style ACID on plain
  * parquet, with optimistic concurrency control.
  *
  * Why it exists: the reference's indexer upsert is atomic per doc
  * (`backend/backend/handlers/indexing/assetIndexer.py:534-596` — a
  * DynamoDB put_item). The parquet-lake equivalent of that guarantee is
  * a transactional table format; Delta/Iceberg are the production
  * choices, but neither ships in this environment, so the commit
  * protocol they rely on is implemented here directly (the same design
  * as the Delta transaction log: an ordered directory of commit files,
  * each atomically published, every reader resolving a snapshot from
  * committed metadata only — Armbrust et al., "Delta Lake: High-
  * Performance ACID Table Storage over Cloud Object Stores", VLDB 2020).
  *
  * Layout:
  * {{{
  * table/
  *   _txlog/00000000000000000000.json   commit 0: {"adds":[...],"removes":[...]}
  *   _txlog/00000000000000000005.checkpoint.json   full snapshot at v5
  *   str_databaseid=db1/part-<uuid>.parquet        data files
  * }}}
  *
  * Guarantees:
  *  - ATOMIC commits: a commit is one log file published via
  *    write-to-temp + rename-without-overwrite. Readers list the log,
  *    not the data directory, so data files are invisible until the
  *    commit that references them lands; a writer crash before commit
  *    leaves only unreferenced files (removed by [[vacuum]]).
  *  - SNAPSHOT ISOLATION for readers: the file set is resolved once per
  *    read from committed versions; concurrent commits cannot make a
  *    running scan see half a merge.
  *  - OPTIMISTIC writers: a commit names the version it expects to
  *    create. Losing the race (rename fails because the version exists)
  *    re-reads the log and RETRIES if the winning commits touched
  *    disjoint partitions, else rebuilds the merge from the new
  *    snapshot — lost updates are impossible, not just unlikely (vs
  *    [[graft.core.Layout.compactPartitions]], which detects-and-aborts).
  *
  * Scale notes: the log holds file METADATA only (path, partition, row
  * count) — driver-sized by design, same as Delta's; checkpoints every
  * [[CheckpointInterval]] commits bound log replay to O(interval) small
  * reads. Partition pruning happens against the log before any parquet
  * footer is opened. Rename-without-overwrite is atomic on HDFS and
  * local filesystems; object stores without atomic rename need a commit
  * coordinator (as Delta's S3 LogStore documents) — same caveat, same
  * seam.
  */
object TxLog {

  /** One committed data file. `partition` is the RAW partition value
    * (unescaped); `path` is relative to the table root. */
  case class AddFile(path: String, partition: String, rows: Long)

  /** Resolved table state: committed version + live file set + the
    * table schema as of that version (DDL string; carried by commits
    * so an EMPTIED table keeps its shape — absent only on logs written
    * before schema tracking). */
  case class Snapshot(version: Long, files: Seq[AddFile],
      schemaDdl: Option[String] = None)

  val CheckpointInterval = 10

  private def logDir(table: Path) = new Path(table, "_txlog")
  private def commitPath(table: Path, v: Long) =
    new Path(logDir(table), f"$v%020d.json")
  private def checkpointPath(table: Path, v: Long) =
    new Path(logDir(table), f"$v%020d.checkpoint.json")

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** True iff `path` has a transaction log (≥1 committed version). */
  def isTable(spark: SparkSession, path: String): Boolean = {
    val t = new Path(path)
    val fs = fsOf(spark, t)
    fs.exists(logDir(t)) && latestVersion(fs, t) >= 0
  }

  private def listLog(fs: FileSystem, table: Path): Seq[Path] = {
    val dir = logDir(table)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".json")).toSeq
  }

  private def latestVersion(fs: FileSystem, table: Path): Long = {
    val vs = listLog(fs, table).map(_.getName)
      .filter(!_.contains("checkpoint"))
      .map(_.stripSuffix(".json").toLong)
    if (vs.isEmpty) -1L else vs.max
  }

  // ---- commit (de)serialization ------------------------------------

  private def renderFiles(files: Seq[AddFile]): JValue =
    JArray(files.map(f => JObject(
      "path" -> JString(f.path),
      "partition" -> JString(f.partition),
      "rows" -> JLong(f.rows))).toList)

  private def parseFiles(j: JValue): Seq[AddFile] = j match {
    case JArray(items) => items.collect { case it: JObject =>
      AddFile(
        (it \ "path").values.toString,
        (it \ "partition").values.toString,
        (it \ "rows").values.toString.toLong)
    }
    case _ => Seq.empty
  }

  /** Serializes the exists-check + rename publish within this JVM.
    * HDFS rename already refuses an existing destination; the LOCAL
    * filesystem's File.renameTo overwrites, so same-JVM racers (the
    * only kind local tests can produce) must not interleave. Multi-JVM
    * writers on a non-atomic store need a commit coordinator, exactly
    * as Delta documents for S3. */
  private val commitLock = new Object

  private def writeAtomic(fs: FileSystem, dest: Path, body: String): Boolean = {
    val tmp = new Path(dest.getParent,
      s".${dest.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    // rename-without-overwrite is the atomic publish: exactly one writer
    // of a given version wins; the loser's temp file is removed
    val ok = commitLock.synchronized {
      !fs.exists(dest) && fs.rename(tmp, dest)
    }
    if (!ok) fs.delete(tmp, false)
    ok
  }

  private def readJson(fs: FileSystem, p: Path): JValue = {
    val in = fs.open(p)
    try JsonMethods.parse(new java.io.InputStreamReader(in, "UTF-8"))
    finally in.close()
  }

  // ---- snapshot resolution ------------------------------------------

  /** Resolve the current committed snapshot: newest checkpoint (if any)
    * plus the commits after it, applied in version order. Missing table
    * → version -1, empty file set. */
  def snapshot(spark: SparkSession, path: String): Snapshot =
    resolveSnapshot(spark, path, None)

  /** TIME TRAVEL: the snapshot as of a past `version` — the newest
    * checkpoint ≤ version plus the commits up to and including it. The
    * log is append-only, so a pinned version is immutable; the DATA
    * files of superseded versions survive until a [[vacuum]] older than
    * its grace window removes them (the grace window IS the time-travel
    * retention, same contract as Delta's `VACUUM ... RETAIN`). Throws
    * if `version` exceeds the committed head. */
  def snapshotAt(spark: SparkSession, path: String, version: Long): Snapshot =
    resolveSnapshot(spark, path, Some(version))

  private def resolveSnapshot(spark: SparkSession, path: String,
      asOf: Option[Long]): Snapshot = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val names = listLog(fs, table).map(_.getName)
    if (names.isEmpty) {
      require(asOf.isEmpty, s"time travel to v$asOf on a table with no log")
      return Snapshot(-1L, Seq.empty)
    }
    val commitVersions = names.filter(!_.contains("checkpoint"))
      .map(_.stripSuffix(".json").toLong)
    asOf.foreach { v =>
      require(v >= 0 && commitVersions.nonEmpty && v <= commitVersions.max,
        s"time travel to v$v but committed head is " +
          (if (commitVersions.isEmpty) "empty" else s"v${commitVersions.max}"))
    }
    val ckVersions = names.filter(_.endsWith(".checkpoint.json"))
      .map(_.stripSuffix(".checkpoint.json").toLong)
      .filter(cv => asOf.forall(cv <= _))
    val fromCk = if (ckVersions.isEmpty) -1L else ckVersions.max
    var schema: Option[String] = None
    var files = if (fromCk < 0) Map.empty[String, AddFile]
    else {
      val ck = readJson(fs, checkpointPath(table, fromCk))
      schema = (ck \ "schema").toOption.collect { case JString(d) => d }
      parseFiles(ck \ "files").map(f => f.path -> f).toMap
    }
    val commits = commitVersions
      .filter(cv => cv > fromCk && asOf.forall(cv <= _)).sorted
    var v = fromCk
    commits.foreach { cv =>
      val j = readJson(fs, commitPath(table, cv))
      (j \ "schema").toOption.foreach {
        case JString(d) => schema = Some(d)
        case _ => ()
      }
      parseFiles(j \ "removes").foreach(f => files -= f.path)
      // removes may also arrive as plain path strings
      (j \ "removes") match {
        case JArray(items) => items.foreach {
          case JString(p) => files -= p
          case _ => ()
        }
        case _ => ()
      }
      parseFiles(j \ "adds").foreach(f => files += (f.path -> f))
      v = cv
    }
    Snapshot(v, files.values.toSeq.sortBy(_.path), schema)
  }

  /** Read the table (optionally pruned to `partitions`) at a consistent
    * snapshot — the committed head, or a pinned past version when
    * `asOfVersion` is set (time travel; see [[snapshotAt]] for the
    * retention contract). Pruning is LOG-level: files of other
    * partitions are never opened, the 100 TB analogue of Delta's data
    * skipping. */
  def read(spark: SparkSession, path: String,
      partitions: Option[Set[String]] = None,
      partitionCol: String = "str_databaseid",
      asOfVersion: Option[Long] = None): DataFrame = {
    val snap = asOfVersion match {
      case Some(v) => snapshotAt(spark, path, v)
      case None => snapshot(spark, path)
    }
    val live = partitions match {
      case Some(ps) => snap.files.filter(f => ps(f.partition))
      case None => snap.files
    }
    if (live.isEmpty) {
      // an emptied (or fully-pruned) table still reads with its full
      // schema: commits carry the table DDL, so projections and
      // filters on the empty frame resolve. Only a log written before
      // schema tracking degrades to the 0-column frame.
      snap.schemaDdl match {
        case Some(ddl) => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(ddl))
        case None => spark.emptyDataFrame
      }
    } else
      spark.read.option("basePath", path)
        .parquet(live.map(f => s"$path/${f.path}"): _*)
  }

  /** CHANGE FEED between two committed versions (Delta CDF analogue):
    * row-level inserts, deletes, and update pre/post-images keyed on
    * `keyCol`, derived from the two pinned snapshots. Only the files
    * that CHANGED between the versions are read — the merge rewrites
    * whole partitions, so unchanged partitions' files are shared by
    * both snapshots and never opened; rows carried over unchanged
    * inside a rewritten partition are detected by full-row comparison
    * and not emitted. Output schema = table schema + `_change_type` ∈
    * insert | delete | update_preimage | update_postimage, aggregated
    * over the (from, to] range (net effect, not per-commit replay).
    * An incremental consumer (e.g. the search-doc indexer's CDC
    * contract, ST1) polls `snapshot().version` and feeds
    * `changes(lastSeen, head)` into its micro-batch. Same retention
    * contract as [[snapshotAt]]. */
  def changes(spark: SparkSession, path: String, fromVersion: Long,
      toVersion: Long, keyCol: String = "_docId"): DataFrame = {
    require(fromVersion <= toVersion,
      s"changes: from v$fromVersion > to v$toVersion")
    val fromS = snapshotAt(spark, path, fromVersion)
    val toS = snapshotAt(spark, path, toVersion)
    val fromPaths = fromS.files.map(_.path).toSet
    val toPaths = toS.files.map(_.path).toSet
    val removed = fromS.files.filterNot(f => toPaths(f.path))
    val added = toS.files.filterNot(f => fromPaths(f.path))
    def readFiles(fs: Seq[AddFile]): Option[DataFrame] =
      if (fs.isEmpty) None
      else Some(spark.read.option("basePath", path)
        .parquet(fs.map(f => s"$path/${f.path}"): _*))
    (readFiles(removed), readFiles(added)) match {
      case (None, None) =>
        // no files differ (idle poll, from == to): still honor the
        // documented output schema so a CDC consumer's projections and
        // filters resolve on the empty batch — from any live file, or
        // (for an emptied table) the schema the commits carry; only a
        // schema-tracking-free legacy log with no files yields the
        // 0-column frame
        readFiles(toS.files.take(1)).orElse(readFiles(fromS.files.take(1)))
          .orElse(toS.schemaDdl.orElse(fromS.schemaDdl).map(ddl =>
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              org.apache.spark.sql.types.StructType.fromDDL(ddl)))) match {
          case Some(any) => any.filter(lit(false))
            .withColumn("_change_type", lit(""))
          case None => spark.emptyDataFrame
        }
      case (None, Some(a)) => a.withColumn("_change_type", lit("insert"))
      case (Some(b), None) => b.withColumn("_change_type", lit("delete"))
      case (Some(b), Some(a)) =>
        val cols = a.columns.toSeq
        def keyed(df: DataFrame) = df.select(col(keyCol).as("_k"),
          struct(cols.map(col): _*).as("_row"))
        val chType = org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("ct",
              org.apache.spark.sql.types.StringType, nullable = false),
            org.apache.spark.sql.types.StructField("r", a.schema))))
        keyed(b).as("b")
          .join(keyed(a).as("a"), col("b._k") === col("a._k"), "full_outer")
          .select(explode(
            when(col("b._k").isNull,
              array(struct(lit("insert").as("ct"), col("a._row").as("r"))))
            .when(col("a._k").isNull,
              array(struct(lit("delete").as("ct"), col("b._row").as("r"))))
            .when(col("a._row") =!= col("b._row"), array(
              struct(lit("update_preimage").as("ct"), col("b._row").as("r")),
              struct(lit("update_postimage").as("ct"), col("a._row").as("r"))))
            .otherwise(array().cast(chType))).as("c"))
          .select(col("c.r.*"), col("c.ct").as("_change_type"))
    }
  }

  /** Write `df`'s rows as new UNCOMMITTED data files under the table
    * root (hive-partitioned by `partitionCol`), returning their AddFile
    * records. Files are invisible to readers until a commit references
    * them. */
  def stageData(spark: SparkSession, path: String, df: DataFrame,
      partitionCol: String): Seq[AddFile] = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    val stage = new Path(table, s"_staged-${java.util.UUID.randomUUID()}")
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(stage.toString)
    val adds = fs.listStatus(stage).filter(_.isDirectory).flatMap { pd =>
      val escaped = pd.getPath.getName // partitionCol=escapedValue
      val raw = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(escaped.substring(escaped.indexOf('=') + 1))
      val destDir = new Path(table, escaped)
      fs.mkdirs(destDir)
      fs.listStatus(pd.getPath)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map { f =>
          // job-UUID file names are globally unique — no rename clash
          val dest = new Path(destDir, f.getPath.getName)
          if (!fs.rename(f.getPath, dest))
            throw new java.io.IOException(s"stage move failed: $dest")
          AddFile(s"$escaped/${dest.getName}", raw, -1L)
        }
    }.toSeq
    fs.delete(stage, true)
    adds
  }

  /** Attempt to publish one commit at `version`. Returns false when the
    * version was taken by a concurrent writer (caller re-reads and
    * retries). Writes a checkpoint every [[CheckpointInterval]] commits
    * (best-effort — a checkpoint failure never fails the commit). */
  def tryCommit(spark: SparkSession, path: String, version: Long,
      adds: Seq[AddFile], removes: Seq[AddFile],
      schemaDdl: Option[String] = None): Boolean = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    fs.mkdirs(logDir(table))
    val fields = List(
      "version" -> (JLong(version): JValue),
      "adds" -> renderFiles(adds),
      "removes" -> renderFiles(removes)) ++
      schemaDdl.map(d => "schema" -> (JString(d): JValue)).toList
    val body = JsonMethods.compact(JsonMethods.render(JObject(fields: _*)))
    val ok = writeAtomic(fs, commitPath(table, version), body)
    if (ok && version > 0 && version % CheckpointInterval == 0) {
      try {
        val snap = snapshot(spark, path)
        if (snap.version >= version)
          writeAtomic(fs, checkpointPath(table, snap.version),
            JsonMethods.compact(JsonMethods.render(JObject(
              (List("files" -> renderFiles(snap.files)) ++
                snap.schemaDdl.map(d =>
                  "schema" -> (JString(d): JValue)).toList): _*))))
      } catch { case _: Exception => () }
    }
    ok
  }

  /** MERGE INTO with last-writer-wins semantics, keyed on `keyCol`:
    * rows of `updates` replace current rows with the same key;
    * `removedKeys` (nullable) are deleted. Only partitions present in
    * the batch are read or rewritten.
    *
    * KEY SHAPE CONTRACT: a removed key's partition is derived from the
    * key itself — everything before the first `#` (the engine's
    * composite doc-id form, `databaseId#assetId[#path]`). Keys must
    * embed the partition value as that prefix and partition values
    * must not contain `#`, or the delete's partition is derived wrong
    * and the removal silently misses its row. (Updates carry the
    * partition column explicitly and are not affected.) Retries on commit conflict:
    * partition-disjoint concurrent commits are re-applied verbatim
    * (their base did not change); overlapping ones rebuild the merge
    * from the fresh snapshot. Every retry path re-derives from committed
    * state, so the result is as if the merges ran serially. */
  def merge(spark: SparkSession, path: String, updates: DataFrame,
      removedKeys: DataFrame = null, keyCol: String = "_docId",
      partitionCol: String = "str_databaseid",
      maxAttempts: Int = 20): Unit = {
    val removedWithPart = Option(removedKeys).map(
      _.withColumn(partitionCol, split(col(keyCol), "#").getItem(0)))
    val touched: Set[String] = (
      updates.select(partitionCol).distinct() +:
        removedWithPart.map(_.select(partitionCol).distinct()).toSeq)
      .reduce(_.unionByName(_)).distinct()
      .collect().map(_.getString(0)).toSet
    if (touched.isEmpty) return
    // micro-batch inputs are re-read on every retry; pin them once
    val up = updates.localCheckpoint()
    val rm = Option(removedKeys).map(_.select(keyCol).localCheckpoint())
    var attempt = 0
    var done = false
    var staged: Seq[AddFile] = Seq.empty
    var stagedDdl: Option[String] = None
    // the BASE fileset the staged merge was computed from: staged files
    // are valid to commit ONLY while the touched partitions' live files
    // are exactly this set. Checked at LOOP TOP against the snapshot we
    // are about to commit on — not merely after a failed commit —
    // because between a non-conflicting failure and the retry another
    // writer can rewrite a touched partition, and committing the stale
    // staged files over it would silently drop that writer's rows.
    var stagedBase: Set[AddFile] = Set.empty
    while (!done) {
      attempt += 1
      require(attempt <= maxAttempts, s"merge: $maxAttempts commit conflicts")
      val snap = snapshot(spark, path)
      val oldFiles = snap.files.filter(f => touched(f.partition))
      if (staged.nonEmpty && oldFiles.toSet != stagedBase)
        staged = Seq.empty // base moved — restage from this snapshot
      if (staged.isEmpty) {
        val current =
          if (oldFiles.isEmpty) null
          else spark.read.option("basePath", path)
            .parquet(oldFiles.map(f => s"$path/${f.path}"): _*)
            .withColumn(partitionCol, col(partitionCol).cast("string"))
        val merged = current match {
          case null => up
          case cur =>
            val afterRemove = rm match {
              case Some(r) => cur.join(r, Seq(keyCol), "left_anti")
              case None => cur
            }
            afterRemove
              .join(up.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
              .unionByName(up)
        }
        // stage once per BASE: a partition-disjoint conflict re-commits
        // the same files; any movement of the base restages above
        staged = stageData(spark, path, merged, partitionCol)
        stagedBase = oldFiles.toSet
        // the commit carries the table schema (partition column last,
        // mirroring the partitioned read's column order) so an emptied
        // table keeps its shape
        stagedDdl = Some(org.apache.spark.sql.types.StructType(
          merged.schema.filter(_.name != partitionCol) ++
            merged.schema.find(_.name == partitionCol)).toDDL)
      }
      if (tryCommit(spark, path, snap.version + 1, staged, oldFiles,
        stagedDdl)) done = true
      // on failure: loop re-snapshots; the loop-top base check decides
      // whether the staged files are still valid or must be rebuilt
    }
  }

  /** OPTIMIZE: rewrite each multi-file partition's live files into one
    * compacted file, as an ordinary optimistic COMMIT (adds the
    * compacted file, removes the inputs). This is the transactional
    * answer to small-file buildup from per-batch merges — and, unlike a
    * filesystem-level rewrite ([[graft.core.Layout.compactPartitions]]
    * on plain layouts, which can only detect-and-abort around
    * concurrent writers), a concurrent merge here CONFLICTS at commit
    * time: whoever loses the version race re-reads the log; a
    * compaction whose inputs were replaced restarts from the fresh
    * snapshot, so no concurrent writer's file is ever silently
    * dropped. Row-identical by construction; superseded files remain
    * for time travel until [[vacuum]]'s grace window passes. Returns
    * the number of partitions compacted. */
  def compact(spark: SparkSession, path: String,
      partitionCol: String = "str_databaseid", maxAttempts: Int = 20): Int = {
    var attempt = 0
    while (true) {
      attempt += 1
      require(attempt <= maxAttempts, s"compact: $maxAttempts commit conflicts")
      val snap = snapshot(spark, path)
      val multi = snap.files.groupBy(_.partition).filter(_._2.size > 1)
      if (multi.isEmpty) return 0
      val inputs = multi.values.flatten.toSeq
      val compacted = spark.read.option("basePath", path)
        .parquet(inputs.map(f => s"$path/${f.path}"): _*)
        .withColumn(partitionCol, col(partitionCol).cast("string"))
        // one output file per partition, PARALLEL across partitions:
        // clustering by the partition column puts each partition's rows
        // in one task (the partitioned writer then emits one file per
        // partition dir), while different partitions compact on
        // different tasks — unlike coalesce(1), which would funnel the
        // whole table's rewrite through a single task at scale
        .repartition(col(partitionCol))
      val staged = stageData(spark, path, compacted, partitionCol)
      if (tryCommit(spark, path, snap.version + 1, staged, inputs))
        return multi.size
      // conflict: a writer landed first — its commit may have replaced
      // some of our inputs; restart from the fresh snapshot (our staged
      // files stay unreferenced and are reclaimed by vacuum)
    }
    0
  }

  /** Remove data files no committed version references and stale staging
    * directories, `olderThanMs` old (grace for in-flight writers). */
  def vacuum(spark: SparkSession, path: String,
      olderThanMs: Long = 3600L * 1000): Seq[String] = {
    val table = new Path(path)
    val fs = fsOf(spark, table)
    if (!fs.exists(table)) return Seq.empty
    val live = snapshot(spark, path).files.map(_.path).toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    val removed = scala.collection.mutable.ArrayBuffer.empty[String]
    fs.listStatus(table).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("_staged-")) {
        if (st.getModificationTime < cutoff) {
          fs.delete(st.getPath, true); removed += name
        }
      } else if (st.isDirectory && name.contains("=")) {
        fs.listStatus(st.getPath)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .foreach { f =>
            val rel = s"$name/${f.getPath.getName}"
            if (!live(rel) && f.getModificationTime < cutoff) {
              fs.delete(f.getPath, false); removed += rel
            }
          }
      }
    }
    removed.toSeq
  }
}
