package graft.core

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-layout helpers for the 100 TB deployment shape.
  *
  * - Bucketing: the file-doc ⋈ metadata / attribute joins repeat on the
  *   entity key for every incremental rebuild (SURVEY J2/ST4); writing
  *   both sides bucketed on that key makes the join exchange-free — the
  *   sort-merge join reads co-located buckets directly (spec asserts a
  *   plan with zero Exchange nodes).
  * - Salting: hot entity keys (a database with most of the assets —
  *   SURVEY §7.5.7) would route one shuffle partition most of the data;
  *   a salted join spreads each key over `salt` sub-partitions and
  *   replicates the (small) other side per salt value. AQE skew-join
  *   handles moderate skew automatically; salting is the deterministic
  *   fallback for the pathological keys.
  */
object Layout {

  /** Write `df` bucketed (and bucket-sorted) on `key` as a table at
    * `path` — both sides of a repeated equi-join written this way join
    * without any exchange. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  /** Salted equi-join: every row of `skewed` gets one of `salt` salt
    * values; `other` is replicated once per salt value, so each
    * (key, salt) shuffle partition carries ~1/salt of a hot key.
    * Result is identical to `skewed.join(other, key)`. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val l = skewed.withColumn("_salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salt)))
    val r = other.withColumn("_salt",
      explode(array((0 until salt).map(lit): _*)))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Z-ORDER clustering (the Delta `OPTIMIZE ZORDER BY` / space-filling
    * curve layout): cluster rows so that EVERY listed column's min/max
    * footer stats are tight per file, not just the leading sort key's.
    * A linear sort on (x, y) gives perfect x-skipping and ZERO
    * y-skipping; interleaving the bit patterns of rank-normalized x and
    * y makes each output file cover a small tile of the (x, y) domain,
    * so a predicate on EITHER column prunes ~sqrt-of-files via ordinary
    * parquet row-group/footer stats — no custom read path at all
    * (Spark's parquet pushdown consumes the stats natively).
    *
    * Rank normalization uses `approxQuantile` bin boundaries (one
    * sketch pass, driver gets 2^bits-1 values per column — never rows),
    * so arbitrary value distributions cluster uniformly: the curve
    * position is computed from each value's QUANTILE bin, the
    * equal-frequency analogue of Delta's range-id approach. The bin
    * lookup is a codegen'd fold over the broadcast boundary array
    * (2^bits comparisons/row; bits=8 default = 256 — cheap next to the
    * shuffle it feeds), the z-value one integer expression, and the
    * layout one range exchange on that z-value. */
  def zValue(binCols: Seq[org.apache.spark.sql.Column], bits: Int)
      : org.apache.spark.sql.Column = {
    val n = binCols.length
    val terms = for {
      (bc, c) <- binCols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftrightunsigned(bc.cast("long"), i) % 2,
      i * n + (n - 1 - c))
    terms.reduce(_ + _)
  }

  /** The quantile-bin column for one z-dimension: the number of sketch
    * boundaries ≤ the value, 0 .. 2^bits-1. NULLs sort to bin 0. */
  private def quantileBin(c: org.apache.spark.sql.Column,
      bounds: Array[Double]): org.apache.spark.sql.Column =
    bounds.map(b => when(c.isNotNull && c >= b, 1).otherwise(0))
      .reduceOption(_ + _).getOrElse(lit(0))

  /** Returns `df` clustered along the z-curve over `zCols` into
    * `numFiles` range partitions (each internally z-sorted, so row
    * groups inherit the tile locality too). Write the result with
    * `.write.parquet(...)` — or feed it to any sink that preserves
    * partitioning. */
  /** The z-curve position column for `df`'s rows over `zCols` — the
    * composable piece: [[zOrder]] clusters a free-standing frame on it,
    * and the transaction log's OPTIMIZE ZORDER appends it to its own
    * (partition, z) range clustering. Runs the one `approxQuantile`
    * sketch pass here (driver receives only boundary arrays). */
  def zColumn(df: DataFrame, zCols: Seq[String], bits: Int = 8)
      : org.apache.spark.sql.Column = {
    require(zCols.nonEmpty, "zOrder needs at least one column")
    require(bits >= 1 && bits * zCols.length <= 62,
      s"bits * cols must fit a long, got $bits * ${zCols.length}")
    val nBins = 1 << bits
    val probes = (1 until nBins).map(_.toDouble / nBins).toArray
    // one sketch pass for ALL columns (GK quantile summaries merge
    // map-side; the driver receives only the boundary arrays)
    val allBounds = df.stat.approxQuantile(zCols.toArray, probes, 0.001)
    val bins = zCols.zip(allBounds).map { case (c, bs) =>
      quantileBin(col(c).cast("double"), bs.distinct.sorted)
    }
    zValue(bins, bits)
  }

  def zOrder(df: DataFrame, zCols: Seq[String], numFiles: Int,
      bits: Int = 8): DataFrame =
    df.withColumn("_z", zColumn(df, zCols, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")

  /** Z-order `df` and write it as plain parquet at `path`. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      numFiles: Int, bits: Int = 8): Unit =
    zOrder(df, zCols, numFiles, bits)
      .write.mode("overwrite").parquet(path)

  /** O6 — opaque continuation tokens (common/dynamodb.py:98-144 encodes
    * LastEvaluatedKey as base64): round-trip the last row key. */
  def encodeToken(lastKey: String): String =
    Base64.getUrlEncoder.withoutPadding
      .encodeToString(lastKey.getBytes(StandardCharsets.UTF_8))

  def decodeToken(token: String): String =
    new String(Base64.getUrlDecoder.decode(token), StandardCharsets.UTF_8)

  /** Small-file compaction for a hive-partitioned parquet table — the
    * maintenance pass every incremental-merge table needs at 100 TB:
    * each micro-batch's dynamic-partition overwrite leaves
    * shuffle-width-many small files per touched partition, and scan cost
    * degrades with file count (task-per-file scheduling, footer reads,
    * no row-group coalescing across files).
    *
    * Per partition directory (driver sees only directory METADATA, never
    * rows): if the file count exceeds what `targetBytes` sizing needs,
    * rewrite that partition's rows into ceil(bytes/targetBytes) files.
    * Untouched partitions' files are not read, not rewritten. Rewrites
    * run per partition (the OPTIMIZE/file-group convention) — a narrow
    * coalesce, no shuffle. The compacted copy is written to a hidden
    * temp directory FIRST (source files stay intact and re-readable for
    * the whole job), then swapped in via delete+rename: a writer
    * failure before the swap leaves the partition untouched, and a
    * failure between the delete and the rename leaves the full
    * compacted copy recoverable in the temp directory — there is no
    * window where the only copy of the rows is non-fault-tolerant
    * executor state.
    *
    * Not transactional for READERS: one listing the partition during
    * the metadata swap can see partial state — production tables layer
    * Delta/Iceberg OPTIMIZE for snapshot isolation; the per-partition
    * I/O shape is the same.
    *
    * Writer safety — DETECT-AND-ABORT, not exclusion: the partition's
    * file listing is snapshotted before the compacted copy is written
    * and re-checked immediately before the delete. If a concurrent
    * writer (e.g. the incremental-merge micro-batch this maintains)
    * added or replaced files in between, the swap is ABORTED for that
    * partition — the temp copy is removed, the live files are
    * untouched, and the partition is simply reported as not compacted
    * (the next compaction pass picks it up). Two windows REMAIN open
    * on a plain filesystem and cannot be closed by re-listing: a write
    * landing between the final re-list and the delete is lost with the
    * directory, and a same-name same-length replacement within the
    * filesystem's mtime granularity passes the listing compare. Plain
    * layouts must therefore schedule compaction in the writer's
    * maintenance window (single-writer discipline), which is the
    * operating assumption of every plain-parquet maintainer here. When
    * writers and compaction must genuinely overlap, use the
    * transaction-log table's [[graft.sources.TxLog.compact]]: its
    * commit protocol makes the conflict a version race that the loser
    * RETRIES, so lost updates are impossible rather than detected.
    *
    * Returns the partition directory names that were compacted. */
  def compactPartitions(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, partitionCol: String,
      targetBytes: Long = 128L * 1024 * 1024,
      // test seam: runs after the compacted copy is written and before
      // the pre-swap re-listing, where a concurrent write would race
      afterCopy: String => Unit = _ => ()): Seq[String] = {
    val hPath = new org.apache.hadoop.fs.Path(tablePath)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(hPath)) return Seq.empty
    val partDirs = fs.listStatus(hPath).filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith(s"$partitionCol="))
    val compacted = partDirs.flatMap { pd =>
      val files = fs.listStatus(pd)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      val bytes = files.map(_.getLen).sum
      val targetN = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      if (files.length <= targetN) None
      else {
        // reading the partition DIRECTORY yields the data columns only
        // (no partition column) — exactly what its rewritten files must
        // contain under hive layout. The dot-prefixed temp dir is
        // invisible to parquet listings of the table root.
        val tmp = new org.apache.hadoop.fs.Path(hPath,
          s".compact_tmp_${pd.getName}")
        // snapshot of (name, length, mtime) the compacted copy is built
        // from — compared against a fresh listing right before the swap
        def listing() = fs.listStatus(pd)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .map(f => (f.getPath.getName, f.getLen, f.getModificationTime))
          .toSet
        val before = listing()
        spark.read.parquet(pd.toString).coalesce(targetN)
          .write.mode("overwrite").parquet(tmp.toString)
        afterCopy(pd.getName)
        if (listing() != before) {
          // a concurrent writer touched the partition while the copy was
          // being built — swapping would silently drop its files. Abort:
          // the live partition is intact, only the temp copy is discarded.
          fs.delete(tmp, true)
          None
        } else {
          fs.delete(pd, true)
          if (!fs.rename(tmp, pd))
            throw new java.io.IOException(
              s"compaction swap failed: compacted copy preserved at $tmp")
          Some(pd.getName)
        }
      }
    }
    compacted.toSeq.sorted
  }
}
