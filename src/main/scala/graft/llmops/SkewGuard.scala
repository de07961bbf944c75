package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degenerate-cell guard for sketch-candidate self-joins.
  *
  * Every banded/bucketed dedup screen (MinHash bands, LSH buckets,
  * bottom-k winnow grams) generates candidates by self-joining members
  * of the same cell. A cell of k members emits k(k-1)/2 pairs: at 100 TB
  * one degenerate cell — a document duplicated 10⁴ times, the all-zeros
  * embedding region, a boilerplate gram in everyone's bottom-8 — makes a
  * k² task no cap elsewhere bounds, the classic skew-kill of AllPairs-
  * style joins.
  *
  * The guard: cells with ≤ `maxCell` members emit all pairs (unchanged
  * semantics); larger cells emit a STAR — every member paired with the
  * cell's first member (minimum id) — which is O(k) pairs and O(k)
  * enumerated rows (the two size classes run as SEPARATE joins, so the
  * quadratic branch never even scans an oversized cell).
  *
  * Semantics of the cap (part of the operator contract, like the
  * viral-gram df-cap at `LlmQueries.NgramDfCap`):
  *  - mass-duplication cells (the case that makes cells this big in
  *    practice) lose nothing that matters: every member links to the
  *    representative, the downstream exact verify confirms each edge,
  *    and connected components collapses the whole cluster exactly as
  *    the all-pairs form would;
  *  - DIVERSE oversized cells keep only representative edges, so a
  *    member-member near-dup whose similarity the rep does not share
  *    can be missed — the documented recall trade. At the default cap
  *    a diverse cell of 1024+ members means the sketch keying has
  *    collapsed (e.g. all-zeros buckets), where all-pairs verification
  *    was never affordable anyway.
  * Deterministic (order by id), so the DuckDB oracles encode the
  * identical contract and results stay hash-exact at every cell size.
  */
object SkewGuard {

  /** Cell-size cap shared by the Spark operators and their SQL oracle
    * twins (inlined into the oracle text — keep in sync). */
  val MaxCellSize = 1024

  /** `spark.sql.shuffle.partitions` may hold a non-numeric value on
    * some deployments (e.g. an "auto" extension) — the old join form
    * tolerated that (the planner resolved it), so the explicit
    * repartition must too: fall back to the cluster default.
    * (Delegates to the library-wide parse in [[graft.core.GraftSession]].) */
  private[llmops] def parseWidth(raw: String, fallback: Int): Int =
    graft.core.GraftSession.parseWidth(raw, fallback)

  /** Candidate pairs (a_id, b_id), a < b, per cell of `cellCols`, with
    * the oversized-cell star guard. Callers dedup across cells with
    * `.distinct()` exactly as they did over the raw self-join.
    *
    * `carryCols` propagate per-item payload columns onto the pairs as
    * `a_<name>`/`b_<name>` — for SMALL payloads (a few scalars, e.g.
    * phash bands) this removes the two verify joins downstream; large
    * payloads (signature arrays, gram sets) should stay on the
    * join-back path, since every band row duplicates the carried
    * values. Dedup across cells with `.dropDuplicates("a_id", "b_id")`
    * (carried values are functions of the id, so any row of a pair is
    * the same row). */
  def cellPairs(items: DataFrame, cellCols: Seq[String], idCol: String,
      maxCell: Int = MaxCellSize,
      carryCols: Seq[String] = Nil): DataFrame = {
    // ONE exchange: cluster rows by cell, sort (cell, id) within each
    // partition, and stream the pairs out of a per-partition pass. The
    // previous join formulation ([[cellPairsJoin]], kept as the spec
    // reference) paid FIVE exchanges — the window build plus two
    // shuffled-hash self-joins — which at bench scale is pure stage
    // floor (llm_mm_phash: 7 exchanges total, oracle 4×) and at 100 TB
    // re-shuffles the band rows three times. Memory stays bounded at
    // O(maxCell) rows per task: a cell is buffered only up to
    // maxCell + 1 rows — the moment it overflows, the buffer drains as
    // star pairs and the rest of the cell STREAMS against the pinned
    // representative, so a degenerate 10⁷-row cell never materializes
    // anywhere (the join form kept it inside a spillable sort; this
    // keeps it inside the same sort and never re-collects it).
    // Output is row-for-row the join form's multiset: all (a < b)
    // pairs for cells ≤ maxCell, rep × each remaining member above it
    // (ties on id included, exactly like the star join's cell-equality
    // condition); rows with a NULL cell key match nothing under the
    // join's `===` and are filtered up front to preserve that.
    val spark = items.sparkSession
    val width = parseWidth(spark.conf.get("spark.sql.shuffle.partitions"),
      spark.sparkContext.defaultParallelism)
    // the per-partition pass compares cell keys and ids with boxed
    // equality (Row.get != Row.get). For integral/string/boolean keys
    // that is exactly the join form's `===`; for float (-0.0 vs 0.0,
    // NaN) and binary (reference equality on Array[Byte]) it silently
    // diverges — refuse those up front rather than emit wrong pairs
    val inTypes = items.select((cellCols :+ idCol).map(col): _*).schema
    inTypes.fields.foreach { f =>
      import org.apache.spark.sql.types._
      val ok = f.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case StringType | BooleanType => true
        case DateType | TimestampType => true
        case _ => false
      }
      require(ok, s"cellPairs key/id column '${f.name}' has type " +
        s"${f.dataType.simpleString}; boxed equality diverges from === " +
        "for float/binary keys — hash such keys to LONG first " +
        "(e.g. xxhash64)")
    }
    val proj = items
      .filter(cellCols.map(col(_).isNotNull).reduce(_ && _))
      .select((cellCols ++ (idCol +: carryCols)).map(col): _*)
      .repartition(width, cellCols.map(col): _*)
      .sortWithinPartitions((cellCols :+ idCol).map(col): _*)
    val inSchema = proj.schema
    val nCell = cellCols.length
    val nCarry = carryCols.length
    val idType = inSchema(nCell).dataType
    val outSchema = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("a_id", idType),
        org.apache.spark.sql.types.StructField("b_id", idType)) ++
        carryCols.flatMap { c =>
          val f = inSchema(inSchema.fieldIndex(c))
          Seq(f.copy(name = s"a_$c"), f.copy(name = s"b_$c"))
        })
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    proj.mapPartitions { rows =>
      val it = rows.buffered
      def sameCell(a: org.apache.spark.sql.Row,
          b: org.apache.spark.sql.Row): Boolean = {
        var k = 0
        while (k < nCell) {
          if (a.get(k) != b.get(k)) return false
          k += 1
        }
        true
      }
      def mkPair(a: org.apache.spark.sql.Row,
          b: org.apache.spark.sql.Row): org.apache.spark.sql.Row = {
        val vs = new Array[Any](2 + 2 * nCarry)
        vs(0) = a.get(nCell)
        vs(1) = b.get(nCell)
        var k = 0
        while (k < nCarry) {
          vs(2 + 2 * k) = a.get(nCell + 1 + k)
          vs(3 + 2 * k) = b.get(nCell + 1 + k)
          k += 1
        }
        org.apache.spark.sql.Row.fromSeq(scala.collection.immutable
          .ArraySeq.unsafeWrapArray(vs))
      }
      new Iterator[org.apache.spark.sql.Row] {
        private var out: Iterator[org.apache.spark.sql.Row] = Iterator.empty
        private def advance(): Unit = {
          while (!out.hasNext && it.hasNext) {
            val first = it.next()
            val buf = scala.collection.mutable.ArrayBuffer(first)
            var overflow = false
            while (!overflow && it.hasNext && sameCell(it.head, first)) {
              buf += it.next()
              if (buf.length > maxCell) overflow = true
            }
            if (!overflow) {
              // all (i < j) pairs; equal-id ties skipped, matching the
              // small join's a_id < b_id condition (rows are id-sorted,
              // so inequality within the sort ⟺ strictly smaller id)
              val n = buf.length
              out = new Iterator[org.apache.spark.sql.Row] {
                private var i = 0
                private var j = 1
                private var nxt: org.apache.spark.sql.Row = null
                private def seek(): Unit = {
                  while (nxt == null && i < n - 1) {
                    if (j >= n) { i += 1; j = i + 1 }
                    else {
                      if (buf(i).get(nCell) != buf(j).get(nCell))
                        nxt = mkPair(buf(i), buf(j))
                      j += 1
                    }
                  }
                }
                def hasNext: Boolean = { seek(); nxt != null }
                def next(): org.apache.spark.sql.Row = {
                  seek(); val r = nxt; nxt = null; r
                }
              }
            } else {
              // star: the id-smallest row is the representative; every
              // other row of the cell (buffered so far, then streamed)
              // pairs with it — O(maxCell) memory however big the cell
              val rep = buf.head
              val buffered = buf.iterator.drop(1)
              val streamed = new Iterator[org.apache.spark.sql.Row] {
                def hasNext: Boolean = it.hasNext && sameCell(it.head, first)
                def next(): org.apache.spark.sql.Row = it.next()
              }
              out = (buffered ++ streamed).map(m => mkPair(rep, m))
            }
          }
        }
        def hasNext: Boolean = { advance(); out.hasNext }
        def next(): org.apache.spark.sql.Row = { advance(); out.next() }
      }
    }(enc)
  }

  /** The join formulation of [[cellPairs]] — two shuffled-hash
    * self-joins over a window-sized frame. Semantically identical
    * (specs fuzz the two against each other); kept as the reference
    * because its size/star contract is stated in relational form, the
    * same form the SQL oracle twins inline. */
  private[llmops] def cellPairsJoin(items: DataFrame, cellCols: Seq[String],
      idCol: String, maxCell: Int = MaxCellSize,
      carryCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyCols = cellCols.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(col(idCol))
    val sized = items.select((cellCols ++ (idCol +: carryCols)).map(col): _*)
      .withColumn("_rn", row_number().over(w))
      // same partition AND order spec as _rn with an unbounded frame:
      // both window functions evaluate in ONE WindowExec / one sort
      .withColumn("_cnt", count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      // one window pass feeds both size classes; cached so the two
      // branches (and the self-join's two sides) don't recompute it —
      // entry is deduped by plan and released with the session cache
      .persist()
    def side(p: String, d: DataFrame) =
      d.select(cellCols.map(c => col(c).as(s"${p}_$c")) ++
        (col(idCol).as(s"${p}_id") +:
          carryCols.map(c => col(c).as(s"${p}_$c"))): _*)
    val cellEq = cellCols.map(c => col(s"a_$c") === col(s"b_$c"))
      .reduce(_ && _)
    val outCols = (Seq("a_id", "b_id") ++
      carryCols.flatMap(c => Seq(s"a_$c", s"b_$c"))).map(col)
    val small = sized.filter(col("_cnt") <= maxCell)
    val smallPairs = side("a", small).hint("shuffle_hash")
      .join(side("b", small), cellEq && col("a_id") < col("b_id"))
      .select(outCols: _*)
    val reps = sized.filter(col("_cnt") > maxCell && col("_rn") === 1)
    val members = sized.filter(col("_cnt") > maxCell && col("_rn") > 1)
    val starPairs = side("a", reps)
      .hint("shuffle_hash")
      .join(side("b", members), cellEq)
      .select(outCols: _*)
    smallPairs.unionByName(starPairs)
  }

  /** SQL fragment pair for the oracle twins: a `sized` CTE body over
    * `src` and the capped `cand` select, parameterized on column names.
    * Kept here so every oracle inlines the SAME contract. */
  def oracleCandSql(src: String, cellCols: Seq[String], idCol: String,
      aName: String, bName: String): String = {
    val key = cellCols.mkString(", ")
    val eq = cellCols.map(c => s"a.$c = b.$c").mkString(" AND ")
    s"""_sized AS (
       |  SELECT $key, $idCol,
       |         row_number() OVER (PARTITION BY $key ORDER BY $idCol) AS _rn,
       |         count(*) OVER (PARTITION BY $key) AS _cnt
       |  FROM $src
       |), cand AS (
       |  SELECT DISTINCT a.$idCol AS $aName, b.$idCol AS $bName
       |  FROM _sized a JOIN _sized b
       |    ON $eq AND a.$idCol < b.$idCol
       |  WHERE a._cnt <= $MaxCellSize
       |  UNION
       |  SELECT DISTINCT a.$idCol, b.$idCol
       |  FROM _sized a JOIN _sized b
       |    ON $eq AND a._rn = 1 AND b._rn > 1
       |  WHERE a._cnt > $MaxCellSize
       |)""".stripMargin
  }
}
