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
