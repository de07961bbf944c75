package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (where the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle twin. Column names
  * and row order are deterministic and identical on both sides — the
  * driver hash-compares values after sorting columns by name.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle.stripMargin.trim))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)

  /** The engine's stable 60-bit hash bucket as DuckDB SQL over a string
    * expression — the single source of the formula that must stay
    * bit-identical to [[graft.llmops.Text.hash60]] across every oracle. */
  def hashBucketSql(expr: String): String =
    s"CAST(('0x' || substring(md5($expr), 1, 15)) AS BIGINT) % 2147483647"

  /** Total order for a GROUP-CARDINALITY result frame (a per-source /
    * per-lang rollup): shuffle the tiny result into ONE partition and
    * sort within it. Identical total order to `orderBy` (the rollup's
    * sort key is a deterministic total order), ONE operator-tree
    * execution in ONE job — where `orderBy` pays a range-sampler job
    * that executes the uncached child once and an exchange that
    * executes it again (the r14 fix persisted the child so the sampler
    * read cache, but still paid persist + two jobs; measured r15:
    * repartition(1) saves 0.1-0.3 s/query at sf0.1 on top of that).
    * NOT `coalesce(1)` — coalesce collapses the whole final stage to
    * one task, which serializes the big distinct/percentile partial
    * merges that stage also contains (measured: vocab_approx 2.6 →
    * 3.0 s at sf1 under coalesce). `repartition(1)` keeps the
    * aggregation at full width and adds a narrow single-task exchange
    * AFTER it — scale-safe for exactly the frames this helper is
    * documented for: results bounded by a group-by's cardinality
    * (sources/langs — a few thousand rows at any corpus size). A
    * corpus-sized result must keep a range sort at the caller. */
  def sortedRollup(df: org.apache.spark.sql.DataFrame,
      cols: String*): org.apache.spark.sql.DataFrame =
    df.repartition(1)
      .sortWithinPartitions(cols.map(org.apache.spark.sql.functions.col): _*)
}
