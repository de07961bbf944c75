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
    * per-lang rollup): persist the tiny result, THEN sort. A global
    * sort's range sampler executes the uncached child once and the
    * exchange executes it again, so every agg-then-orderBy query paid
    * its post-shuffle aggregation tail TWICE; with the rollup persisted
    * the sampler reads the cache. NOT `coalesce(1)` — coalesce collapses
    * the whole final stage to one task, which serializes the big
    * distinct/percentile partial merges that stage also contains
    * (measured: vocab_approx 2.6 → 3.0 s at sf1 under coalesce, back
    * under the persist form). ONLY for frames bounded by a group-by's
    * cardinality — a corpus-sized result persists at the caller when
    * its recompute is expensive. */
  def sortedRollup(df: org.apache.spark.sql.DataFrame,
      cols: String*): org.apache.spark.sql.DataFrame =
    graft.core.Caching.persistOnce(df)
      .orderBy(cols.map(org.apache.spark.sql.functions.col): _*)
}
