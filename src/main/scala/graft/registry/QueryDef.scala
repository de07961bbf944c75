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
}
