package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.registry._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 (and the LLM-pipeline
  * additions) is one named entry in [[queries]]; SQL-expressible ones have
  * a DuckDB oracle twin in [[oracleSql]] with identical column names and
  * deterministic row order.
  */
object SparkEntry {

  private def all: Seq[QueryDef] =
    CoreQueries.defs ++ JoinAggQueries.defs ++ GraphQueries.defs ++
      StreamQueries.defs ++ LlmQueries.defs ++ ApiQueries.defs ++
      CoverageQueries.defs ++ MoreQueries.defs ++ SurfaceQueries.defs ++
      PipelineQueries.defs ++ CurationQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the J1 document-enrichment join (fact ⋈ broadcast dims ⋈ detail agg). */
  def entry(spark: SparkSession): DataFrame =
    queries("j1_doc_enrichment")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
