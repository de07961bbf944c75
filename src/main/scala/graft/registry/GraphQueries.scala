package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.graph.Traversal

/** SURVEY §2.3 J6 — recursive graph traversal (asset-link descendant
  * trees, `assetLinksService.py:337-405`), expressed as an iterative
  * frontier-join loop with cycle detection via a path column.
  */
object GraphQueries {
  import QueryDef.sql

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Edge list: region→nation ∪ nation→customer (custkey bounded to keep
    * the tree small and the output deterministic at every SF). */
  private def edges(s: SparkSession, d: String): DataFrame = {
    val rn = t(s, d, "nation").select(
      concat(lit("r"), col("n_regionkey")).as("parent"),
      concat(lit("n"), col("n_nationkey")).as("child"))
    val nc = t(s, d, "customer").filter(col("c_custkey") < 200).select(
      concat(lit("n"), col("c_nationkey")).as("parent"),
      concat(lit("c"), col("c_custkey")).as("child"))
    rn.unionByName(nc)
  }

  val defs: Seq[QueryDef] = Seq(
    sql("j6_recursive_tree",
      """WITH RECURSIVE e AS (
        |  SELECT 'r' || CAST(n_regionkey AS VARCHAR) AS parent,
        |         'n' || CAST(n_nationkey AS VARCHAR) AS child FROM nation
        |  UNION ALL
        |  SELECT 'n' || CAST(c_nationkey AS VARCHAR),
        |         'c' || CAST(c_custkey AS VARCHAR)
        |  FROM customer WHERE c_custkey < 200
        |), tree(node, depth, path) AS (
        |  SELECT 'r0', 0, 'r0'
        |  UNION ALL
        |  SELECT e.child, tree.depth + 1, tree.path || '/' || e.child
        |  FROM tree JOIN e ON e.parent = tree.node
        |)
        |SELECT node, depth, path FROM tree ORDER BY path""")(
      (s, d) => Traversal
        .descendants(edges(s, d), root = "r0", maxDepth = 10)
        .orderBy("path"))
  )
}
