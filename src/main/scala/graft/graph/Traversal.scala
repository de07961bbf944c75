package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph operators over an edge DataFrame `(parent, child)`.
  *
  * Reference: recursive descendant DFS with per-branch cycle detection,
  * `backend/backend/handlers/assetLinks/assetLinksService.py:337-405`.
  *
  * Implementation: iterative frontier expansion — each level is one
  * distributed join of the current frontier against the edge table; the
  * driver only checks emptiness (a cheap `isEmpty`, not a collect of
  * rows). Cycle safety comes from the accumulated `path` column
  * (`!path.contains(child)` ≙ the reference's per-branch visited set).
  *
  * Scale: each level is an equi-join on `parent` — with the edge table
  * bucketed on `parent` this is shuffle-free after the first level. Depth
  * is bounded (`maxDepth`), matching the reference's practical tree
  * depth; frontiers are checkpoint-free because each level's lineage is
  * one join deep (we localCheckpoint every few levels to cut lineage for
  * very deep graphs).
  */
object Traversal {

  /** All descendants of `root` with depth and full path; cycle-safe.
    *
    * Each level is persisted and counted ONCE — the count doubles as the
    * termination check and the cache materialization, so the final
    * union-tree action reads every level from cache instead of
    * recomputing the whole prefix per level (one job per level total).
    */
  def descendants(edges: DataFrame, root: String, maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val e = edges.select(col("parent"), col("child")).persist()
    var frontier = Seq((root, 0, root)).toDF("node", "depth", "path")
    val levels = scala.collection.mutable.ArrayBuffer(frontier)
    var depth = 0
    var n = 1L
    while (depth < maxDepth && n > 0) {
      val next = frontier
        .join(e, frontier("node") === e("parent"))
        .filter(!concat(lit("/"), col("path"), lit("/")).contains(
          concat(lit("/"), col("child"), lit("/"))))
        .select(col("child").as("node"), (col("depth") + 1).as("depth"),
          concat(col("path"), lit("/"), col("child")).as("path"))
        .persist()
      n = next.count()
      if (n > 0) levels += next
      else next.unpersist(false) // terminating empty frontier: not in
      // `levels`, so the cleanup below would never release it
      frontier = next
      depth += 1
    }
    // materialize the union ONCE (each level still reads its cache, so
    // this is one job over cached blocks), then release every level and
    // the edge cache — repeated traversals no longer accumulate
    // executor-memory entries. localCheckpoint blocks are reference-
    // tracked: the ContextCleaner frees them when the returned frame is
    // garbage collected, so nothing is pinned beyond the caller's use.
    val result = levels.reduce(_ unionByName _).localCheckpoint(true)
    levels.foreach(_.unpersist(false))
    e.unpersist(false)
    result
  }
}
