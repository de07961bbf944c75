package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Contains, EndsWith, Expression, Literal, StartsWith}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.query.TextIndex

/** Index selection in the optimizer: substring filters over registered
  * text columns are rewritten to scan ONLY the files whose trigram
  * postings can contain a match — automatically, for every entry point
  * (DataFrame, SQL, anything on the session), with no API change.
  *
  * This is the Spark-native form of the reference delegating text
  * search to its inverted index (`handlers/search/search.py:1074-1121`
  * — OpenSearch picks the index, the caller never does): here the
  * OPTIMIZER picks the index. A `Rule[LogicalPlan]` matches
  * `Filter(... contains/startswith/endswith(textCol, lit) ...)` over a
  * parquet relation whose (path, column) is registered, consults the
  * [[TextIndex]] postings for the candidate file set (a driver-side
  * file LIST, the same footprint as partition pruning), and swaps the
  * relation's file index for the pruned one — the relation's output
  * attributes are reused, so the plan above is untouched and every
  * other conjunct still applies. A no-candidate result collapses the
  * scan to an empty LocalRelation.
  *
  * Soundness: a row matching `%lit%` must contain every trigram of
  * `lit`, so dropping files whose postings lack one cannot drop a
  * matching row; patterns with no literal segment ≥ 3 chars simply
  * don't rewrite. Like-family predicates arrive here as
  * Contains/StartsWith/EndsWith because `LikeSimplification` runs in
  * the same fixed-point batch. Only non-partitioned single-root
  * relations rewrite (partitioned tables keep partition pruning, which
  * composes with the explicit-file form poorly); everything else falls
  * through unchanged.
  */
object TextIndexRewrite {

  private val Applied = TreeNodeTag[Boolean]("graft.triidx.rewritten")

  /** normalized table path → indexed text columns. */
  private val indexedTables = new ConcurrentHashMap[String, Set[String]]()

  def index(path: String, column: String): Unit =
    indexedTables.merge(normalize(path), Set(column), _ ++ _)

  def unindex(path: String): Unit = indexedTables.remove(normalize(path))

  def clear(): Unit = indexedTables.clear()

  private def normalize(p: String): String = {
    val uri = new org.apache.hadoop.fs.Path(p).toUri
    val scheme = Option(uri.getScheme).getOrElse("file")
    val auth = Option(uri.getAuthority).getOrElse("")
    s"$scheme://$auth${uri.getPath.stripSuffix("/")}"
  }

  /** (pattern, column) of the first rewritable conjunct: the predicate
    * stays in the filter (the rewrite only shrinks the scan), so "first
    * match" is purely a pruning choice, never a correctness one. */
  private def rewritableConjunct(cond: Expression, cols: Set[String]): Option[(String, String)] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).collectFirst {
      case Contains(a: AttributeReference, Literal(s: UTF8String, StringType))
          if cols.exists(_.equalsIgnoreCase(a.name)) =>
        ("*" + s.toString + "*", a.name)
      case StartsWith(a: AttributeReference, Literal(s: UTF8String, StringType))
          if cols.exists(_.equalsIgnoreCase(a.name)) =>
        (s.toString + "*", a.name)
      case EndsWith(a: AttributeReference, Literal(s: UTF8String, StringType))
          if cols.exists(_.equalsIgnoreCase(a.name)) =>
        ("*" + s.toString, a.name)
    }
  }

  case class Rule0(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case f @ Filter(cond, rel: LogicalRelation)
          if rel.getTagValue(Applied).isEmpty =>
        rel.relation match {
          case fs: HadoopFsRelation if fs.partitionSchema.isEmpty &&
              fs.location.rootPaths.size == 1 =>
            val root = fs.location.rootPaths.head.toString
            val cols = indexedTables.getOrDefault(normalize(root), Set.empty)
            val hit = if (cols.isEmpty) None else rewritableConjunct(cond, cols)
            hit.flatMap { case (pattern, column) =>
              TextIndex.candidateFiles(spark, root, column, pattern)
            } match {
              case None => f
              case Some(files) if files.isEmpty =>
                // no file can match: the whole subtree is provably empty
                LocalRelation(rel.output, Seq.empty, isStreaming = false)
              case Some(files)
                  if files.length < fs.location.inputFiles.length =>
                val pruned = new InMemoryFileIndex(spark,
                  files.toIndexedSeq.map(new org.apache.hadoop.fs.Path(_)),
                  fs.options, Some(fs.dataSchema))
                val newRel = rel.copy(relation =
                  fs.copy(location = pruned)(spark))
                newRel.setTagValue(Applied, true)
                Filter(cond, newRel)
              case _ =>
                rel.setTagValue(Applied, true) // nothing to prune: don't retry
                f
            }
          case _ => f
        }
    }
  }

  /** Install on an existing session (mirror of AbacInjection.install);
    * sessions built with `spark.sql.extensions=graft.plans.GraftExtensions`
    * get the rule without this. */
  def install(spark: SparkSession): Unit = {
    val extActive = spark.sparkContext.getConf
      .get("spark.sql.extensions", "").contains("graft.plans.GraftExtensions")
    val already = spark.experimental.extraOptimizations.exists {
      case Rule0(_) => true
      case _        => false
    }
    if (!extActive && !already)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ Rule0(spark)
  }
}
