package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.authz.Abac

/** Row-security auto-injection (SURVEY §4 "custom Catalyst work" item 2).
  *
  * The reference evaluates its ABAC policies in every handler by hand —
  * each listing/search/get re-implements the per-item permission loop
  * (e.g. `handlers/assets/assetService.py:774-790`,
  * `handlers/search/search.py:1711-1737`), and a handler that forgets is
  * an authorization bug. Here the policy is attached to the TABLE: a
  * `Rule[LogicalPlan]` rewrites every scan of a governed path into
  * `Filter(policyPredicate, scan)` during optimization, so ALL entry
  * points — DataFrame code, SQL, anything built on the session — get row
  * security without asking for it, and the predicate participates in
  * normal pushdown (FileSourceStrategy splits it into the parquet
  * reader like any user filter).
  *
  * Governance is keyed by the relation's root path. The rule is
  * idempotent under the optimizer's fixed-point batches via a node tag.
  */
object AbacInjection {

  private val Applied = TreeNodeTag[Boolean]("graft.abac.applied")

  /** path → policy registry (session-independent; paths are stable). */
  private val governed = new ConcurrentHashMap[String, Abac.Policy]()

  def govern(path: String, policy: Abac.Policy): Unit =
    governed.put(normalize(path), policy)

  def ungovern(path: String): Unit = governed.remove(normalize(path))

  def clear(): Unit = governed.clear()

  private def normalize(p: String): String =
    p.stripSuffix("/").replaceFirst("^file:", "")

  private def policyFor(rel: LogicalRelation): Option[Abac.Policy] =
    rel.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.iterator
          .map(rp => governed.get(normalize(rp.toString)))
          .collectFirst { case p if p != null => p }
      case _ => None
    }

  /** The optimizer rule. Injected predicates are compiled from the
    * registered policy against the relation's full schema (column
    * pruning is a Project above the relation, so policy columns always
    * resolve) and bound to the relation's attribute ids. */
  case class Rule0(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformUp {
        case rel: LogicalRelation if rel.getTagValue(Applied).isEmpty =>
          policyFor(rel) match {
            case None => rel
            case Some(policy) =>
              rel.setTagValue(Applied, true)
              val resolve: String => Expression = name =>
                rel.output.find(a => spark.sessionState.conf.resolver(a.name, name))
                  .getOrElse(throw new IllegalStateException(
                    s"ABAC policy column '$name' not in ${rel.schema.fieldNames.mkString(",")}"))
              Filter(Abac.compileExpr(rel.schema, resolve, policy), rel)
          }
      }
  }

  /** Install on an existing session (experimental-methods hook — the
    * extensions path below needs the rule present at session build). */
  def install(spark: SparkSession): Unit = {
    val already = spark.experimental.extraOptimizations.exists {
      case Rule0(_) => true
      case _        => false
    }
    if (!already)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ Rule0(spark)
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — registers the
  * ABAC injection rule (and is the mount point for future custom
  * strategies/expressions) at session build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(AbacInjection.Rule0)
}
