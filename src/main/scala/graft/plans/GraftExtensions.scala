package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation, FileTable}

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
  * Governance is keyed by normalized URI PREFIX: a read of a
  * subdirectory, partition path, glob expansion, or individual file
  * under a governed root is governed too, and `file:/x`, `file:///x`
  * and `/x` resolve to the same key (s3/s3a/s3n likewise). Both v1
  * parquet relations and DSv2 file tables are matched.
  *
  * Scope limits (documented, enforced by specs where possible):
  * `govern`/`ungovern` invalidate the ACTIVE sessions' plan caches of
  * this JVM so previously-cached unfiltered plans cannot serve governed
  * reads; streaming sources are NOT matched by this rule — govern the
  * sink/table a stream materializes, not the stream itself.
  */
object AbacInjection {

  private val Applied = TreeNodeTag[Boolean]("graft.abac.applied")

  /** normalized path prefix → policy registry. */
  private val governed = new ConcurrentHashMap[String, Abac.Policy]()

  def govern(path: String, policy: Abac.Policy): Unit = {
    governed.put(normalize(path), policy)
    invalidateCaches()
  }

  def ungovern(path: String): Unit = {
    governed.remove(normalize(path))
    invalidateCaches()
  }

  def clear(): Unit = {
    governed.clear()
    invalidateCaches()
  }

  /** A governed-policy change must drop cached plans: `df.cache()` of a
    * governed read compiled BEFORE `govern()` would otherwise keep
    * serving unfiltered rows (and vice versa after `ungovern`). Session
    * scope is this JVM's active/default sessions — matching the
    * registry's single-process scope. */
  private def invalidateCaches(): Unit =
    (SparkSession.getActiveSession.toSeq ++ SparkSession.getDefaultSession)
      .distinct.foreach { s =>
        try s.sharedState.cacheManager.clearCache()
        catch { case _: Throwable => () }
      }

  /** Scheme-normalized, trailing-slash-free URI: `file:///x`, `file:/x`
    * and `/x` → `file:/x`; `s3`/`s3a`/`s3n` unify; relative paths
    * resolve through Hadoop Path normalization (`..`, `//`). */
  private[plans] def normalize(p: String): String = {
    val uri = new org.apache.hadoop.fs.Path(p).toUri
    val scheme = Option(uri.getScheme).getOrElse("file") match {
      case "s3a" | "s3n" => "s3"
      case s             => s
    }
    val auth = Option(uri.getAuthority).getOrElse("")
    s"$scheme://$auth${uri.getPath.stripSuffix("/")}"
  }

  /** True when `path` equals a governed root or sits strictly under one.
    * When BOTH a root and a nested path are governed (e.g. `/data` and
    * `/data/sub`), the MOST SPECIFIC (longest) prefix wins —
    * ConcurrentHashMap iteration order must never decide which policy
    * applies to reads under the nested root. */
  private def lookup(path: String): Option[Abac.Policy] = {
    val n = normalize(path)
    val it = governed.entrySet().iterator()
    var bestLen = -1
    var found: Option[Abac.Policy] = None
    while (it.hasNext) {
      val e = it.next()
      if ((n == e.getKey || n.startsWith(e.getKey + "/")) &&
          e.getKey.length > bestLen) {
        bestLen = e.getKey.length
        found = Some(e.getValue)
      }
    }
    found
  }

  private def policyFor(plan: LogicalPlan): Option[Abac.Policy] = plan match {
    case rel: LogicalRelation =>
      rel.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.iterator
            .flatMap(rp => lookup(rp.toString)).nextOption()
        case _ => None
      }
    case rel: DataSourceV2Relation =>
      rel.table match {
        case ft: FileTable =>
          ft.fileIndex.rootPaths.iterator
            .flatMap(rp => lookup(rp.toString)).nextOption()
        case _ => None
      }
    // extraOptimizations run after the main batches, where V2 pushdown
    // has already turned DataSourceV2Relation into a ScanRelation — the
    // injected Filter then evaluates above the scan (correct rows; the
    // session-extensions install path sees the pre-pushdown relation and
    // gets full pushdown)
    case rel: DataSourceV2ScanRelation =>
      rel.relation.table match {
        case ft: FileTable =>
          ft.fileIndex.rootPaths.iterator
            .flatMap(rp => lookup(rp.toString)).nextOption()
        case _ => None
      }
    case _ => None
  }

  /** The optimizer rule. Injected predicates are compiled from the
    * registered policy against the relation's full schema (column
    * pruning is a Project above the relation, so policy columns always
    * resolve) and bound to the relation's attribute ids. */
  case class Rule0(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformUp {
        case rel @ (_: LogicalRelation | _: DataSourceV2Relation |
            _: DataSourceV2ScanRelation)
            if rel.getTagValue(Applied).isEmpty =>
          policyFor(rel) match {
            case None => rel
            case Some(policy) =>
              rel.setTagValue(Applied, true)
              // FAIL CLOSED: a governed scan whose policy columns are
              // not in the relation output (a DSv2 scan already pruned
              // by pushdown — this rule ran too late, e.g. via the
              // experimental install() hook instead of the
              // GraftExtensions session-build path) must error, never
              // silently return unfiltered rows.
              val resolve: String => Expression = name =>
                rel.output.find(a => spark.sessionState.conf.resolver(a.name, name))
                  .getOrElse(throw new SecurityException(
                    s"governed scan cannot enforce its row policy: column '$name' " +
                      s"is not in the scan output [${rel.output.map(_.name).mkString(",")}] " +
                      "(DSv2 scan pruned before injection — build the session with " +
                      "spark.sql.extensions=graft.plans.GraftExtensions so the rule " +
                      "runs before scan pushdown)"))
              Filter(Abac.compileExpr(rel.schema, resolve, policy), rel)
          }
      }
  }

  /** Install on an existing session (experimental-methods hook — the
    * extensions path below needs the rule present at session build).
    * No-ops when the session's context was built WITH GraftExtensions:
    * the extension-registered rule already runs pre-pushdown, and a
    * second late-path copy would re-match the rewritten DSv2 scan
    * relation (tags do not survive that rewrite) and inject the policy
    * filter twice. */
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

/** `spark.sql.extensions=graft.plans.GraftExtensions` — registers the
  * ABAC injection and text-index-selection rules (and is the mount
  * point for future custom strategies/expressions) at session build
  * time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(AbacInjection.Rule0)
    ext.injectOptimizerRule(TextIndexRewrite.Rule0)
  }
}
