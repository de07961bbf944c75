package graft.authz

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Constraint-table → [[Abac.Policy]] loader — the production entry point
  * of every governed query.
  *
  * Reference: the Casbin enforcer builds its policy text from stored
  * constraint records per user
  * (`backend/backend/handlers/authz/__init__.py:197-276` batch read with
  * `#group#`/`#user#` suffix dedup, `:468-556` policy-line generation;
  * criteria → matcher rules `:387-423`; effect model
  * `backend/backend/common/constants.py:116-131`). This loader reproduces
  * those semantics over a constraints DataFrame (the Spark twin of the
  * denormalized constraints table) and emits the [[Abac.Policy]] DNF that
  * [[Abac.enforce]] / [[graft.plans.AbacInjection]] compile to pushed row
  * predicates.
  *
  * Faithful behaviors:
  *  - denormalized rows dedup by BASE constraintId (suffix
  *    `#group#{g}` / `#user#{u}` stripped);
  *  - a user's applicable rules = group permissions whose groupId is one
  *    of the user's role names + user permissions for the userId, each
  *    filtered to the requested action, with `permissionType` routing to
  *    the allow or deny set (missing/empty → allow);
  *  - `criteriaAnd` → one conjunctive rule; `criteriaOr` → one
  *    single-criterion rule per criterion (the reference emits
  *    `c1 || c2 …` as one Casbin line — same DNF);
  *  - legacy `criteria` appends to `criteriaAnd`;
  *  - criteria on fields outside [[ConstraintFields]] are skipped
  *    (reference `:390-392`), and a rule whose every criterion was
  *    skipped emits nothing;
  *  - a constraint with no criteria at all grants nothing (the reference
  *    emits no policy line for it);
  *  - MFA gating of roles: without MFA only roles with
  *    `mfaRequired` absent or false count (`:337-359,470-478`).
  *
  * Divergence (by design): the reference guards each constraint with an
  * `object__type equals <objectType>` matcher criterion evaluated per
  * request; here governance is attached per TABLE, so the loader selects
  * constraints whose `objectType` matches the governed table's type
  * up front — same decisions, no per-row type dispatch.
  */
object PolicyLoader {

  /** Mirror of PERMISSION_CONSTRAINT_FIELDS (constants.py:87-113). */
  val ConstraintFields: Set[String] = Set(
    "databaseId", "assetName", "assetType", "tags", "tagName",
    "tagTypeName", "roleName", "userId", "pipelineId", "pipelineType",
    "pipelineExecutionType", "workflowId", "metadataSchemaName",
    "metadataSchemaEntityType", "object__type", "route__path")

  final case class UserContext(userId: String, roles: Set[String])

  /** MFA-aware role resolution (authz/__init__.py:470-478): with MFA all
    * of the user's roles apply; without, only roles whose definition has
    * `mfaRequired` false/absent. Role tables are admin-sized metadata —
    * driver materialization is the correct scale call here. */
  def rolesFor(userRoles: DataFrame, roles: DataFrame, userId: String,
      mfaEnabled: Boolean): Set[String] = {
    val own = userRoles.filter(col("userId") === userId).select("roleName")
    val eligible =
      if (mfaEnabled) own
      else own.join(
        roles.filter(!coalesce(col("mfaRequired"), lit(false)))
          .select("roleName"),
        Seq("roleName"), "left_semi")
    eligible.distinct().collect().map(_.getString(0)).toSet
  }

  private case class Permission(principal: String, isGroup: Boolean,
      permission: String, permissionType: String)

  /** Build the policy for one user + action over the constraints of one
    * object type. `fieldMap` rewrites criterion field names to the
    * governed table's columns (e.g. `databaseId` → `str_databaseid`);
    * identity by default. */
  def load(constraints: DataFrame, user: UserContext, action: String,
      objectType: String, fieldMap: String => String = identity): Abac.Policy = {
    implicit val formats: Formats = DefaultFormats
    // tolerate absent optional columns (e.g. tables predating the legacy
    // `criteria` field or without user permissions)
    val wanted = Seq("constraintId", "criteriaAnd", "criteriaOr", "criteria",
      "groupPermissions", "userPermissions")
    val present = constraints.columns.toSet
    val rows = constraints
      .filter(col("objectType") === objectType)
      .select(wanted.map(c =>
        if (present(c)) col(c) else lit(null).cast("string").as(c)): _*)
      .collect()

    // dedup denormalized copies by base constraintId (suffix stripped)
    def baseId(id: String): String =
      id.split("#group#")(0).split("#user#")(0)
    val unique: Seq[Row] = rows.groupBy(r => baseId(r.getString(0)))
      .toSeq.sortBy(_._1).map(_._2.head)

    def parseJson(s: String): JValue =
      if (s == null || s.trim.isEmpty) JNothing
      else try JsonMethods.parse(s) catch { case _: Throwable => JNothing }

    def criteriaOf(v: JValue): Seq[Abac.Criterion] = v match {
      case JArray(items) => items.flatMap(criterionOf)
      case o: JObject    => criterionOf(o).toSeq
      case _             => Nil
    }
    def criterionOf(v: JValue): Option[Abac.Criterion] = v match {
      case o: JObject =>
        val field = (o \ "field").extractOpt[String].getOrElse("")
        val op    = (o \ "operator").extractOpt[String].getOrElse("")
        val value = (o \ "value").extractOpt[String].getOrElse("")
        val values = (o \ "values") match {
          case JArray(vs) => vs.flatMap(_.extractOpt[String])
          case _          => Nil
        }
        // reference is_one_of takes a scalar `value` ('v' in r.obj.f);
        // normalize to the membership list form
        val vs = if (values.nonEmpty) values
          else if (op == "is_one_of" || op == "is_not_one_of") Seq(value)
          else Nil
        if (field.isEmpty || op.isEmpty) None
        else Some(Abac.Criterion(field, op, value, vs))
      case _ => None
    }

    def permissionsOf(v: JValue, isGroup: Boolean): Seq[Permission] = v match {
      case JArray(items) => items.flatMap {
        case o: JObject =>
          val principal =
            (o \ (if (isGroup) "groupId" else "userId")).extractOpt[String]
          val perm = (o \ "permission").extractOpt[String].getOrElse("")
          val ptype = (o \ "permissionType").extractOpt[String]
            .filter(_.nonEmpty).getOrElse("allow")
          principal.map(Permission(_, isGroup, perm, ptype))
        case _ => None
      }
      case _ => Nil
    }

    var allow = Vector.empty[Seq[Abac.Criterion]]
    var deny  = Vector.empty[Seq[Abac.Criterion]]
    unique.foreach { r =>
      def js(i: Int): JValue = parseJson(if (r.isNullAt(i)) null else r.getString(i))
      // unknown-field skip happens on the PRE-MAPPED name, like the
      // reference's PERMISSION_CONSTRAINT_FIELDS check; legacy
      // single-criterion `criteria` appends to criteriaAnd
      val andKept = (criteriaOf(js(1)) ++ criteriaOf(js(3)))
        .filter(c => ConstraintFields(c.field))
        .map(c => c.copy(field = fieldMap(c.field)))
      val orKept = criteriaOf(js(2))
        .filter(c => ConstraintFields(c.field))
        .map(c => c.copy(field = fieldMap(c.field)))
      val applicable =
        permissionsOf(js(4), isGroup = true)
          .filter(p => user.roles.contains(p.principal)) ++
        permissionsOf(js(5), isGroup = false)
          .filter(_.principal == user.userId)
      applicable.filter(_.permission == action).foreach { p =>
        val rules: Seq[Seq[Abac.Criterion]] =
          (if (andKept.nonEmpty) Seq(andKept) else Nil) ++
            orKept.map(Seq(_))
        if (p.permissionType == "deny") deny ++= rules else allow ++= rules
      }
    }
    Abac.Policy(allow, deny)
  }

  private final case class CachedPolicy(policy: Abac.Policy, atNanos: Long)
  private val policyCache =
    new java.util.concurrent.ConcurrentHashMap[String, CachedPolicy]()

  /** Per-user compiled-policy cache with TTL — the Spark twin of the
    * reference's `casbin_user_policy_map` + `_dateTime_Cached` 60-second
    * enforcer reuse (`authz/__init__.py:22,45-49,165-176`). Every
    * governed request re-deriving the policy from the constraints table
    * would put a metadata read on the hot path; a TTL bounds staleness
    * exactly like the reference's. Keyed by (user, roles, action,
    * objectType, fieldMap-image) — a role change takes effect at most
    * `ttl` late, same contract as the reference. The fieldMap term
    * matters when two governed tables share an objectType but map
    * criterion fields to different columns: without it one table could
    * be served the other's compiled predicate within the TTL. `fieldMap`
    * is only ever applied to [[ConstraintFields]] names (criteria are
    * filtered to that set before mapping), so its image over that set is
    * a complete fingerprint of its observable behavior. */
  def loadCached(constraints: DataFrame, user: UserContext, action: String,
      objectType: String, fieldMap: String => String = identity,
      ttl: java.time.Duration = java.time.Duration.ofSeconds(60)): Abac.Policy = {
    val mapSig = ConstraintFields.toSeq.sorted.map(fieldMap).mkString(",")
    val key = s"${user.userId}|${user.roles.toSeq.sorted.mkString(",")}|$action|$objectType|$mapSig"
    val now = System.nanoTime()
    val hit = policyCache.get(key)
    if (hit != null && now - hit.atNanos < ttl.toNanos) hit.policy
    else {
      val p = load(constraints, user, action, objectType, fieldMap)
      // bounded: sweep expired entries when the map grows past the cap
      // (a long-lived multi-tenant driver would otherwise accumulate one
      // entry per distinct principal/action forever)
      if (policyCache.size >= MaxCachedPolicies) {
        val it = policyCache.entrySet().iterator()
        while (it.hasNext) {
          if (now - it.next().getValue.atNanos >= ttl.toNanos) it.remove()
        }
        if (policyCache.size >= MaxCachedPolicies) {
          // all entries still live: evict the OLDEST half rather than
          // clearing — a full clear would stampede every active
          // principal onto the constraints table at once
          import scala.jdk.CollectionConverters._
          policyCache.entrySet().asScala.toSeq
            .sortBy(_.getValue.atNanos)
            .take(MaxCachedPolicies / 2)
            .foreach(e => policyCache.remove(e.getKey, e.getValue))
        }
      }
      policyCache.put(key, CachedPolicy(p, now))
      p
    }
  }

  /** Cap on cached per-user policies (sweep threshold, not a hard LRU —
    * policies are tiny; the cap only prevents unbounded principal
    * churn). */
  val MaxCachedPolicies = 10000

  /** Drop all cached policies (e.g. after a constraint-table write). */
  def invalidateCache(): Unit = policyCache.clear()

  /** API-LEVEL authorization (the reference's `enforceAPI`,
    * `authz/__init__.py:120-162`): before any query compiles or any
    * scan runs, the CALL itself must be allowed — the user's policy for
    * `objectType = "api"` is evaluated against the request object
    * `{object__type: "api", route__path: <path>}` with the HTTP method
    * as the action. This is a separate gate from row-level ABAC: a user
    * can hold row grants yet be denied the API route, and vice versa
    * (`search.py:1944-1951` returns 403 before building any query).
    *
    * `trustedCrossCall` mirrors the reference's lambda-cross-call
    * bypass: an already-authenticated internal caller is auto-approved
    * (`authz/__init__.py:124-133`). */
  def enforceApi(constraints: DataFrame, user: UserContext, method: String,
      routePath: String, trustedCrossCall: Boolean = false): Boolean =
    trustedCrossCall || Abac.evaluate(
      loadCached(constraints, user, method, "api"),
      Map("object__type" -> "api", "route__path" -> routePath))

  /** One-call wiring: load the user's policy from the constraints table
    * and govern `path` with it (auto-injected row security for every
    * subsequent read of that table). */
  def govern(path: String, constraints: DataFrame, user: UserContext,
      action: String, objectType: String,
      fieldMap: String => String = identity): Abac.Policy = {
    val p = load(constraints, user, action, objectType, fieldMap)
    graft.plans.AbacInjection.govern(path, p)
    p
  }
}
