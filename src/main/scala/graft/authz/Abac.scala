package graft.authz

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** F11 — ABAC policy → pushed-down row predicate.
  *
  * Reference: Casbin criteria compiled to regex rules
  * (`backend/backend/handlers/authz/__init__.py:387-423`, model
  * `backend/backend/common/constants.py:116-131`), evaluated per row AFTER
  * retrieval (`handlers/search/search.py:1711-1737`). We compile the same
  * criteria into a Catalyst `Column` so the filter is part of the scan —
  * a deliberate improvement: at 100 TB a post-filter means shipping
  * unauthorized rows out of the store; a pushed predicate means they are
  * skipped inside the columnar scan (and row groups pruned where stats
  * allow).
  *
  * Effect resolution (constants.py:127): `some(allow) && !some(deny)` —
  * deny dominates; no applicable allow rule ⇒ no access.
  */
object Abac {

  /** One criterion (authz/__init__.py:387-423). `values` used by
    * is_one_of / is_not_one_of; `value` by the scalar operators. */
  final case class Criterion(
      field: String,
      operator: String,
      value: String = "",
      values: Seq[String] = Nil)

  /** A rule is a conjunction of criteria (criteriaAnd); a policy is a
    * disjunction of allow rules and a disjunction of deny rules. */
  final case class Policy(
      allow: Seq[Seq[Criterion]],
      deny: Seq[Seq[Criterion]] = Nil)

  /** Compile one criterion against a schema-aware field resolver.
    * Array-typed columns get membership semantics for is_one_of
    * (reference: tag criteria hit `list_tags`). */
  def criterion(df: DataFrame, c: Criterion): Column =
    criterionOf(df.schema, df.col(c.field), c)

  /** Schema-based variant — used by the auto-injection rule where there
    * is no DataFrame, only a logical relation's schema; `col0` may be an
    * unresolved column (resolved later against the relation output). */
  def criterionOf(schema: StructType, col0: Column, c: Criterion): Column = {
    val isArray = schema.fields
      .find(_.name == c.field).exists(_.dataType.isInstanceOf[ArrayType])
    c.operator match {
      case "equals"           => col0 === lit(c.value)
      case "contains"         => col0.contains(c.value)
      case "does_not_contain" => !col0.contains(c.value)
      case "starts_with"      => col0.startsWith(c.value)
      case "ends_with"        => col0.endsWith(c.value)
      case "is_one_of" =>
        if (isArray) arrays_overlap(col0, typedLit(c.values))
        else col0.isInCollection(c.values)
      case "is_not_one_of" =>
        if (isArray) !arrays_overlap(col0, typedLit(c.values))
        else !col0.isInCollection(c.values)
      case op => throw new IllegalArgumentException(s"unknown criterion op $op")
    }
  }

  /** Compile a full policy to a single row predicate. */
  def compile(df: DataFrame, p: Policy): Column =
    compileOf(df.schema, n => df.col(n), p)

  /** Schema-based policy compile with a caller-supplied column resolver
    * (for DataFrames: `df.col`; for logical plans: `functions.col`,
    * resolved against the relation output by the injection rule). */
  def compileOf(schema: StructType, resolve: String => Column, p: Policy): Column = {
    def ruleSet(rules: Seq[Seq[Criterion]]): Option[Column] =
      if (rules.isEmpty) None
      else Some(rules.map(r =>
        r.map(c => criterionOf(schema, resolve(c.field), c)).reduce(_ && _))
        .reduce(_ || _))
    val allow = ruleSet(p.allow).getOrElse(lit(false)) // no allow rule ⇒ deny
    val deny  = ruleSet(p.deny).getOrElse(lit(false))
    // NULL-field semantics (three-valued-logic hazard, found by
    // AbacPropertySpec): a criterion over a NULL attribute is SQL NULL.
    // Through the AND/OR algebra and the final filter, NULL is
    // conservatively false — matching the reference, whose Casbin
    // matcher treats a missing attribute as matching NOTHING (even for
    // the negated operators). The ONE place that breaks is the deny
    // negation: `allow && !NULL` is NULL, silently DROPPING rows the
    // reference allows (a deny rule on a missing field must deny
    // nothing). Coalesce exactly there — the allow side stays raw, so
    // its pushable conjuncts still reach the parquet scan.
    allow && !coalesce(deny, lit(false))
  }

  /** Apply as a pushed-down filter. */
  def enforce(df: DataFrame, p: Policy): DataFrame = df.filter(compile(df, p))

  // ── Driver-side scalar evaluation (API-level authorization) ────────

  /** Evaluate one criterion against an in-memory attribute map — the
    * driver-side twin of [[criterionOf]], used where the "row" is a
    * request object (`{object__type, route__path}`), not table data.
    * A missing field matches nothing, like the reference's Casbin
    * matcher on an absent object attribute: an allow rule on a missing
    * field grants nothing, a deny rule on one denies nothing. */
  def evalCriterion(obj: Map[String, String], c: Criterion): Boolean =
    obj.get(c.field) match {
      case None => false
      case Some(v) => c.operator match {
        case "equals"           => v == c.value
        case "contains"         => v.contains(c.value)
        case "does_not_contain" => !v.contains(c.value)
        case "starts_with"      => v.startsWith(c.value)
        case "ends_with"        => v.endsWith(c.value)
        case "is_one_of"        => c.values.contains(v)
        case "is_not_one_of"    => !c.values.contains(v)
        case op => throw new IllegalArgumentException(s"unknown criterion op $op")
      }
    }

  /** Scalar policy decision with the same effect resolution as
    * [[compile]]: `some(allow) && !some(deny)`; an empty allow set
    * denies. */
  def evaluate(p: Policy, obj: Map[String, String]): Boolean = {
    def matches(rules: Seq[Seq[Criterion]]): Boolean =
      rules.exists(r => r.nonEmpty && r.forall(evalCriterion(obj, _)))
    matches(p.allow) && !matches(p.deny)
  }

  // ── Catalyst-Expression compiler (used by the auto-injection rule,
  // where the predicate must drop into an already-analyzed plan — the
  // Column DSL builds name-resolved UnresolvedFunctions, which never
  // pass through the analyzer inside an optimizer rule).

  import org.apache.spark.sql.catalyst.expressions.{
    And, ArraysOverlap, Cast, Coalesce, Contains, CreateArray, EndsWith,
    EqualTo, Expression, In, Literal, Not, Or, StartsWith}
  import org.apache.spark.sql.types.{DataType, StringType}

  /** One criterion as a Catalyst Expression over a resolved attribute.
    *
    * This runs INSIDE an optimizer rule, i.e. after analysis — no
    * implicit type coercion will ever be applied to what it builds. So
    * it performs the same casts the analyzer would have inserted on the
    * `enforce()` path: comparison literals cast to the attribute's type
    * (equals / is_one_of on non-string columns), the attribute cast to
    * string for the substring operators — keeping auto-injection
    * behaviorally identical to the analyzed Column path. */
  def criterionExpr(schema: StructType, attr: Expression, c: Criterion): Expression = {
    val fieldType: Option[DataType] =
      schema.fields.find(_.name == c.field).map(_.dataType)
    val isArray = fieldType.exists(_.isInstanceOf[ArrayType])
    val elemType: DataType = fieldType match {
      case Some(ArrayType(et, _)) => et
      case Some(dt)               => dt
      case None                   => StringType
    }
    // no analyzer runs after an optimizer rule, so the cast must carry
    // its timezone itself (string↔date/timestamp casts need one)
    val tz = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    def l(s: String): Expression =
      if (elemType == StringType) Literal(s) else Cast(Literal(s), elemType, tz)
    def str(e: Expression): Expression =
      if (fieldType.contains(StringType)) e else Cast(e, StringType, tz)
    c.operator match {
      case "equals"           => EqualTo(attr, l(c.value))
      case "contains"         => Contains(str(attr), Literal(c.value))
      case "does_not_contain" => Not(Contains(str(attr), Literal(c.value)))
      case "starts_with"      => StartsWith(str(attr), Literal(c.value))
      case "ends_with"        => EndsWith(str(attr), Literal(c.value))
      case "is_one_of" =>
        if (isArray) ArraysOverlap(attr, CreateArray(c.values.map(l)))
        else In(attr, c.values.map(l))
      case "is_not_one_of" =>
        if (isArray) Not(ArraysOverlap(attr, CreateArray(c.values.map(l))))
        else Not(In(attr, c.values.map(l)))
      case op => throw new IllegalArgumentException(s"unknown criterion op $op")
    }
  }

  /** Full policy as a Catalyst Expression; `resolve` maps a field name
    * to the target relation's attribute. Same effect resolution as
    * [[compile]]: some(allow) && !some(deny). */
  def compileExpr(schema: StructType, resolve: String => Expression,
      p: Policy): Expression = {
    def ruleSet(rules: Seq[Seq[Criterion]]): Option[Expression] =
      if (rules.isEmpty) None
      else Some(rules.map(r =>
        r.map(c => criterionExpr(schema, resolve(c.field), c))
          .reduce(And(_, _))).reduce(Or(_, _)))
    val allow = ruleSet(p.allow).getOrElse(Literal(false))
    // deny-side NULL coalescing, same rationale as [[compileOf]] — the
    // injected predicate must not flip rows relative to enforce()
    val deny  = ruleSet(p.deny).getOrElse(Literal(false))
    And(allow, Not(Coalesce(Seq(deny, Literal(false)))))
  }
}
