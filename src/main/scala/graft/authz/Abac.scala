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
  def criterion(df: DataFrame, c: Criterion): Column = {
    val col0 = df.col(c.field)
    val isArray = df.schema.fields
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
  def compile(df: DataFrame, p: Policy): Column = {
    def ruleSet(rules: Seq[Seq[Criterion]]): Option[Column] =
      if (rules.isEmpty) None
      else Some(rules.map(r => r.map(criterion(df, _)).reduce(_ && _)).reduce(_ || _))
    val allow = ruleSet(p.allow).getOrElse(lit(false)) // no allow rule ⇒ deny
    val deny  = ruleSet(p.deny).getOrElse(lit(false))
    allow && !deny
  }

  /** Apply as a pushed-down filter. */
  def enforce(df: DataFrame, p: Policy): DataFrame = df.filter(compile(df, p))
}
