package graft.authz

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-trips reference-shaped constraint records (the denormalized
  * constraints table of authz/__init__.py:197-276) into the same
  * predicates `f11_abac` uses. */
class PolicyLoaderSpec extends SparkSpec {
  import spark.implicits._

  private val constraintCols = Seq("constraintId", "objectType",
    "criteriaAnd", "criteriaOr", "criteria", "groupPermissions",
    "userPermissions")

  private def constraintsDf(rows: (String, String, String, String, String, String, String)*) =
    rows.toSeq.toDF(constraintCols: _*)

  // a miniature governed table: databaseId scalar + tags array
  private lazy val docs = Seq(
    ("db1", "alpha", Seq("red", "blue")),
    ("db1", "beta", Seq("green")),
    ("db2", "gamma", Seq("red")),
    ("db3", "delta", Seq[String]()))
    .toDF("databaseId", "assetName", "tags")

  test("group + user permissions, suffix dedup, allow/deny effect") {
    val c = constraintsDf(
      // denormalized twice (group + user suffix) — must count once
      ("c1#group#editors", "asset",
        """[{"field":"databaseId","operator":"equals","value":"db1"}]""",
        null, null,
        """[{"groupId":"editors","permission":"GET","permissionType":"allow"}]""",
        """[]"""),
      ("c1#user#u1", "asset",
        """[{"field":"databaseId","operator":"equals","value":"db1"}]""",
        null, null,
        """[{"groupId":"editors","permission":"GET","permissionType":"allow"}]""",
        """[]"""),
      // user-direct allow on db2
      ("c2#user#u1", "asset", null,
        """[{"field":"databaseId","operator":"equals","value":"db2"}]""",
        null, """[]""",
        """[{"userId":"u1","permission":"GET","permissionType":"allow"}]"""),
      // deny rule: tag red is forbidden (deny dominates)
      ("c3#group#editors", "asset",
        """[{"field":"tags","operator":"is_one_of","value":"red"}]""",
        null, null,
        """[{"groupId":"editors","permission":"GET","permissionType":"deny"}]""",
        """[]"""))
    val user = PolicyLoader.UserContext("u1", Set("editors"))
    val p = PolicyLoader.load(c, user, "GET", "asset")
    assert(p.allow.size == 2 && p.deny.size == 1, p.toString)
    val got = Abac.enforce(docs, p).select("assetName").as[String].collect().toSet
    // db1 allowed (c1), db2 allowed (c2), minus anything tagged red (c3)
    assert(got == Set("beta"))
  }

  test("criteriaAnd is conjunctive; criteriaOr fans out; legacy criteria appends") {
    val c = constraintsDf(
      ("c1", "asset",
        """[{"field":"databaseId","operator":"equals","value":"db1"}]""",
        null,
        """{"field":"assetName","operator":"starts_with","value":"a"}""",
        """[{"groupId":"g","permission":"GET","permissionType":"allow"}]""",
        null),
      ("c2", "asset", null,
        """[{"field":"assetName","operator":"equals","value":"gamma"},
           {"field":"assetName","operator":"equals","value":"delta"}]""",
        null,
        """[{"groupId":"g","permission":"GET","permissionType":"allow"}]""",
        null))
    val p = PolicyLoader.load(c, PolicyLoader.UserContext("u", Set("g")), "GET", "asset")
    // c1: one AND rule (databaseId=db1 ∧ assetName startswith a);
    // c2: two OR-fanned single-criterion rules
    assert(p.allow.toSet == Set(
      Seq(Abac.Criterion("databaseId", "equals", "db1"),
        Abac.Criterion("assetName", "starts_with", "a")),
      Seq(Abac.Criterion("assetName", "equals", "gamma")),
      Seq(Abac.Criterion("assetName", "equals", "delta"))))
    val got = Abac.enforce(docs, p).select("assetName").as[String].collect().toSet
    assert(got == Set("alpha", "gamma", "delta"))
  }

  test("non-matching action / objectType / principal grant nothing; unknown fields skipped") {
    val c = constraintsDf(
      ("c1", "asset",
        """[{"field":"databaseId","operator":"equals","value":"db1"}]""",
        null, null,
        """[{"groupId":"other","permission":"GET"},
           {"groupId":"g","permission":"PUT"}]""", null),
      ("c2", "pipeline",
        """[{"field":"databaseId","operator":"equals","value":"db1"}]""",
        null, null,
        """[{"groupId":"g","permission":"GET"}]""", null),
      // unknown field skipped INSIDE the rule; the known one remains
      ("c3", "asset",
        """[{"field":"notAField","operator":"equals","value":"x"},
           {"field":"databaseId","operator":"equals","value":"db3"}]""",
        null, null,
        """[{"groupId":"g","permission":"GET"}]""", null),
      // rule whose every criterion is unknown emits nothing
      ("c4", "asset",
        """[{"field":"notAField","operator":"equals","value":"x"}]""",
        null, null,
        """[{"groupId":"g","permission":"GET"}]""", null))
    val p = PolicyLoader.load(c, PolicyLoader.UserContext("u", Set("g")), "GET", "asset")
    assert(p.allow == Seq(Seq(Abac.Criterion("databaseId", "equals", "db3"))))
    assert(p.deny.isEmpty)
  }

  test("constraint with no criteria grants nothing (reference emits no line)") {
    val c = constraintsDf(
      ("c1", "asset", null, null, null,
        """[{"groupId":"g","permission":"GET"}]""", null))
    val p = PolicyLoader.load(c, PolicyLoader.UserContext("u", Set("g")), "GET", "asset")
    assert(p.allow.isEmpty && p.deny.isEmpty)
    // and some(allow)=false ⇒ no rows
    assert(Abac.enforce(docs, p).count() == 0)
  }

  test("MFA role gating: without MFA only mfaRequired=false/absent roles apply") {
    val userRoles = Seq(("u1", "admins"), ("u1", "viewers"))
      .toDF("userId", "roleName")
    val roles = Seq(("admins", Some(true)), ("viewers", Some(false)), ("ghosts", None))
      .toDF("roleName", "mfaRequired")
    assert(PolicyLoader.rolesFor(userRoles, roles, "u1", mfaEnabled = true) ==
      Set("admins", "viewers"))
    assert(PolicyLoader.rolesFor(userRoles, roles, "u1", mfaEnabled = false) ==
      Set("viewers"))
  }

  test("field mapping rewrites criterion fields to governed-table columns") {
    val c = constraintsDf(
      ("c1", "asset",
        """[{"field":"databaseId","operator":"equals","value":"db1"}]""",
        null, null,
        """[{"groupId":"g","permission":"GET"}]""", null))
    val mapped = PolicyLoader.load(c, PolicyLoader.UserContext("u", Set("g")),
      "GET", "asset", Map("databaseId" -> "str_databaseid").withDefault(identity))
    assert(mapped.allow == Seq(Seq(Abac.Criterion("str_databaseid", "equals", "db1"))))
  }

  test("loadCached serves within TTL without re-reading; invalidate forces reload") {
    PolicyLoader.invalidateCache()
    val user = PolicyLoader.UserContext("u", Set("g"))
    val c1 = constraintsDf(
      ("c1", "asset",
        """[{"field":"databaseId","operator":"equals","value":"db1"}]""",
        null, null, """[{"groupId":"g","permission":"GET"}]""", null))
    val p1 = PolicyLoader.loadCached(c1, user, "GET", "asset")
    assert(p1.allow == Seq(Seq(Abac.Criterion("databaseId", "equals", "db1"))))
    // a DIFFERENT constraints table within TTL still returns the cached
    // policy (staleness bounded by ttl, like the reference's 60 s map)
    val c2 = constraintsDf(
      ("c1", "asset",
        """[{"field":"databaseId","operator":"equals","value":"db2"}]""",
        null, null, """[{"groupId":"g","permission":"GET"}]""", null))
    assert(PolicyLoader.loadCached(c2, user, "GET", "asset") == p1)
    PolicyLoader.invalidateCache()
    val p2 = PolicyLoader.loadCached(c2, user, "GET", "asset")
    assert(p2.allow == Seq(Seq(Abac.Criterion("databaseId", "equals", "db2"))))
    // zero TTL bypasses the cache entirely
    assert(PolicyLoader.loadCached(c1, user, "GET", "asset",
      ttl = java.time.Duration.ZERO) == p1)
  }

  test("loadCached key includes the fieldMap: tables sharing an objectType never swap policies") {
    PolicyLoader.invalidateCache()
    val user = PolicyLoader.UserContext("u", Set("g"))
    val c = constraintsDf(
      ("c1", "asset",
        """[{"field":"databaseId","operator":"equals","value":"db1"}]""",
        null, null, """[{"groupId":"g","permission":"GET"}]""", null))
    val pA = PolicyLoader.loadCached(c, user, "GET", "asset")
    assert(pA.allow == Seq(Seq(Abac.Criterion("databaseId", "equals", "db1"))))
    // same (user, roles, action, objectType) but a different column
    // mapping must compile its own policy within the TTL — not be handed
    // the identity-mapped table's predicate (whose field name could
    // happen to exist on this table and silently filter the wrong column)
    val pB = PolicyLoader.loadCached(c, user, "GET", "asset",
      Map("databaseId" -> "str_databaseid").withDefault(identity))
    assert(pB.allow == Seq(Seq(Abac.Criterion("str_databaseid", "equals", "db1"))))
    // and the identity-mapped entry is still cached, unchanged
    assert(PolicyLoader.loadCached(c, user, "GET", "asset") == pA)
  }

  test("loader wires into auto-injection: governed reads are filtered") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pl").toString
    docs.write.mode("overwrite").parquet(dir)
    val c = constraintsDf(
      ("c1", "asset",
        """[{"field":"databaseId","operator":"equals","value":"db1"}]""",
        null, null,
        """[{"groupId":"g","permission":"GET"}]""", null))
    graft.plans.AbacInjection.install(spark)
    PolicyLoader.govern(dir, c, PolicyLoader.UserContext("u", Set("g")),
      "GET", "asset")
    try {
      val got = spark.read.parquet(dir).select("assetName").as[String]
        .collect().toSet
      assert(got == Set("alpha", "beta"))
    } finally graft.plans.AbacInjection.ungovern(dir)
  }
}
