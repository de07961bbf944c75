package graft.authz

import graft.SparkSpec

class AbacSpec extends SparkSpec {
  import spark.implicits._
  import Abac._

  private lazy val df = Seq(
    ("a1", "dbA", "secret-project", Seq("prod", "red")),
    ("a2", "dbA", "open-data", Seq("dev")),
    ("a3", "dbB", "open-notes", Seq("prod")),
    ("a4", "dbC", "misc", Seq.empty[String]))
    .toDF("id", "databaseId", "name", "tags")

  test("deny dominates allow (constants.py:127 effect resolution)") {
    val p = Policy(
      allow = Seq(Seq(Criterion("databaseId", "is_one_of",
        values = Seq("dbA", "dbB")))),
      deny = Seq(Seq(Criterion("name", "starts_with", "secret"))))
    val got = Abac.enforce(df, p).select("id").as[String].collect().sorted
    assert(got.toSeq == Seq("a2", "a3"))
  }

  test("no applicable allow rule means no access") {
    val p = Policy(allow = Nil)
    assert(Abac.enforce(df, p).count() == 0)
  }

  test("is_one_of on an array column is membership (tag criteria)") {
    val p = Policy(allow = Seq(Seq(
      Criterion("tags", "is_one_of", values = Seq("prod")))))
    val got = Abac.enforce(df, p).select("id").as[String].collect().sorted
    assert(got.toSeq == Seq("a1", "a3"))
  }

  test("criteria within a rule AND together; rules OR together") {
    val p = Policy(allow = Seq(
      Seq(Criterion("databaseId", "equals", "dbA"),
        Criterion("name", "contains", "open")),
      Seq(Criterion("databaseId", "equals", "dbC"))))
    val got = Abac.enforce(df, p).select("id").as[String].collect().sorted
    assert(got.toSeq == Seq("a2", "a4"))
  }

  test("scalar operators: contains / does_not_contain / ends_with") {
    val p = Policy(allow = Seq(Seq(
      Criterion("name", "does_not_contain", "secret"),
      Criterion("name", "ends_with", "s"))))
    assert(Abac.enforce(df, p).select("id").as[String].collect().toSeq ==
      Seq("a3"))
  }
}
