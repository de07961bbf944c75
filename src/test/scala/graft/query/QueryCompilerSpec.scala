package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QueryCompilerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("a1", "red widget", "BUILDING", false),
    ("a2", "blue bolt", "MACHINERY", false),
    ("a3", "red gear", "BUILDING", true),
    ("a4", "green gizmo", "AUTOMOBILE", false))
    .toDF("id", "name", "segment", "archived")

  test("boolQuery composes must/mustNot/should like the reference") {
    val got = df.filter(QueryCompiler.boolQuery(
      must = Seq(col("archived") === false),
      mustNot = Seq(col("segment") === "AUTOMOBILE"),
      should = Seq(col("name").contains("red"), col("name").contains("bolt"))))
      .select("id").as[String].collect().sorted
    assert(got.toSeq == Seq("a1", "a2"))
  }

  test("wildcard translates * and ? and falls back to contains") {
    assert(df.filter(QueryCompiler.wildcard(col("name"), "r?d*")).count() == 2)
    assert(df.filter(QueryCompiler.wildcard(col("name"), "WIDGET")).count() == 1)
    // LIKE metachars in user input are escaped, not interpreted
    assert(df.filter(QueryCompiler.wildcard(col("name"), "%widget*")).count() == 0)
  }

  test("tokens: operators =, :, !=, !: with AND/OR") {
    val resolve: String => Seq[org.apache.spark.sql.Column] =
      { case "name" => Seq(col("name")); case "seg" => Seq(col("segment")) }
    val and = QueryCompiler.tokens(
      Seq(Token("name", ":", "red"), Token("seg", "!=", "BUILDING")), "AND", resolve)
    assert(df.filter(and).select("id").as[String].collect().isEmpty)
    val or = QueryCompiler.tokens(
      Seq(Token("name", "=", "blue bolt"), Token("seg", ":", "AUTO")), "OR", resolve)
    assert(df.filter(or).count() == 2)
  }

  test("accessibleDatabases: empty set matches nothing, None unrestricted") {
    assert(df.filter(QueryCompiler.accessibleDatabases(col("segment"),
      Some(Nil))).count() == 0)
    assert(df.filter(QueryCompiler.accessibleDatabases(col("segment"),
      None)).count() == 4)
  }

  test("paginate enforces the reference bounds (from+size<=10000, size<=2000)") {
    intercept[IllegalArgumentException] {
      QueryCompiler.paginate(df, from = 9000, size = 1500)
    }
    intercept[IllegalArgumentException] {
      QueryCompiler.paginate(df, from = 0, size = 2001)
    }
    assert(QueryCompiler.paginate(df.orderBy("id"), 1, 2)
      .select("id").as[String].collect().toSeq == Seq("a2", "a3"))
  }

  test("score weights matches and highlight tags them") {
    val s = QueryCompiler.score(Seq(col("name") -> 3.0, col("segment") -> 1.0), "red")
    val scores = df.orderBy("id").select(s).as[Double].collect().toSeq
    assert(scores == Seq(3.0, 0.0, 3.0, 0.0))
    val h = df.filter(col("id") === "a1")
      .select(QueryCompiler.highlight(col("name"), "red")).as[String].head()
    assert(h == "[red] widget")
  }

  test("facet caps buckets and orders count-desc with key tiebreak") {
    val f = QueryCompiler.facet(df, col("segment"), cap = 2)
      .as[(String, Long)].collect().toSeq
    assert(f == Seq(("BUILDING", 2L), ("AUTOMOBILE", 1L)))
  }
}
