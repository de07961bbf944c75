package graft.graph

import graft.SparkSpec

class TraversalSpec extends SparkSpec {
  import spark.implicits._

  test("cycle A->B->C->A terminates with per-branch cycle detection") {
    val edges = Seq(("A", "B"), ("B", "C"), ("C", "A"))
      .toDF("parent", "child")
    val got = Traversal.descendants(edges, "A", maxDepth = 10)
      .select("path").as[String].collect().sorted
    assert(got.toSeq == Seq("A", "A/B", "A/B/C"))
  }

  test("diamond: shared grandchild reached via both branches") {
    val edges = Seq(("A", "B"), ("A", "C"), ("B", "D"), ("C", "D"))
      .toDF("parent", "child")
    val got = Traversal.descendants(edges, "A", maxDepth = 10)
      .select("path").as[String].collect().sorted
    assert(got.toSeq == Seq("A", "A/B", "A/B/D", "A/C", "A/C/D"))
  }

  test("prefix node names don't false-positive the cycle check (n1 vs n12)") {
    val edges = Seq(("n1", "n12"), ("n12", "n1x"), ("n1x", "n1"))
      .toDF("parent", "child")
    val got = Traversal.descendants(edges, "n1", maxDepth = 10)
      .select("path").as[String].collect().sorted
    assert(got.toSeq == Seq("n1", "n1/n12", "n1/n12/n1x"))
  }

  test("maxDepth bounds expansion") {
    val edges = Seq(("A", "B"), ("B", "C"), ("C", "D")).toDF("parent", "child")
    val got = Traversal.descendants(edges, "A", maxDepth = 2)
      .select("node").as[String].collect().sorted
    assert(got.toSeq == Seq("A", "B", "C"))
  }
}
