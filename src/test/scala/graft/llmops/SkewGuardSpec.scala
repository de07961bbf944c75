package graft.llmops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewGuardSpec extends SparkSpec {
  import spark.implicits._

  test("small cells emit exactly the all-pairs set (semantics unchanged)") {
    val items = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), // cell 1: 3 members
      (2L, 20L), (2L, 21L), // cell 2: 2 members
      (3L, 30L)) // singleton: no pairs
      .toDF("cell", "id")
    val got = SkewGuard.cellPairs(items, Seq("cell"), "id", maxCell = 1024)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L)))
  }

  test("an oversized cell emits a star on its minimum id, not k² pairs") {
    val big = (0 until 500).map(i => (7L, 1000L + i))
    val small = Seq((8L, 1L), (8L, 2L))
    val items = (big ++ small).toDF("cell", "id")
    val got = SkewGuard.cellPairs(items, Seq("cell"), "id", maxCell = 100)
      .as[(Long, Long)].collect().toSet
    val star = (1 until 500).map(i => (1000L, 1000L + i)).toSet
    assert(got == star + ((1L, 2L)))
  }

  test("adversarial 10k-duplicate vector: collision pairs stay linear and keep the cluster connected") {
    graft.functions.GraftFunctions.register(spark)
    // one embedding duplicated 10,000× plus a handful of distinct vectors:
    // without the guard this is 10 band tables × 10k²/2 ≈ 5·10⁸ pair rows
    val dupVec = Array.tabulate(64)(i => math.sin(i + 1).abs + 0.1)
    val dup = spark.range(0, 10000).select(col("id").as("vec_id"),
      typedLit(dupVec.toSeq).as("e"))
    val distinctVecs = (0 until 20).map { v =>
      (100000L + v, Array.tabulate(64)(i => ((v * 37 + i * 13) % 101) / 101.0 - 0.5).toSeq)
    }.toDF("vec_id", "e")
    val pairs = Similarity.lshCollisionPairs(dup.unionByName(distinctVecs))
      .persist()
    val n = pairs.count()
    // linear in the cluster, not quadratic: the 10k-cell contributes
    // 9,999 star edges (same rep in every table), plus whatever the 20
    // distinct vectors collide into — nowhere near the ~5·10⁸ of all-pairs
    assert(n < 15000L, s"pair explosion: $n rows")
    // every duplicate is linked to the representative (vec_id 0), so
    // connected-components collapses the whole cluster exactly as
    // all-pairs would
    val linked = pairs.filter(col("keep_id") === 0L)
      .select("dup_id").as[Long].collect().toSet
    assert((1L until 10000L).forall(linked), "star lost a duplicate")
    pairs.unpersist()
  }

  test("lshTopK caps an oversized bucket but still answers with its members") {
    graft.functions.GraftFunctions.register(spark)
    val dupVec = Array.tabulate(64)(i => math.cos(i + 2).abs + 0.1).toSeq
    val cands = spark.range(0, 5000).select(col("id").as("vec_id"),
      typedLit(dupVec).as("embedding"))
    val queries = Seq((999999L, dupVec)).toDF("vec_id", "embedding")
    val topk = Similarity.lshTopK(queries, cands, k = 5, maxCell = 100)
      .collect()
    assert(topk.length == 5)
    // capped candidates are the bucket's first members by id — all
    // identical to the query here, so sim is 1.0 for every answer
    assert(topk.forall(r => math.abs(r.getAs[Double]("sim") - 1.0) < 1e-9))
  }

  test("carryCols equals the join-back path on randomized cells (incl. over-cap)") {
    // seeded random items over few cells so some exceed the cap; the
    // carried payload must reproduce exactly what joining the payload
    // table back onto the id pairs produces
    val rnd = new scala.util.Random(42)
    val items = (1 to 400).map { i =>
      (i.toLong, rnd.nextInt(6), rnd.nextInt(3), i * 7 % 101, i * 13 % 97)
    }.toDF("id", "cell_a", "cell_b", "p1", "p2")
    val cap = 20
    val viaCarry = SkewGuard
      .cellPairs(items, Seq("cell_a", "cell_b"), "id", maxCell = cap,
        carryCols = Seq("p1", "p2"))
      .dropDuplicates("a_id", "b_id")
      .as[(Long, Long, Int, Int, Int, Int)].collect().toSet
    val ids = SkewGuard
      .cellPairs(items, Seq("cell_a", "cell_b"), "id", maxCell = cap)
      .distinct()
    val pay = items.select("id", "p1", "p2")
    val viaJoin = ids
      .join(pay.select(col("id").as("a_id"), col("p1").as("a_p1"),
        col("p2").as("a_p2")), "a_id")
      .join(pay.select(col("id").as("b_id"), col("p1").as("b_p1"),
        col("p2").as("b_p2")), "b_id")
      .select("a_id", "b_id", "a_p1", "b_p1", "a_p2", "b_p2")
      .as[(Long, Long, Int, Int, Int, Int)].collect().toSet
    assert(viaCarry.nonEmpty && viaCarry == viaJoin)
    // sanity: the random layout actually exercised the star branch
    val oversized = items.groupBy("cell_a", "cell_b").count()
      .filter(col("count") > cap).count()
    assert(oversized > 0, "no over-cap cell — raise n or lower cap")
  }

  test("oracle SQL twin encodes the identical cap contract (DuckDB-checked offline)") {
    // the fragment must reference the shared constant, not a drifted copy
    val fragment = SkewGuard.oracleCandSql("src", Seq("t", "b"), "id", "a_id", "b_id")
    assert(fragment.contains(s"<= ${SkewGuard.MaxCellSize}"))
    assert(fragment.contains(s"> ${SkewGuard.MaxCellSize}"))
    assert(fragment.contains("_rn = 1 AND b._rn > 1"))
  }

  test("shuffle-partition width parse falls back on non-numeric values") {
    // a deployment may set shuffle.partitions to something the planner
    // resolves but .toInt does not (r14 advice): the explicit
    // repartition must fall back to the cluster default, not throw
    assert(SkewGuard.parseWidth("32", 8) == 32)
    assert(SkewGuard.parseWidth(" 200 ", 8) == 200)
    assert(SkewGuard.parseWidth("auto", 8) == 8)
    assert(SkewGuard.parseWidth("", 8) == 8)
    assert(SkewGuard.parseWidth("-1", 8) == 8)
  }

  test("float/binary cell keys are refused up front (boxed != diverges from ===)") {
    // the per-partition pass compares keys with boxed equality; for
    // DOUBLE (-0.0 vs 0.0, NaN) and BINARY (Array reference equality)
    // that silently diverges from the join form's === — the guard must
    // refuse rather than emit wrong pairs
    val floats = Seq((0.0d, 1L), (-0.0d, 2L)).toDF("cell", "id")
    val e1 = intercept[IllegalArgumentException] {
      SkewGuard.cellPairs(floats, Seq("cell"), "id")
    }
    assert(e1.getMessage.contains("boxed equality"))
    val bins = Seq((Array[Byte](1, 2), 1L)).toDF("cell", "id")
    val e2 = intercept[IllegalArgumentException] {
      SkewGuard.cellPairs(bins, Seq("cell"), "id")
    }
    assert(e2.getMessage.contains("cell"))
    // long keys (every production caller hashes to LONG) still pass
    val ok = SkewGuard.cellPairs(
      Seq((1L, 1L), (1L, 2L)).toDF("cell", "id"), Seq("cell"), "id")
    assert(ok.as[(Long, Long)].collect().toSet == Set((1L, 2L)))
  }
}
