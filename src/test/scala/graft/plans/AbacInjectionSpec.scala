package graft.plans

import org.apache.spark.sql.execution.FileSourceScanExec

import graft.SparkSpec
import graft.authz.Abac

/** The auto-injection rule: governed scans are row-filtered no matter
  * how they are reached, the predicate reaches the parquet reader, and
  * ungoverned tables are untouched.
  */
class AbacInjectionSpec extends SparkSpec {

  private val path = sf() + "/customer.parquet"
  private val policy = Abac.Policy(
    allow = Seq(Seq(Abac.Criterion("c_mktsegment", "is_one_of",
      values = Seq("BUILDING", "MACHINERY")))),
    deny = Seq(Seq(Abac.Criterion("c_name", "ends_with", "7"))))

  private def withGoverned[A](f: => A): A = {
    AbacInjection.install(spark)
    AbacInjection.govern(path, policy)
    try f finally AbacInjection.clear()
  }

  test("governed scan is filtered identically to explicit enforcement") {
    val expected = Abac.enforce(spark.read.parquet(path), policy).count()
    assert(expected > 0)
    withGoverned {
      assert(spark.read.parquet(path).count() === expected)
      // repeated runs stay stable (rule idempotent under fixed point)
      assert(spark.read.parquet(path).count() === expected)
    }
    // after clear(), governance is gone
    assert(spark.read.parquet(path).count() > expected)
  }

  test("policy applies even when its columns are pruned from the output") {
    val expected = Abac.enforce(spark.read.parquet(path), policy).count()
    withGoverned {
      val onlyKeys = spark.read.parquet(path).select("c_custkey")
      assert(onlyKeys.count() === expected)
    }
  }

  test("SQL over a governed view is filtered too") {
    val expected = Abac.enforce(spark.read.parquet(path), policy).count()
    withGoverned {
      spark.read.parquet(path).createOrReplaceTempView("governed_customer")
      val n = spark.sql("SELECT count(*) AS n FROM governed_customer")
        .collect()(0).getLong(0)
      assert(n === expected)
    }
  }

  test("predicate reaches the parquet scan (pushed data filters)") {
    withGoverned {
      val plan = spark.read.parquet(path).queryExecution.executedPlan
      val scans = plan.collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty)
      // is_one_of compiles to In/EqualTo — pushable; the scan must carry
      // data filters derived from the injected policy
      assert(scans.head.dataFilters.nonEmpty,
        s"no data filters on scan:\n$plan")
    }
  }

  test("nested governance: the most specific governed prefix wins, registration-order-free") {
    val parent = sf()
    val rootPolicy = Abac.Policy(
      allow = Seq(Seq(Abac.Criterion("c_mktsegment", "is_one_of",
        values = Seq("BUILDING")))),
      deny = Nil)
    val expectNested = Abac.enforce(spark.read.parquet(path), policy).count()
    val expectRoot = Abac.enforce(spark.read.parquet(path), rootPolicy).count()
    assert(expectNested != expectRoot) // non-vacuous: the policies differ
    AbacInjection.install(spark)
    try {
      AbacInjection.govern(parent, rootPolicy)
      AbacInjection.govern(path, policy)
      assert(spark.read.parquet(path).count() === expectNested)
      AbacInjection.clear()
      // reversed registration order must pick the same (longest) prefix —
      // map iteration order never decides which policy applies
      AbacInjection.govern(path, policy)
      AbacInjection.govern(parent, rootPolicy)
      assert(spark.read.parquet(path).count() === expectNested)
    } finally AbacInjection.clear()
  }

  test("ungoverned tables are untouched") {
    val other = sf() + "/nation.parquet"
    val base = spark.read.parquet(other).count()
    withGoverned {
      assert(spark.read.parquet(other).count() === base)
    }
  }

  test("scheme variants and file paths under a governed root are still governed") {
    val expected = Abac.enforce(spark.read.parquet(path), policy).count()
    withGoverned {
      // file:// scheme variant of the same root
      assert(spark.read.parquet("file://" + path).count() === expected)
      assert(spark.read.parquet("file:" + path).count() === expected)
    }
    // individual part-files under a governed DIRECTORY root: write a
    // multi-file copy, govern the dir, and read each part file directly
    val dir = java.nio.file.Files.createTempDirectory("graft-abac").toString
    spark.read.parquet(path).repartition(3).write.mode("overwrite").parquet(dir)
    AbacInjection.install(spark)
    AbacInjection.govern(dir, policy)
    try {
      val parts = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      assert(parts.length > 1)
      val n = parts.map(p => spark.read.parquet(p).count()).sum
      assert(n === expected, s"per-file reads bypassed the policy")
    } finally AbacInjection.clear()
  }

  test("normalize unifies file-scheme spellings and s3 flavors") {
    assert(AbacInjection.normalize("/a/b/") == AbacInjection.normalize("file:///a/b"))
    assert(AbacInjection.normalize("file:/a/b") == AbacInjection.normalize("file:///a/b/"))
    assert(AbacInjection.normalize("s3a://bkt/p") == AbacInjection.normalize("s3://bkt/p/"))
  }

  test("DSv2 file reads: filtered when policy columns survive, FAIL CLOSED when pruned") {
    val expected = Abac.enforce(spark.read.parquet(path), policy).count()
    val key = "spark.sql.sources.useV1SourceList"
    val prev = spark.conf.get(key)
    withGoverned {
      try {
        spark.conf.set(key, "") // force parquet through DataSourceV2Relation
        // policy columns in the scan output → governed result
        val kept = spark.read.parquet(path)
          .select("c_custkey", "c_mktsegment", "c_name").collect()
        assert(kept.length === expected)
        // count() prunes every column before the late rule runs — must
        // refuse rather than return unfiltered rows
        val err = intercept[Exception] { spark.read.parquet(path).count() }
        def rootMessages(t: Throwable): Seq[String] =
          Option(t).toSeq.flatMap(x =>
            Option(x.getMessage).toSeq ++ rootMessages(x.getCause))
        assert(rootMessages(err).exists(_.contains("cannot enforce its row policy")),
          err.toString)
      } finally spark.conf.set(key, prev)
    }
  }

  test("a governed TxLog table is row-filtered through TxLog.read, snapshots included") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // TxLog.read materializes the snapshot as a parquet read of the
    // committed files under the table root — a governed prefix must
    // therefore filter EVERY snapshot, time travel included, with no
    // TxLog-specific wiring
    val dir = java.nio.file.Files.createTempDirectory("graft-gov-tx").toString
    graft.sources.TxLog.merge(spark, dir,
      Seq(("dbA#a1", "dbA", "keep"), ("dbA#a2", "dbA", "secret"),
        ("dbB#b1", "dbB", "keep"))
        .toDF("_docId", "str_databaseid", "payload"))
    graft.sources.TxLog.merge(spark, dir,
      Seq(("dbB#b2", "dbB", "secret")).toDF("_docId", "str_databaseid", "payload"))
    val rowPolicy = Abac.Policy(allow = Seq(Seq(
      Abac.Criterion("payload", "equals", "keep"))))
    AbacInjection.install(spark)
    AbacInjection.govern(dir, rowPolicy)
    try {
      val ids = graft.sources.TxLog.read(spark, dir)
        .select("_docId").as[String].collect().toSet
      assert(ids == Set("dbA#a1", "dbB#b1"), ids.toString)
      // time travel to v0 is governed too (same file-prefix lookup)
      val v0 = graft.sources.TxLog.read(spark, dir, asOfVersion = Some(0L))
        .select("_docId").as[String].collect().toSet
      assert(v0 == Set("dbA#a1", "dbB#b1"), v0.toString)
    } finally AbacInjection.clear()
    // ungoverned again: all rows visible
    assert(graft.sources.TxLog.read(spark, dir).count() == 4L)
  }

  test("plans cached before govern() cannot serve unfiltered rows afterwards") {
    val df = spark.read.parquet(path)
    val all = df.count()
    df.cache()
    df.count() // materialize the unfiltered cache entry
    AbacInjection.install(spark)
    AbacInjection.govern(path, policy) // must drop the cached plan
    try {
      val expected = Abac.enforce(spark.read.parquet(path), policy).count()
      assert(expected < all)
      assert(spark.read.parquet(path).count() === expected,
        "cached unfiltered plan served a governed read")
    } finally AbacInjection.clear()
  }

  test("auto-injected predicates coerce literals like the analyzed path") {
    // c_custkey is BIGINT; a policy written with string values must
    // behave exactly as enforce() (where the analyzer inserts casts)
    val numPolicy = Abac.Policy(
      allow = Seq(Seq(Abac.Criterion("c_custkey", "is_one_of",
        values = Seq("1", "2", "3")))))
    val expected = Abac.enforce(spark.read.parquet(path), numPolicy).count()
    assert(expected > 0)
    AbacInjection.install(spark)
    AbacInjection.govern(path, numPolicy)
    try assert(spark.read.parquet(path).count() === expected)
    finally AbacInjection.clear()
  }
}
