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

  test("ungoverned tables are untouched") {
    val other = sf() + "/nation.parquet"
    val base = spark.read.parquet(other).count()
    withGoverned {
      assert(spark.read.parquet(other).count() === base)
    }
  }
}
