package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.SparkSpec

/** The memo layer's contracts: one analyzed frame per (session, key),
  * transparent re-persist after an external cache clear, epoch
  * invalidation for results the CacheManager cannot see, and safety of
  * memoized builds that derive other memoized frames. */
class CachingSpec extends SparkSpec {
  import spark.implicits._

  private def uniq(prefix: String) =
    s"$prefix-${java.util.UUID.randomUUID().toString.take(8)}"

  test("memoDf returns one analyzed frame per key and re-persists after clearCache") {
    val key = uniq("spec-memo")
    var builds = 0
    def get() = Caching.memoDf(spark, key) {
      builds += 1
      Seq(1, 2, 3).toDF("x").groupBy().agg(sum("x").as("s"))
    }
    val a = get(); val b = get()
    assert(a eq b, "same key must return the same Dataset object")
    assert(builds == 1)
    a.count()
    assert(a.storageLevel != StorageLevel.NONE)
    // an external unpersist (what a cache clear does to this entry)
    // drops the persist; the next ACCESS re-marks it without
    // rebuilding the plan. Targeted unpersist, not clearCache: suites
    // share one session and run in parallel.
    a.unpersist()
    assert(a.storageLevel == StorageLevel.NONE)
    val c = get()
    assert((c eq a) && builds == 1)
    assert(c.storageLevel != StorageLevel.NONE)
    assert(c.as[Long].head() == 6L)
  }

  test("memoDf eager=true materializes once per cache generation") {
    val key = uniq("spec-eager")
    def get() = Caching.memoDf(spark, key, eager = true) {
      Seq(1).toDF("x")
    }
    val a = get()
    assert(a.storageLevel != StorageLevel.NONE)
    a.unpersist()
    assert(get().storageLevel != StorageLevel.NONE)
  }

  test("memoDfEpoch recomputes after its marker drops but not between accesses") {
    val key = uniq("spec-epoch")
    var builds = 0
    def get() = Caching.memoDfEpoch(spark, key) {
      builds += 1
      // stands in for a checkpoint-backed result the CacheManager
      // cannot guard
      Seq(builds).toDF("gen").localCheckpoint(true)
    }
    assert(get().as[Int].head() == 1)
    assert(get().as[Int].head() == 1, "same generation shares one result")
    assert(builds == 1)
    // dropping the marker frame is exactly what a clearCache does to
    // this entry (targeted here to stay parallel-suite friendly)
    spark.range(1).select(lit(key).as("memo_epoch_key")).unpersist()
    assert(get().as[Int].head() == 2, "marker loss starts a new generation")
    assert(builds == 2)
  }

  test("a memoized build may derive another memoized frame (no recursive-update crash)") {
    val inner = uniq("spec-inner"); val outer = uniq("spec-outer")
    val df = Caching.memoDf(spark, outer) {
      Caching.memoDf(spark, inner) { Seq(1, 2).toDF("x") }
        .agg(count(lit(1)).as("n"))
    }
    assert(df.as[Long].head() == 2L)
  }
}
