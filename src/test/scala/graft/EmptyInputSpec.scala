package graft

import org.apache.spark.sql.functions._

/** Degenerate-input hardening: every registered query must ANALYZE and
  * EXECUTE against schema-identical EMPTY tables without throwing — the
  * first failure mode a library user hits (a fresh deployment, a
  * filtered-to-nothing tenant, a dry-run pipeline) and one no oracle
  * gate covers (the driver's correctness data always has rows).
  * Global aggregates legitimately return their 1-row zero/null frame
  * and everything else returns 0 rows; the contract asserted here is
  * only "no crash, a well-formed (possibly empty) result".
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-empty-sf").toString
    val src = sf()
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every registered query executes on empty tables without throwing") {
    // fresh caches: the shared memos must rebuild against the empty dir,
    // exercising the degenerate path of the cache builders too
    spark.sharedState.cacheManager.clearCache()
    val failures = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val df = fn(spark, emptyDir)
        df.limit(5).collect() // execute, don't just analyze
      } catch {
        case e: Throwable =>
          failures += name -> s"${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").linesIterator
              .take(2).mkString(" | ").take(300)}"
      }
    }
    assert(failures.isEmpty, failures.map { case (n, m) => s"\n  $n -> $m" }
      .mkString(s"${failures.size} queries crash on empty input:", "", ""))
  }

  test("every registered query executes with NULL payload columns without throwing") {
    // second degenerate class: rows exist but every NON-KEY column is
    // NULL (half the rows) — the shape a permissive upstream writer
    // produces. Key/id columns stay real (their non-nullness is the
    // data contract); payload strings/numerics/timestamps go null.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-null-sf").toString
    val src = sf()
    def isKey(c: String): Boolean =
      c.endsWith("key") || c.endsWith("_id") || c == "ts"
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      val base = spark.read.parquet(s"$src/$t.parquet").limit(6)
      val nulled = base.select(base.schema.fields.map { f =>
        if (isKey(f.name)) col(f.name)
        else when(col(f.name).isNotNull && lit(false), col(f.name))
          .otherwise(lit(null).cast(f.dataType)).as(f.name)
      }: _*)
      base.unionByName(nulled)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    spark.sharedState.cacheManager.clearCache()
    val failures = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try fn(spark, dir).limit(5).collect()
      catch {
        case e: Throwable =>
          failures += name -> s"${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").linesIterator
              .take(2).mkString(" | ").take(300)}"
      }
    }
    assert(failures.isEmpty, failures.map { case (n, m) => s"\n  $n -> $m" }
      .mkString(s"${failures.size} queries crash on null payloads:", "", ""))
  }
}
