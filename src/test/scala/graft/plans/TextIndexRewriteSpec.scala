package graft.plans

import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Optimizer-integrated index selection: substring filters over a
  * registered text column scan only candidate files, for DataFrame AND
  * SQL entry points, with rows identical to the unindexed plan.
  */
class TextIndexRewriteSpec extends SparkSpec {

  // multi-file copy of the documents table (the original is one parquet
  // file, which nothing can prune below); "dup" is a token that occurs
  // in few documents — the same fixture TextIndexSpec uses
  private lazy val path: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-tir").toString
    graft.core.Tables.load(spark, sf("sf0.01"), "documents")
      .repartition(64).write.mode("overwrite").parquet(dir)
    dir
  }

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case rel: LogicalRelation => rel.relation match {
        case fs: HadoopFsRelation => fs.location.inputFiles.length
      }
    }.sum

  private def withIndexed[A](f: => A): A = {
    TextIndexRewrite.install(spark)
    TextIndexRewrite.index(path, "text")
    try f finally TextIndexRewrite.clear()
  }

  private val rareLiteral = "dup"

  test("contains() filter scans fewer files with identical rows") {
    val lit0 = rareLiteral
    val plain = spark.read.parquet(path)
      .filter(col("text").contains(lit0))
    val allFiles = scannedFiles(plain)
    val expected = plain.select("doc_id").collect().map(_.getLong(0)).sorted
    withIndexed {
      val pruned = spark.read.parquet(path)
        .filter(col("text").contains(lit0))
      assert(scannedFiles(pruned) < allFiles,
        s"expected pruning below $allFiles files")
      val got = pruned.select("doc_id").collect().map(_.getLong(0)).sorted
      assert(got.sameElements(expected))
    }
  }

  test("SQL LIKE '%lit%' is rewritten too (LikeSimplification composes)") {
    val lit0 = rareLiteral
    withIndexed {
      spark.read.parquet(path).createOrReplaceTempView("ti_docs")
      val df = spark.sql(s"SELECT doc_id FROM ti_docs WHERE text LIKE '%$lit0%'")
      assert(scannedFiles(df) <
        spark.read.parquet(path).inputFiles.length)
      val plain = spark.read.parquet(path)
        .filter(col("text").contains(lit0)).count()
      assert(df.count() === plain)
    }
  }

  test("impossible literal collapses to an empty scan, other conjuncts keep applying") {
    withIndexed {
      val df = spark.read.parquet(path)
        .filter(col("text").contains("zqxjvzzqk") && col("doc_id") >= 0)
      assert(scannedFiles(df) === 0) // LocalRelation — no files at all
      assert(df.count() === 0)
    }
  }

  test("unindexed tables and short patterns are untouched") {
    withIndexed {
      val other = spark.read.parquet(sf() + "/nation.parquet")
        .filter(col("n_name").contains("TION"))
      assert(other.count() > 0)
      // short literal (< 3 chars): no trigram can prune — full file set
      val short = spark.read.parquet(path).filter(col("text").contains("ab"))
      assert(scannedFiles(short) === spark.read.parquet(path).inputFiles.length)
    }
  }
}
