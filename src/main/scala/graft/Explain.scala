package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the optimized + physical plan of registered queries.
  * Usage: runMain graft.Explain <sfDir> <queryName> [more names...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Explain <sfDir> <query> [query...]")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // same AQE condition as Bench/MicroBench so committed plan files
      // reflect the benched plan shape
      .config("spark.sql.adaptive.enabled",
        sys.env.get("SPARK_GRAFT_AQE")
          .exists(v => Set("true", "1", "yes")(v.toLowerCase)).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, args(0))
      println(s"===== $name =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
