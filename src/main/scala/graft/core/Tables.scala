package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's deterministic parquet tables (TESTDATA.md).
  *
  * Scale notes (100 TB design): every loader is a plain parquet scan, so
  * Catalyst predicate pushdown / column pruning apply unchanged when the
  * same tables are Delta/partitioned at cluster scale. Callers must keep
  * filters and projections on the DataFrame (never collect-then-filter) so
  * the scan stays prunable.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Memoized per (session, path): parquet schema discovery and file
    * listing run once per session instead of once per query (measurable
    * per-query driver overhead at bench time; also how a long-lived
    * service over these tables would hold its analyzed plans). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"), { case (s, p) =>
      val df = s.read.parquet(p)
      if (name == "events") normalizeEventTs(df) else df
    })


  /** The events table's `ts` column has shipped in two physical shapes:
    * TIMESTAMP(NANOS), which Spark reads (with
    * `spark.sql.legacy.parquet.nanosAsLong=true`) as nano longs, and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 reads as
    * TIMESTAMP_NTZ. Both are normalized to the engine-native
    * TimestampType: the session timezone is pinned to UTC in every entry
    * point, so the NTZ→TZ cast is value-preserving (same wall-clock
    * micros), and the nanos branch truncates exactly like DuckDB's
    * TIMESTAMP_NS → TIMESTAMP cast in the oracle. Event-time streaming
    * (withWatermark) and unix_micros both require TimestampType. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  /** Streaming twin of [[events]]: `readStream` over the SAME fixture
    * files with the SAME `ts` normalization — the path a live event feed
    * takes (file/Kafka source → normalize → watermark). The schema comes
    * from the batch reader (streaming file sources need it upfront);
    * normalization happens ON the streaming frame, so event-time ops see
    * TimestampType regardless of the fixture's physical shape (nanos
    * long or NTZ micros). */
  def eventsStream(s: SparkSession, d: String): DataFrame = {
    val p = s"$d/events.parquet"
    // the fixture is a single FILE and a streaming file source's
    // basePath must be a directory: stream the parent, glob-filtered
    // down to exactly this file
    normalizeEventTs(s.readStream
      .schema(s.read.parquet(p).schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(d))
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
