package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Remaining SURVEY §2 inventory rows: secondary access paths, map-typed
  * metadata search, version resolution, key-rewrite copy, typed JSON.
  */
object CoverageQueries {
  import QueryDef.sql

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // ── S4: secondary-index access path — same table, different filter
    //    column; columnar scan + pushdown replaces the reference's GSI
    //    (fileIndexer.py:453-481).
    sql("s4_gsi_scan",
      """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
        |WHERE l_partkey BETWEEN 100 AND 120
        |ORDER BY l_partkey, l_orderkey, l_linenumber, l_suppkey,
        |         l_extendedprice""")(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_partkey").between(100, 120))
        .orderBy(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_suppkey"), col("l_extendedprice"))
        .select("l_orderkey", "l_linenumber", "l_partkey")),

    // ── F7: metadata key-exists + value-wildcard search over the pivoted
    //    MD map (search.py:756-811) — map_contains_key + exists() over
    //    map_values; oracle expresses the same via EXISTS on long form.
    sql("f7_metadata_kv",
      """WITH kv AS (
        |  SELECT l_orderkey, l_linenumber,
        |         CAST(MAX(CAST(l_quantity AS INTEGER)) AS VARCHAR) AS v
        |  FROM lineitem GROUP BY 1, 2
        |)
        |SELECT DISTINCT l_orderkey FROM kv a
        |WHERE EXISTS (SELECT 1 FROM kv b
        |              WHERE b.l_orderkey = a.l_orderkey AND b.l_linenumber = 3)
        |  AND EXISTS (SELECT 1 FROM kv c
        |              WHERE c.l_orderkey = a.l_orderkey AND c.v LIKE '%2%')
        |ORDER BY l_orderkey""")(
      (s, d) => {
        // last-writer-wins dedup per key (reference pivot semantics);
        // grouped on the numeric key, the string map key derived after —
        // the 600k-row shuffle carries ints, not concat'd strings.
        // One explicit hash-partition on the entity key serves BOTH
        // aggregations (HashPartitioning(l_orderkey) satisfies the
        // (l_orderkey, l_linenumber) clustering too), so the dedup and
        // the pivot run shuffle-free on top of it — one exchange instead
        // of two; at 100 TB this is the difference between shuffling the
        // metadata table once vs twice (measured 1.25 s -> 0.82 s sf0.1)
        val kv = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("int").as("q"))
          .repartition(col("l_orderkey"))
          .groupBy(col("l_orderkey"), col("l_linenumber"))
          .agg(max(col("q")).cast("string").as("v"))
        // the SEARCH form never materializes the map: the key-exists and
        // value-contains predicates aggregate directly over the deduped
        // kv rows (the map pivot itself is A7's surface). Fixed-width
        // booleans over the already-partitioned rows — no per-entity
        // collect_list/map build on the search path.
        kv.groupBy("l_orderkey")
          .agg(max(when(col("l_linenumber") === 3, 1).otherwise(0)).as("has_k"),
            max(when(col("v").contains("2"), 1).otherwise(0)).as("has_v"))
          .filter(col("has_k") === 1 && col("has_v") === 1)
          .select("l_orderkey")
          // persist before the global sort: the sampler otherwise
          // re-executes the two-aggregate chain (r14 recipe; result is
          // entity-sized — keeps a range sort)
          .transform(graft.core.Caching.persistOnce)
          .orderBy("l_orderkey")
      }),

    // ── J7: version-snapshot resolution — (version, fileKey) → stored
    //    object version (assetVersions.py:566-607); top-1 tiebreak for
    //    the duplicated detail rows.
    sql("j7_version_resolve",
      """SELECT o_orderkey, l_partkey AS version_ref,
        |       strftime(l_shipdate, '%Y-%m-%d') AS resolved_at
        |FROM orders JOIN lineitem
        |  ON l_orderkey = o_orderkey AND l_linenumber = 1
        |WHERE o_orderkey < 300
        |QUALIFY row_number() OVER (PARTITION BY o_orderkey
        |  ORDER BY l_partkey, l_suppkey, l_extendedprice) = 1
        |ORDER BY o_orderkey""")(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        t(s, d, "orders").filter(col("o_orderkey") < 300)
          .join(t(s, d, "lineitem").filter(col("l_linenumber") === 1),
            col("l_orderkey") === col("o_orderkey"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("o_orderkey")
              .orderBy(col("l_partkey"), col("l_suppkey"),
                col("l_extendedprice"))))
          .filter(col("rn") === 1)
          .select(col("o_orderkey"), col("l_partkey").as("version_ref"),
            date_format(col("l_shipdate"), "yyyy-MM-dd").as("resolved_at"))
          .orderBy("o_orderkey")
      }),

    // ── J10: cross-asset copy with key rewrite + metadata carry
    //    (assetFiles.py:2243-2359) — INSERT..SELECT shape with composite
    //    key rewrite.
    sql("j10_copy_rewrite",
      """SELECT 'copy:' || CAST(l_orderkey AS VARCHAR) || ':' ||
        |         CAST(l_linenumber AS VARCHAR) AS new_key,
        |       CAST(l_orderkey AS VARCHAR) || ':' ||
        |         CAST(l_linenumber AS VARCHAR) AS src_key,
        |       l_partkey, CAST(l_quantity AS INTEGER) AS quantity
        |FROM lineitem WHERE l_orderkey < 50
        |ORDER BY new_key, l_partkey, l_suppkey, l_extendedprice""")(
      (s, d) => {
        val src = graft.core.Codecs.compositeKey(col("l_orderkey"), col("l_linenumber"))
        t(s, d, "lineitem").filter(col("l_orderkey") < 50)
          .orderBy(concat(lit("copy:"), src), col("l_partkey"), col("l_suppkey"),
            col("l_extendedprice"))
          .select(concat(lit("copy:"), src).as("new_key"), src.as("src_key"),
            col("l_partkey"), col("l_quantity").cast("int").as("quantity"))
      }),

    // ── C4+C5: typed JSON parse + range validation (metadata.py:96-214,
    //    lla bounds :183-214) — from_json struct + CHECK-style predicate.
    sql("c5_json_typed",
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |       (CAST(json_extract_string(props, '$.k') AS INTEGER)
        |          BETWEEN 0 AND 99) AS k_in_range,
        |       (value BETWEEN -90.0 AND 90.0) AS lat_valid
        |FROM events ORDER BY event_id LIMIT 1000""")(
      (s, d) => {
        import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
        val schema = StructType(Seq(StructField("k", IntegerType)))
        val k = from_json(col("props"), schema).getField("k")
        // top-k FIRST, parse AFTER (r16 — same shape as c3): event_id is
        // unique, so the 1000 smallest rows are identical and only they
        // pay the from_json; the 1000-row re-sort pins the output order
        t(s, d, "events")
          .select(col("event_id"), col("props"), col("value"))
          .orderBy("event_id").limit(1000)
          .select(col("event_id"), k.as("k"),
            k.between(0, 99).as("k_in_range"),
            col("value").between(-90.0, 90.0).as("lat_valid"))
          .orderBy("event_id")
      })
  )
}
