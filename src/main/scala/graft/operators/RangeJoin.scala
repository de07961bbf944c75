package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval (range) join — the second temporal
  * operator Spark lacks natively beside [[AsOfJoin]] (a plain
  * `ts >= start AND ts < end` join plans as BroadcastNestedLoop or a
  * cartesian product: O(|points|·|intervals|) work with no partition
  * parallelism on the predicate).
  *
  * ALGORITHM (time bucketing, the standard bin-based range-join
  * optimization — e.g. the published Databricks range-join hint and the
  * interval-join of stream engines): quantize time into fixed
  * `binMicros`-wide bins; each interval replicates to every bin it
  * overlaps (`ceil(len/bin) + 1 ≤ len/bin + 2` rows), each point maps
  * to exactly one bin, and the join becomes a plain EQUI-join on the
  * bin id followed by the exact range predicate as a post-filter —
  * hash-partitioned, codegen'd, skew-safe.
  *
  * 100 TB shape: ONE shuffle on the bin key for each side; interval
  * replication is bounded by interval-length/bin (pick `binMicros` ≈
  * the typical interval length so replication ≤ 2×); a pathological
  * months-long interval costs months/bin rows — still linear metadata,
  * never a cross product. Points never replicate. Correctness does not
  * depend on the bin width (any width yields identical rows —
  * `RangeJoinSpec` property-checks equivalence against the naive
  * non-equi join); width only tunes replication vs bin fan-in.
  */
object RangeJoin {

  /** Rows of `points` paired with every interval of `intervals` whose
    * half-open [start, end) contains `pt`. Output columns: the point
    * columns followed by the interval columns (minus the internal bin).
    * `pt`/`start`/`end` must be TimestampType columns OF the respective
    * inputs. */
  def pointInInterval(points: DataFrame, pt: Column,
      intervals: DataFrame, start: Column, end: Column,
      binMicros: Long): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive: $binMicros")
    // half-open end: the last covered bin is the one holding end-1µs;
    // an empty interval (end <= start) emits no bins and no rows
    // integer bin ids (Column `/` is double division; micros up to
    // ~2^51 divide exactly in double, and floor+cast keeps the contract
    // explicit)
    def binOf(us: Column) = floor(us / binMicros).cast("long")
    val binned = intervals
      .where(end > start)
      .withColumn("_bin", explode(sequence(
        binOf(unix_micros(start)),
        binOf(unix_micros(end) - 1))))
    points.withColumn("_bin", binOf(unix_micros(pt)))
      .join(binned, Seq("_bin"))
      .where(pt >= start && pt < end)
      .drop("_bin")
  }
}
