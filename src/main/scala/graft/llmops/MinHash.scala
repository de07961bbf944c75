package graft.llmops

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.Encoder

/** MinHash signatures as a one-pass typed aggregate.
  *
  * The 100 TB path for near-duplicate detection: instead of the O(n²)
  * shingle self-join, each document folds its shingle hashes into a
  * 64-slot signature in a single pass (map-side partial aggregation —
  * the merge is an element-wise min, so Spark combines per-partition
  * buffers before the shuffle; shuffle volume is 64 longs per doc, not
  * the shingle set). LSH banding (16 bands × 4 rows) then turns pair
  * discovery into an equi-join on band keys.
  *
  * The permutation family is deliberately expressible in ANSI SQL
  * (`(a_j*g + b_j) mod P`, P = 2^31-1, g < P, a_j,b_j < P so products
  * stay inside signed 64-bit) — the DuckDB oracle reproduces the exact
  * signatures, making this custom aggregate hash-verifiable.
  */
object MinHash {
  val P: Long = Text.HashP
  val NumPerm = 64
  val BandRows = 4
  val NumBands: Int = NumPerm / BandRows // 16

  // Deterministic permutation parameters, mirrored in the oracle SQL.
  val A: Array[Long] = Array.tabulate(NumPerm)(j => ((j + 1) * 2654435761L) % P)
  val B: Array[Long] = Array.tabulate(NumPerm)(j => ((j + 17) * 40503L) % P)

  private object Agg extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.fill(NumPerm)(P)
    def reduce(buf: Array[Long], g: Long): Array[Long] = {
      var j = 0
      while (j < NumPerm) {
        val h = (A(j) * g + B(j)) % P
        if (h < buf(j)) buf(j) = h
        j += 1
      }
      buf
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var j = 0
      while (j < NumPerm) { if (y(j) < x(j)) x(j) = y(j); j += 1 }
      x
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** `minhash(g)` — aggregate a column of shingle hashes (< P) into the
    * 64-long signature array. */
  val minhash: UserDefinedFunction = udaf(Agg)
}
