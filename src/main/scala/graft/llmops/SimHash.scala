package graft.llmops

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.Encoder

/** 31-bit SimHash as a one-pass typed aggregate over feature hashes.
  *
  * Classic SimHash: every feature votes ±1 on each bit of its hash; the
  * final fingerprint sets the bits with positive vote sums. Votes are
  * commutative integer sums, so the aggregate is order-independent and
  * partial-aggregation friendly (map-side combine; 31 ints per doc cross
  * the shuffle). 31 bits keeps every intermediate inside the same
  * SQL-expressible `hash60 % (2^31-1)` field as MinHash, so the DuckDB
  * oracle reproduces fingerprints exactly.
  *
  * Near-dup pairing at scale uses the pigeonhole trick: fingerprints
  * within Hamming distance ≤ 3 must agree on at least one of 4 bit
  * chunks — an equi-join on chunk values replaces the O(n²) scan.
  */
object SimHash {
  val Bits = 31

  private object Agg extends Aggregator[Long, Array[Int], Long] {
    def zero: Array[Int] = Array.fill(Bits)(0)
    def reduce(buf: Array[Int], g: Long): Array[Int] = {
      var b = 0
      while (b < Bits) {
        buf(b) += (if (((g >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      buf
    }
    def merge(x: Array[Int], y: Array[Int]): Array[Int] = {
      var b = 0
      while (b < Bits) { x(b) += y(b); b += 1 }
      x
    }
    def finish(votes: Array[Int]): Long = {
      var sig = 0L
      var b = 0
      while (b < Bits) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
      sig
    }
    def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
    def outputEncoder: Encoder[Long] = ExpressionEncoder[Long]()
  }

  /** `simhash(g)` — aggregate feature hashes into the fingerprint. */
  val simhash: UserDefinedFunction = udaf(Agg)
}
