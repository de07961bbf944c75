package graft.llmops

import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Column, Encoder, Encoders, GraftColumnBridge}

import graft.functions.{BoundedTopKCarry, BoundedTopKPairs}

/** Bounded top-k as a one-pass typed aggregate — the 100 TB shape for
  * "smallest k (key, id) pairs per group".
  *
  * The naive per-group head is a window (`row_number() OVER (PARTITION BY
  * stratum ORDER BY key)`), which shuffles EVERY row of every stratum to
  * one task before discarding all but k. This aggregate keeps a bounded
  * buffer of k pairs per partial, so map-side combine runs before the
  * exchange and shuffle volume is ≤ k pairs per (partition × group) — at
  * 100 TB the window shape moves the corpus, this moves k rows per
  * stratum per input split.
  *
  * Ordering is lexicographic on (key, id) — ties on the key are broken by
  * the id, which makes the result deterministic and lets a SQL oracle
  * state the same semantics as a plain `row_number()` window at oracle
  * scale.
  *
  * The buffer is a flat packed Array[Long] `[key0,id0,key1,id1,...]` kept
  * sorted; k is small (sampling heads), so insertion is O(k) on the
  * already-sorted array and merge is a linear merge of two sorted runs.
  */
object TopK {

  private final class SmallestK(k: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Long]] {

    private def lt(k1: Long, i1: Long, k2: Long, i2: Long): Boolean =
      k1 < k2 || (k1 == k2 && i1 < i2)

    def zero: Array[Long] = Array.emptyLongArray

    def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
      val (key, id) = in
      val n = buf.length / 2
      if (n == k && !lt(key, id, buf(2 * n - 2), buf(2 * n - 1))) buf
      else {
        // binary search for the insertion point among packed pairs
        var lo = 0
        var hi = n
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (lt(buf(2 * mid), buf(2 * mid + 1), key, id)) lo = mid + 1
          else hi = mid
        }
        val outN = math.min(n + 1, k)
        val out = new Array[Long](2 * outN)
        System.arraycopy(buf, 0, out, 0, 2 * lo)
        out(2 * lo) = key
        out(2 * lo + 1) = id
        System.arraycopy(buf, 2 * lo, out, 2 * lo + 2,
          2 * (outN - lo - 1))
        out
      }
    }

    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      val outN = math.min((x.length + y.length) / 2, k)
      val out = new Array[Long](2 * outN)
      var (i, j, o) = (0, 0, 0)
      while (o < outN) {
        val takeX = j >= y.length / 2 || (i < x.length / 2 &&
          lt(x(2 * i), x(2 * i + 1), y(2 * j), y(2 * j + 1)))
        if (takeX) { out(2 * o) = x(2 * i); out(2 * o + 1) = x(2 * i + 1); i += 1 }
        else { out(2 * o) = y(2 * j); out(2 * o + 1) = y(2 * j + 1); j += 1 }
        o += 1
      }
      out
    }

    def finish(r: Array[Long]): Array[Long] = r

    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** `smallestK(k)(key, id)` — aggregate to the packed sorted array of the
    * k lexicographically-smallest (key, id) pairs. Backed by the native
    * [[graft.functions.BoundedTopKPairs]] `TypedImperativeAggregate`
    * (primitive-array buffer, no per-row encoder conversion — the udaf
    * route's ~4 µs/row made the scale-correct shape a local regression
    * on the sf0.1 ANN rankers); semantics identical to [[SmallestK]],
    * which remains as the spec cross-check reference. */
  def smallestK(k: Int): (Column, Column) => Column =
    (key, id) => GraftColumnBridge.column(
      BoundedTopKPairs(GraftColumnBridge.expression(key),
        GraftColumnBridge.expression(id), k).toAggregateExpression())

  /** The typed-`Aggregator` reference implementation of [[smallestK]]
    * (specs cross-check the native aggregate against it). */
  private[llmops] def smallestKRef(k: Int): UserDefinedFunction =
    udaf(new SmallestK(k), Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))

  /** [[SmallestK]] with a carried payload: the k smallest DISTINCT ids
    * per group, each with its (id-determined) payload array. The id
    * dedup is load-bearing for append-only stores — a redelivered batch
    * re-inserts byte-identical rows, and without dedup the replays
    * would consume cap slots. Buffer stays bounded at k entries, so
    * map-side combine runs and shuffle volume is ≤ k (id, payload)
    * pairs per (partition × group) — same contract as [[SmallestK]]. */
  private final class SmallestKSig(k: Int)
      extends Aggregator[(Long, Seq[Long]), Seq[(Long, Seq[Long])],
        Seq[(Long, Seq[Long])]] {

    def zero: Seq[(Long, Seq[Long])] = Vector.empty

    def reduce(buf: Seq[(Long, Seq[Long])],
        in: (Long, Seq[Long])): Seq[(Long, Seq[Long])] = {
      val n = buf.length
      if (n == k && in._1 >= buf(n - 1)._1) buf
      else {
        var lo = 0
        var hi = n
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (buf(mid)._1 < in._1) lo = mid + 1 else hi = mid
        }
        if (lo < n && buf(lo)._1 == in._1) buf // duplicate id: replay slot-guard
        else (buf.take(lo) :+ in) ++ buf.drop(lo) take k
      }
    }

    def merge(x: Seq[(Long, Seq[Long])],
        y: Seq[(Long, Seq[Long])]): Seq[(Long, Seq[Long])] = {
      val out = Vector.newBuilder[(Long, Seq[Long])]
      var (i, j, o) = (0, 0, 0)
      var last = Long.MinValue
      var first = true
      while (o < k && (i < x.length || j < y.length)) {
        val takeX = j >= y.length || (i < x.length && x(i)._1 <= y(j)._1)
        val e = if (takeX) { val v = x(i); i += 1; v }
          else { val v = y(j); j += 1; v }
        if (first || e._1 != last) { out += e; o += 1; last = e._1; first = false }
      }
      out.result()
    }

    def finish(r: Seq[(Long, Seq[Long])]): Seq[(Long, Seq[Long])] = r

    def bufferEncoder: Encoder[Seq[(Long, Seq[Long])]] =
      ExpressionEncoder[Seq[(Long, Seq[Long])]]()
    def outputEncoder: Encoder[Seq[(Long, Seq[Long])]] =
      ExpressionEncoder[Seq[(Long, Seq[Long])]]()
  }

  /** [[SmallestK]] with a CARRIED double: the k lexicographically-
    * smallest (key, id) pairs per group, each carrying a score that
    * does NOT participate in the ordering. The exact-top-k-by-score
    * shape: key = an order-preserving integer image of the descending
    * score (`graft_sortable_double` of the negated score), id = the
    * tiebreaker, carry = the RAW score for output. Replaces the
    * per-group row_number window whose sort funnels a query's ENTIRE
    * candidate set into one task at corpus scale; this buffer stays
    * bounded at k, so map-side combine runs and the shuffle carries
    * ≤ k triplets per (partition × group). No id dedup — callers feed
    * unique (group, id) pairs. */
  private final class SmallestKCarry(k: Int)
      extends Aggregator[(Long, Long, Double), Seq[(Long, Long, Double)],
        Seq[(Long, Long, Double)]] {

    private def lt(k1: Long, i1: Long, k2: Long, i2: Long): Boolean =
      k1 < k2 || (k1 == k2 && i1 < i2)

    def zero: Seq[(Long, Long, Double)] = Vector.empty

    def reduce(buf: Seq[(Long, Long, Double)],
        in: (Long, Long, Double)): Seq[(Long, Long, Double)] = {
      val n = buf.length
      if (n == k && !lt(in._1, in._2, buf(n - 1)._1, buf(n - 1)._2)) buf
      else {
        var lo = 0
        var hi = n
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (lt(buf(mid)._1, buf(mid)._2, in._1, in._2)) lo = mid + 1
          else hi = mid
        }
        (buf.take(lo) :+ in) ++ buf.drop(lo) take k
      }
    }

    def merge(x: Seq[(Long, Long, Double)],
        y: Seq[(Long, Long, Double)]): Seq[(Long, Long, Double)] = {
      val out = Vector.newBuilder[(Long, Long, Double)]
      var (i, j, o) = (0, 0, 0)
      while (o < k && (i < x.length || j < y.length)) {
        val takeX = j >= y.length || (i < x.length &&
          lt(x(i)._1, x(i)._2, y(j)._1, y(j)._2))
        if (takeX) { out += x(i); i += 1 } else { out += y(j); j += 1 }
        o += 1
      }
      out.result()
    }

    def finish(r: Seq[(Long, Long, Double)]): Seq[(Long, Long, Double)] = r

    def bufferEncoder: Encoder[Seq[(Long, Long, Double)]] =
      ExpressionEncoder[Seq[(Long, Long, Double)]]()
    def outputEncoder: Encoder[Seq[(Long, Long, Double)]] =
      ExpressionEncoder[Seq[(Long, Long, Double)]]()
  }

  /** `smallestKCarry(k)(key, id, carry)` — the k smallest (key, id)
    * pairs per group with a carried double, as
    * `array<struct<_1: key, _2: id, _3: carry>>` in rank order. Backed
    * by the native [[graft.functions.BoundedTopKCarry]] (see
    * [[smallestK]] for why); [[SmallestKCarry]] remains as the spec
    * cross-check reference. */
  def smallestKCarry(k: Int): (Column, Column, Column) => Column =
    (key, id, carry) => GraftColumnBridge.column(
      BoundedTopKCarry(GraftColumnBridge.expression(key),
        GraftColumnBridge.expression(id),
        GraftColumnBridge.expression(carry), k).toAggregateExpression())

  /** The typed-`Aggregator` reference implementation of
    * [[smallestKCarry]] (specs cross-check the native aggregate
    * against it). */
  private[llmops] def smallestKCarryRef(k: Int): UserDefinedFunction =
    udaf(new SmallestKCarry(k), Encoders.tuple(Encoders.scalaLong,
      Encoders.scalaLong, Encoders.scalaDouble))

  /** `smallestKSig(k)(id, payload)` — the k smallest distinct ids per
    * group with their payloads, as `array<struct<_1: id, _2: payload>>`. */
  def smallestKSig(k: Int): UserDefinedFunction =
    udaf(new SmallestKSig(k),
      Encoders.tuple(Encoders.scalaLong, ExpressionEncoder[Seq[Long]]()))

  /** [[SmallestKSig]] with a DOUBLE payload (embedding vectors) — same
    * bounded-buffer, id-deduping contract. */
  private final class SmallestKVecD(k: Int)
      extends Aggregator[(Long, Seq[Double]), Seq[(Long, Seq[Double])],
        Seq[(Long, Seq[Double])]] {

    def zero: Seq[(Long, Seq[Double])] = Vector.empty

    def reduce(buf: Seq[(Long, Seq[Double])],
        in: (Long, Seq[Double])): Seq[(Long, Seq[Double])] = {
      val n = buf.length
      if (n == k && in._1 >= buf(n - 1)._1) buf
      else {
        var lo = 0
        var hi = n
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (buf(mid)._1 < in._1) lo = mid + 1 else hi = mid
        }
        if (lo < n && buf(lo)._1 == in._1) buf
        else (buf.take(lo) :+ in) ++ buf.drop(lo) take k
      }
    }

    def merge(x: Seq[(Long, Seq[Double])],
        y: Seq[(Long, Seq[Double])]): Seq[(Long, Seq[Double])] = {
      val out = Vector.newBuilder[(Long, Seq[Double])]
      var (i, j, o) = (0, 0, 0)
      var last = Long.MinValue
      var first = true
      while (o < k && (i < x.length || j < y.length)) {
        val takeX = j >= y.length || (i < x.length && x(i)._1 <= y(j)._1)
        val e = if (takeX) { val v = x(i); i += 1; v }
          else { val v = y(j); j += 1; v }
        if (first || e._1 != last) { out += e; o += 1; last = e._1; first = false }
      }
      out.result()
    }

    def finish(r: Seq[(Long, Seq[Double])]): Seq[(Long, Seq[Double])] = r

    def bufferEncoder: Encoder[Seq[(Long, Seq[Double])]] =
      ExpressionEncoder[Seq[(Long, Seq[Double])]]()
    def outputEncoder: Encoder[Seq[(Long, Seq[Double])]] =
      ExpressionEncoder[Seq[(Long, Seq[Double])]]()
  }

  /** `smallestKVecD(k)(id, payload)` — [[smallestKSig]] for
    * `array<double>` payloads. */
  def smallestKVecD(k: Int): UserDefinedFunction =
    udaf(new SmallestKVecD(k),
      Encoders.tuple(Encoders.scalaLong, ExpressionEncoder[Seq[Double]]()))
}
