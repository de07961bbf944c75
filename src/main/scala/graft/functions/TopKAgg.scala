package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native bounded top-k aggregates — the hot-loop twins of the typed
  * `Aggregator`s in [[graft.llmops.TopK]].
  *
  * The udaf/`ScalaAggregator` route pays per input row: an
  * InternalRow → Scala tuple conversion through an ExpressionEncoder,
  * a boxed `(Long, Long, Double)` allocation, and (for the Vector-
  * buffered variants) several collection rebuilds per accepted row.
  * Measured on the sf0.1 ANN rankers that is ~4 µs/row — 2-3× the
  * per-row cost of the `row_number` window these aggregates exist to
  * replace, which made the scale-correct shape a LOCAL regression
  * (llm_sim_lsh r11→r12). These `TypedImperativeAggregate`s evaluate
  * the child expressions straight off the `InternalRow` and keep the
  * buffer in flat primitive arrays with `System.arraycopy` inserts —
  * no per-row allocation once a group's buffer is at capacity.
  *
  * Semantics are IDENTICAL to the typed versions (lexicographic
  * (key, id) order, carry excluded from ordering, k-bounded buffer,
  * map-side combine before the exchange) — every hash gate over the
  * callers pins that. Null input rows are skipped (callers filter
  * nulls already; the udaf's primitive encoders could never carry
  * them either).
  */
object TopKAgg {

  /** Packed sorted (key, id) pair buffer with fixed capacity k. */
  final class PairsBuf(val k: Int) {
    val keys = new Array[Long](k)
    val ids = new Array[Long](k)
    var n = 0

    @inline private def lt(k1: Long, i1: Long, k2: Long, i2: Long): Boolean =
      k1 < k2 || (k1 == k2 && i1 < i2)

    def insert(key: Long, id: Long): Unit = {
      if (n == k && !lt(key, id, keys(n - 1), ids(n - 1))) return
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (lt(keys(mid), ids(mid), key, id)) lo = mid + 1 else hi = mid
      }
      val shift = math.min(n, k - 1) - lo
      if (shift > 0) {
        System.arraycopy(keys, lo, keys, lo + 1, shift)
        System.arraycopy(ids, lo, ids, lo + 1, shift)
      }
      keys(lo) = key
      ids(lo) = id
      if (n < k) n += 1
    }
  }

  /** [[PairsBuf]] with a carried double per entry (excluded from the
    * ordering). */
  final class CarryBuf(val k: Int) {
    val keys = new Array[Long](k)
    val ids = new Array[Long](k)
    val carries = new Array[Double](k)
    var n = 0

    @inline private def lt(k1: Long, i1: Long, k2: Long, i2: Long): Boolean =
      k1 < k2 || (k1 == k2 && i1 < i2)

    def insert(key: Long, id: Long, carry: Double): Unit = {
      if (n == k && !lt(key, id, keys(n - 1), ids(n - 1))) return
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (lt(keys(mid), ids(mid), key, id)) lo = mid + 1 else hi = mid
      }
      val shift = math.min(n, k - 1) - lo
      if (shift > 0) {
        System.arraycopy(keys, lo, keys, lo + 1, shift)
        System.arraycopy(ids, lo, ids, lo + 1, shift)
        System.arraycopy(carries, lo, carries, lo + 1, shift)
      }
      keys(lo) = key
      ids(lo) = id
      carries(lo) = carry
      if (n < k) n += 1
    }
  }
}

/** `array<bigint>` of the k lexicographically-smallest (key, id) pairs
  * per group, packed `[key0, id0, key1, id1, …]` in rank order — the
  * native twin of `TopK.smallestK`. */
case class BoundedTopKPairs(
    key: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.PairsBuf] {

  require(k > 0, s"k must be positive, got $k")

  // update() casts straight to Long — reject anything else at analysis
  // time instead of ClassCastException-ing mid-job
  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == LongType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BIGINT, BIGINT), got " +
        s"(${key.dataType.simpleString}, ${id.dataType.simpleString})")

  override def children: Seq[Expression] = Seq(key, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_topk_pairs"

  override def createAggregationBuffer(): TopKAgg.PairsBuf =
    new TopKAgg.PairsBuf(k)

  override def update(buf: TopKAgg.PairsBuf,
      input: InternalRow): TopKAgg.PairsBuf = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    if (kv != null && iv != null)
      buf.insert(kv.asInstanceOf[Long], iv.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKAgg.PairsBuf,
      other: TopKAgg.PairsBuf): TopKAgg.PairsBuf = {
    var i = 0
    while (i < other.n) {
      buf.insert(other.keys(i), other.ids(i))
      i += 1
    }
    buf
  }

  override def eval(buf: TopKAgg.PairsBuf): Any = {
    val out = new Array[Long](2 * buf.n)
    var i = 0
    while (i < buf.n) {
      out(2 * i) = buf.keys(i)
      out(2 * i + 1) = buf.ids(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKAgg.PairsBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) {
      bb.putLong(buf.keys(i))
      bb.putLong(buf.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.PairsBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKAgg.PairsBuf(k)
    buf.n = n
    var i = 0
    while (i < n) {
      buf.keys(i) = bb.getLong
      buf.ids(i) = bb.getLong
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopKPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopKPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopKPairs =
    copy(key = newChildren(0), id = newChildren(1))
}

/** `array<struct<_1: bigint, _2: bigint, _3: double>>` of the k
  * lexicographically-smallest (key, id) pairs per group with a carried
  * score — the native twin of `TopK.smallestKCarry`. */
case class BoundedTopKCarry(
    key: Expression,
    id: Expression,
    carry: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.CarryBuf] {

  require(k > 0, s"k must be positive, got $k")

  // update() casts straight to Long/Double — reject anything else at
  // analysis time instead of ClassCastException-ing mid-job
  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == LongType && id.dataType == LongType &&
        carry.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BIGINT, BIGINT, DOUBLE), got " +
        s"(${key.dataType.simpleString}, ${id.dataType.simpleString}, " +
        s"${carry.dataType.simpleString})")

  override def children: Seq[Expression] = Seq(key, id, carry)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("_1", LongType, nullable = false),
    StructField("_2", LongType, nullable = false),
    StructField("_3", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_topk_carry"

  override def createAggregationBuffer(): TopKAgg.CarryBuf =
    new TopKAgg.CarryBuf(k)

  override def update(buf: TopKAgg.CarryBuf,
      input: InternalRow): TopKAgg.CarryBuf = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    val cv = carry.eval(input)
    if (kv != null && iv != null && cv != null)
      buf.insert(kv.asInstanceOf[Long], iv.asInstanceOf[Long],
        cv.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TopKAgg.CarryBuf,
      other: TopKAgg.CarryBuf): TopKAgg.CarryBuf = {
    var i = 0
    while (i < other.n) {
      buf.insert(other.keys(i), other.ids(i), other.carries(i))
      i += 1
    }
    buf
  }

  override def eval(buf: TopKAgg.CarryBuf): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = InternalRow(buf.keys(i), buf.ids(i), buf.carries(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKAgg.CarryBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 24 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) {
      bb.putLong(buf.keys(i))
      bb.putLong(buf.ids(i))
      bb.putDouble(buf.carries(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.CarryBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKAgg.CarryBuf(k)
    buf.n = n
    var i = 0
    while (i < n) {
      buf.keys(i) = bb.getLong
      buf.ids(i) = bb.getLong
      buf.carries(i) = bb.getDouble
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopKCarry =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopKCarry =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopKCarry =
    copy(key = newChildren(0), id = newChildren(1), carry = newChildren(2))
}
