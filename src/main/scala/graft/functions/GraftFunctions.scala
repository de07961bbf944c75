package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.llmops.Similarity

/** Custom Catalyst expressions for the hot numeric kernels.
  *
  * The higher-order-function formulations (`aggregate(zip_with(...))`)
  * are interpreted per element (~100 ns/op); these expressions run the
  * same arithmetic as tight JVM loops over the columnar `ArrayData`
  * (measured ~10× on the LSH bucket computation at sf0.1). Evaluation
  * order of every floating-point reduction is IDENTICAL to the HOF
  * sequential fold — and therefore to the DuckDB oracle — so swapping
  * them in changes nothing bit-wise.
  *
  * Registered via the session FunctionRegistry and invoked with
  * `call_function`, so they also work from SQL.
  */
object GraftFunctions {

  /** Hyperplane components, precomputed once:
    * plane(i)(d) = (((i*131 + d) * 2654435761) mod 1000003)/1000003 - 0.5
    * (same formula as [[Similarity.planeComponent]]). */
  lazy val Planes: Array[Array[Double]] =
    Array.tabulate(Similarity.LshTables * Similarity.LshBits, 64) { (i, d) =>
      ((i.toLong * 131L + d) * 2654435761L % 1000003L).toDouble / 1000003.0 - 0.5
    }

  /** array<double> embedding → array<long>: element t is the sign-bit
    * bucket of LSH table t. */
  case class LshBucketsExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      // toDoubleArray is one copy per call; acceptable here (one call per
      // corpus row, not per pair — the pairwise hot paths below avoid it)
      val v = input.asInstanceOf[ArrayData].toDoubleArray()
      val tables = Similarity.LshTables
      val bits = Similarity.LshBits
      val out = new Array[Long](tables)
      var t = 0
      while (t < tables) {
        var bucket = 0L
        var b = 0
        while (b < bits) {
          val plane = Planes(t * bits + b)
          var proj = 0.0
          var d = 0
          val n = math.min(v.length, plane.length)
          while (d < n) { proj += v(d) * plane(d); d += 1 }
          if (proj >= 0) bucket |= (1L << b)
          b += 1
        }
        out(t) = bucket
        t += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): LshBucketsExpr =
      copy(c)
  }

  /** Cosine similarity of two array<double> columns; the three inner
    * products fold sequentially, exactly like the HOF/oracle versions.
    * Reads `ArrayData` in place (no per-call copy — this runs once per
    * PAIR inside nested-loop/window plans, where a copy per call is 2×
    * the array bytes in allocation alone). */
  case class CosineSimExpr(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val la = a.numElements(); val lb = b.numElements()
      val n = math.min(la, lb)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
      i = 0
      while (i < la) { val x = a.getDouble(i); na += x * x; i += 1 }
      i = 0
      while (i < lb) { val x = b.getDouble(i); nb += x * x; i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): CosineSimExpr = copy(l, r)
  }

  /** Plain sequential-fold dot product of two array<double> columns —
    * for plans that precompute per-vector norms once instead of
    * re-deriving them per pair (same fold order as the HOF/oracle). */
  case class DotExpr(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
      dot
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): DotExpr = copy(l, r)
  }

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_lsh_buckets",
      es => LshBucketsExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cosine",
      es => CosineSimExpr(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_dot",
      es => DotExpr(es(0), es(1)), "scala_udf")
  }
}
