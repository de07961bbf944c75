package graft.llmops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding storage quantization — at 100 TB the embedding column IS
  * the storage bill, and ANN recall tolerates 8-bit precision: cut the
  * footprint 4× (float32 → int8 + one scale per vector) before the
  * LSH/IVF index build, dequantize on read. Pure column expressions;
  * symmetric per-vector scaling keeps the arithmetic trivially
  * invertible and engine-portable.
  */
object Quantize {

  /** array<double> → struct(scale double, q array<tinyint>);
    * scale = max|x| / 127, values = round(x / scale). Zero vectors get
    * scale 0 and all-zero codes.
    *
    * Implemented as the one-pass [[graft.functions.GraftFunctions.QuantizeExpr]]
    * kernel: the HOF form re-derived the O(dim) scale inside the
    * per-element lambda after Catalyst inlined it (struct-field staging
    * is undone by SimplifyExtractValueOps), turning quantization into
    * O(dim²) per row. */
  def quantize(vec: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.GraftFunctions.register)
    call_function("graft_quantize", vec)
  }

  /** Inverse: struct(scale, q) → array<double>. */
  def dequantize(qv: Column): Column =
    transform(qv.getField("q"), v =>
      v.cast("double") * qv.getField("scale"))
}
