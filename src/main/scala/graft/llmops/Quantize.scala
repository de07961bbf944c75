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
    * scale 0 and all-zero codes. */
  def quantize(vec: Column): Column = {
    val scale = array_max(transform(vec, x => abs(x))) / 127.0
    struct(
      scale.as("scale"),
      transform(vec, x =>
        when(scale === 0.0, lit(0))
          .otherwise(round(x / scale))
          .cast("tinyint")).as("q"))
  }

  /** Inverse: struct(scale, q) → array<double>. */
  def dequantize(qv: Column): Column =
    transform(qv.getField("q"), v =>
      v.cast("double") * qv.getField("scale"))
}
