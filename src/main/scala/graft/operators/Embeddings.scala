package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-column preprocessing for training/ANN pipelines: unit-L2
  * normalization and symmetric int8 quantization (the standard 4× memory
  * reduction for billion-vector ANN indexes). Pure element-wise column
  * expressions — row-parallel, no shuffle, whole-stage-codegen'd; every
  * step is IEEE-deterministic so an external oracle can replay it.
  */
object Embeddings {

  /** x / ||x|| as array<double>; zero vectors map to NaN components
    * (visible, not silently zeroed).
    */
  def l2Normalize(vec: Column): Column =
    transform(vec, x => x.cast("double") / graft.functions.GraftFunctions.norm(vec))

  /** Largest |component| in double (max is exact and order-insensitive). */
  def maxAbs(vec: Column): Column =
    aggregate(vec, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** Symmetric int8 quantization scale: 127 / max|x| (1.0 for the
    * all-zero vector so dequantization stays finite).
    */
  def int8Scale(vec: Column): Column = {
    val m = maxAbs(vec)
    when(m === 0.0, lit(1.0)).otherwise(lit(127.0) / m)
  }

  /** Quantized codes as array<double> of integral values in [-127, 127]
    * (floor(x·scale + 0.5), clamped). Kept in double so downstream
    * arithmetic and the oracle share one numeric type; a storage layer
    * would cast to tinyint.
    */
  def int8Quantize(vec: Column, scale: Column): Column =
    transform(
      vec,
      x => greatest(lit(-127.0), least(lit(127.0), floor(x.cast("double") * scale + 0.5)))
    )

  /** Max absolute reconstruction error of the quantized codes:
    * max_i |x_i − q_i/scale| — bounded by 1/(2·scale) up to clamping.
    */
  def maxAbsError(vec: Column, codes: Column, scale: Column): Column =
    aggregate(
      zip_with(vec, codes, (x, q) => abs(x.cast("double") - q / scale)),
      lit(0.0),
      (acc, v) => greatest(acc, v)
    )
}
