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

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions with a
    * portable ±1 Rademacher matrix (Achlioptas 2001: database-friendly
    * random projections — sign matrices preserve pairwise distances with
    * the same JL guarantee as Gaussians). Inputs are quantized to
    * floor(x·2^20) longs so each output coordinate is an EXACT integer
    * sign-dot ([[graft.functions.PortableLsh.projDots]], one codegen'd
    * primitive loop per row, no shuffle); [[rpScale]] maps a dot back to
    * the distance-preserving double. 4× column shrink at 64→16 dims
    * before any O(n·d) similarity pass downstream.
    */
  def randomProject(vec: Column, outDim: Int, dim: Int): Column =
    graft.functions.GraftFunctions.rpDots(vec, outDim, dim)

  /** Scale an exact projection dot to its JL-normalized double:
    * dot / (2^20 · √outDim).
    */
  def rpScale(dot: Column, outDim: Int): Column =
    dot.cast("double") / (lit(1048576.0) * lit(math.sqrt(outDim.toDouble)))

  /** Sign-bit binarization packed into 32-bit words (carried as longs):
    * word w holds dims [32w, 32w+32), bit j set iff x_{32w+j} > 0 (ties at
    * exactly 0.0 clear). 64-dim float32 → two words = 8 meaningful bytes,
    * a 32× memory reduction — the standard first stage of a billion-vector
    * Hamming index. Pure integer bitwise-OR fold: order-insensitive,
    * replayable bit-for-bit by any engine (see q_embed_binary's oracle).
    */
  def signWords(vec: Column, dim: Int): Column = {
    require(dim > 0, "signWords: dim must be positive")
    val nWords = (dim + 31) / 32
    array((0 until nWords).map { w =>
      val hi = math.min(31, dim - 32 * w - 1)
      aggregate(
        sequence(lit(0), lit(hi)),
        lit(0L),
        (acc, j) =>
          acc.bitwiseOR(
            when(
              element_at(vec, (lit(32 * w) + j + lit(1)).cast("int")).cast("double") > 0.0,
              call_function("shiftleft", lit(1L), j)
            ).otherwise(lit(0L))
          )
      )
    }: _*)
  }
}
