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

  /** Top principal component by fixed-round power iteration — distributed
    * PCA in its 100 TB shape: ONE corpus-scale pass builds the d×d
    * second-moment table (row-local d² expansion with map-side combine,
    * so the shuffle carries d² rows total, not n·d²), the d×d matrix is
    * collected (bounded — the codebook pattern), the power iteration runs
    * driver-side on d doubles, and the learned direction broadcasts back
    * as a literal for a row-local projection pass.
    *
    * Deterministic to the bit across engines and partitionings: every
    * unordered sum (covariance entries, mat-vec components, norms, the
    * final projections) goes through floor(x·10^s) FIXED-POINT longs —
    * exact integer addition, order-insensitive (the
    * [[Graphs.pagerank]] trick) — and everything else is one IEEE chain
    * on identical inputs, so an external oracle can replay all `rounds`
    * iterations and hash-match every projection. The result is defined
    * as "`rounds`-round power iteration from v0 = 1/√d", a pure function
    * of the data — convergence quality is a caller concern.
    *
    * @return (idCol, pc1) — each vector's centered projection on the
    *         learned direction, rounded at 6dp
    */
  def pcaTopComponent(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      rounds: Int
  ): org.apache.spark.sql.DataFrame = {
    require(dim > 0 && rounds >= 1, "pcaTopComponent: need dim > 0, rounds >= 1")
    import org.apache.spark.sql.types.DecimalType
    val x = df.select(col(idCol), transform(col(vecCol), _.cast("double")).as("v"))
    // per-dim mean: bounded d-row aggregate, DECIMAL-pinned, collected —
    // the per-dim row count doubles as n (one corpus pass fewer than a
    // separate count() job; round-13, guide §1.2)
    val muRows = x
      .select(posexplode(col("v")).as(Seq("i", "xi")))
      .groupBy(col("i"))
      .agg((sum(col("xi").cast(DecimalType(38, 6))).cast("double")
        / count(lit(1)).cast("double")).as("m"), count(lit(1)).as("cnt"))
      .orderBy(col("i"))
      .select(col("m"), col("cnt")).collect()
    val mu: Array[Double] = muRows.map(_.getDouble(0))
    require(mu.length == dim, s"vectors are ${mu.length}-dim, caller said $dim")
    // ragged/empty vectors would make per-dim counts disagree with the
    // row count the old x.count() measured — fail loud rather than
    // silently shift the 1/n normalization
    require(muRows.forall(_.getLong(1) == muRows(0).getLong(1)),
      "pcaTopComponent: ragged vectors (per-dim counts differ)")
    val n = muRows(0).getLong(1).toDouble
    val muLit = array(mu.map(lit): _*)
    // centered vectors as a MATERIALIZED column (a lambda-captured
    // centering tree would be re-evaluated d² times per row below)
    val cent = x.select(col(idCol),
      zip_with(col("v"), muLit, (a, b) => a - b).as("c"))
    // d² fixed-point covariance sums in one pass; inner lambda touches
    // only the bound column and lambda variables. The per-term scaled
    // longs sum through DECIMAL(38,0): a LongType sum would WRAP silently
    // at large n·|c|² while the oracle's DuckDB SUM(BIGINT) promotes to
    // HUGEINT — decimal matches that promotion (and a true 38-digit
    // overflow surfaces as a loud null below, never a wrong answer).
    // UPPER TRIANGLE only (round-13, guide §1.2): floor(ci·cj·1e9) is
    // symmetric in (i, j), so the mirrored per-cell sums are EXACTLY
    // equal — emitting j ≥ i halves the d² row-local expansion and the
    // aggregate volume; the driver-side cov() mirrors the lookup. Inner
    // slice index jj is 0-based within the suffix, so j = i + jj.
    val covFp: Map[Int, java.math.BigDecimal] = cent
      .select(explode(flatten(transform(col("c"), (xi, i) =>
        transform(slice(col("c"), i + lit(1), lit(dim) - i), (xj, jj) =>
          struct((i * dim + i + jj).as("k"),
            floor(xi * xj * lit(1e9)).cast("long").as("t")))))).as("kt"))
      .groupBy(col("kt.k").as("k"))
      .agg(sum(col("kt.t").cast(DecimalType(38, 0))).as("s"))
      .collect().map { r =>
        val s = r.getAs[java.math.BigDecimal]("s")
        require(s != null, "pcaTopComponent: covariance sum overflowed DECIMAL(38,0)")
        r.getAs[Int]("k") -> s
      }.toMap
    val zero = java.math.BigDecimal.ZERO
    def cov(i: Int, j: Int): Double = {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      covFp.getOrElse(a * dim + b, zero).doubleValue() / 1e9 / n
    }
    // driver power iteration; every d-term sum fixed-point-pinned
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to rounds) {
      val t = Array.tabulate(dim) { i =>
        (0 until dim).map(j => math.floor(cov(i, j) * v(j) * 1e12).toLong).sum / 1e12
      }
      val nrm = math.sqrt(
        (0 until dim).map(i => math.floor(t(i) * t(i) * 1e12).toLong).sum / 1e12)
      require(nrm > 0, "power iteration collapsed to the zero vector")
      v = t.map(_ / nrm)
    }
    val vLit = array(v.map(lit): _*)
    cent.select(col(idCol),
      round(
        aggregate(
          zip_with(col("c"), vLit, (c, w) => floor(c * w * lit(1e12)).cast("long")),
          lit(0L), (acc, t) => acc + t).cast("double") / lit(1e12),
        6).as("pc1"))
  }
}
