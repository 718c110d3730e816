package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer: per-dimension fixed-point sums + non-finite flags + count. */
final case class CentroidBuf(sums: Array[Long], bad: Array[Boolean], n: Long)

/** Output wrapper (product type so the result has a stable Encoder). */
final case class Centroid(values: Seq[Double])

/** Typed `Aggregator` computing the element-wise mean (centroid) of an
  * embedding column per group — the engine's custom-UDAF extension surface
  * (SURVEY.md §2.6 last row; the reference's analog is any fold a user
  * writes in an agent closure over its table state).
  *
  * The centroid is the building block of IVF-style ANN (cluster centers =
  * coarse quantizer) and of drift monitoring over embedding corpora. Merge
  * is associative/commutative, so partial aggregation runs map-side — one
  * shuffle row per (group, dim longs) regardless of corpus size: the
  * 100 TB-safe shape.
  *
  * Numeric design: components are accumulated as FIXED-POINT longs
  * (floor(v · 2^20); ~1e-6 granularity, far below any embedding's signal).
  * Long addition is exact and order-insensitive, so the centroid is
  * BIT-IDENTICAL across partitionings, retries, and cluster sizes — rerun
  * a 100 TB training job and get the same quantizer, and the DuckDB
  * oracle can replay the math exactly (floor has no round-half ties;
  * double sums would drift with partition order and straddle rounding
  * boundaries, which is how this surfaced at sf0.1).
  */
final class CentroidAgg(dim: Int) extends Aggregator[Seq[Float], CentroidBuf, Centroid] {

  /** 2^20 fixed-point scale. */
  val Scale: Double = 1048576.0

  override def zero: CentroidBuf = CentroidBuf(new Array[Long](dim), new Array[Boolean](dim), 0L)

  override def reduce(b: CentroidBuf, v: Seq[Float]): CentroidBuf = {
    val s = b.sums
    var i = 0
    val n = math.min(dim, v.length)
    while (i < n) {
      val x = v(i).toDouble
      val q = x * Scale
      // NaN/Inf AND finite-but-absurd components surface as NaN
      // dimensions: beyond ±2^40 the fixed-point sum could overflow
      // across merges (silent wrap), and no real embedding component is
      // ~1e6 — corrupt ingest has to stay visible, not quantize/wrap
      if (java.lang.Double.isFinite(q) && math.abs(q) <= (1L << 40).toDouble)
        s(i) += math.floor(q).toLong
      else b.bad(i) = true
      i += 1
    }
    CentroidBuf(s, b.bad, b.n + 1)
  }

  override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
    val s = a.sums
    var i = 0
    while (i < dim) {
      s(i) += b.sums(i)
      a.bad(i) |= b.bad(i)
      i += 1
    }
    CentroidBuf(s, a.bad, a.n + b.n)
  }

  override def finish(r: CentroidBuf): Centroid =
    if (r.n == 0) Centroid(Seq.empty)
    else Centroid(r.sums.indices.map(i =>
      if (r.bad(i)) Double.NaN else (r.sums(i).toDouble / r.n) / Scale))

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
  override def outputEncoder: Encoder[Centroid] = Encoders.product[Centroid]
}
