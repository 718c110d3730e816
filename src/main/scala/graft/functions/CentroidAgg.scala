package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer: per-dimension running sums + count. */
final case class CentroidBuf(sums: Array[Double], n: Long)

/** Output wrapper (product type so the result has a stable Encoder). */
final case class Centroid(values: Seq[Double])

/** Typed `Aggregator` computing the element-wise mean (centroid) of an
  * embedding column per group — the engine's custom-UDAF extension surface
  * (SURVEY.md §2.6 last row; the reference's analog is any fold a user
  * writes in an agent closure over its table state).
  *
  * The centroid is the building block of IVF-style ANN (cluster centers =
  * coarse quantizer) and of drift monitoring over embedding corpora. Merge
  * is associative/commutative (per-dimension double sums), so partial
  * aggregation runs map-side — one shuffle row per (group, 64 doubles)
  * regardless of corpus size: the 100 TB-safe shape.
  *
  * Numeric note: double summation order varies with partitioning, so
  * results are deterministic only to ~1 ulp × log(n); consumers (and the
  * DuckDB oracle) round to a tolerance-insensitive precision.
  */
final class CentroidAgg(dim: Int) extends Aggregator[Seq[Float], CentroidBuf, Centroid] {

  override def zero: CentroidBuf = CentroidBuf(new Array[Double](dim), 0L)

  override def reduce(b: CentroidBuf, v: Seq[Float]): CentroidBuf = {
    val s = b.sums
    var i = 0
    val n = math.min(dim, v.length)
    while (i < n) { s(i) += v(i).toDouble; i += 1 }
    CentroidBuf(s, b.n + 1)
  }

  override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
    val s = a.sums
    var i = 0
    while (i < dim) { s(i) += b.sums(i); i += 1 }
    CentroidBuf(s, a.n + b.n)
  }

  override def finish(r: CentroidBuf): Centroid =
    if (r.n == 0) Centroid(Seq.empty)
    else Centroid(r.sums.toSeq.map(_ / r.n.toDouble))

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
  override def outputEncoder: Encoder[Centroid] = Encoders.product[Centroid]
}
