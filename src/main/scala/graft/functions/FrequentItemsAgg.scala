package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer: the Misra–Gries summary — at most k (item, counter) entries. */
final case class MGBuf(counters: Map[String, Long])

/** Typed `Aggregator` maintaining a Misra–Gries frequent-items summary of
  * capacity k — the sketch half of two-pass distributed heavy hitters.
  *
  * Contract (the mergeable-summaries bound): after summarizing n items,
  * every estimate satisfies `true − n/(k+1) ≤ est ≤ true`, so EVERY item
  * with true frequency > n/(k+1) is present in the summary. A query that
  * wants "all items with count ≥ s·n" picks k ≥ ⌈1/s⌉ − 1, takes the
  * summary's keys as a candidate set (≤ k of them, broadcastable), and
  * exact-counts ONLY the candidates in a second pass — turning a
  * full-vocabulary groupBy (shuffle keyed on every distinct item, the
  * classic hot-vocabulary blowup at 100 TB) into one fixed-size sketch
  * reduction plus one broadcast-semi-joined count. The final result is
  * EXACT (the sketch only prunes), which is what makes the two-pass query
  * oracle-checkable.
  *
  * Reduce is amortized O(1): the all-counter decrement on overflow costs
  * O(k) but can happen at most n/(k+1) times. Merge sums summaries then
  * subtracts the (k+1)-th largest counter from all (Agarwal et al.,
  * "Mergeable Summaries"), so partial aggregation runs map-side and the
  * result is a valid summary of the union regardless of partitioning.
  *
  * Reference parity: callysto users count frequencies imperatively in
  * agent closures over table state (examples/src/basic.rs:29-31 counters);
  * an unbounded per-key table is exactly what this sketch avoids.
  */
final class FrequentItemsAgg(k: Int) extends Aggregator[String, MGBuf, Map[String, Long]] {
  require(k > 0, "capacity k must be positive")

  override def zero: MGBuf = MGBuf(Map.empty)

  override def reduce(b: MGBuf, item: String): MGBuf = {
    if (item == null) return b
    val m = b.counters
    m.get(item) match {
      case Some(c) => MGBuf(m.updated(item, c + 1))
      case None if m.size < k => MGBuf(m.updated(item, 1L))
      case None =>
        // decrement every counter (the new item's +1 cancels against one
        // decrement); drop zeros — at most n/(k+1) of these over the run
        MGBuf(m.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None })
    }
  }

  override def merge(a: MGBuf, b: MGBuf): MGBuf = {
    if (b.counters.isEmpty) return a
    if (a.counters.isEmpty) return b
    val summed = b.counters.foldLeft(a.counters) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    if (summed.size <= k) MGBuf(summed)
    else {
      // subtract the (k+1)-th largest counter from all, keep positives:
      // ≤ k survive, and the subtraction preserves the error bound
      val cut = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      MGBuf(summed.flatMap { case (i, c) => if (c > cut) Some(i -> (c - cut)) else None })
    }
  }

  override def finish(r: MGBuf): Map[String, Long] = r.counters

  override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
