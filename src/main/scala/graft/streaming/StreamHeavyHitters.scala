package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One stream item routed to a sketch bucket. */
final case class HhItem(bucket: Int, item: String)

/** A surviving sketch entry after a micro-batch: the MG lower-bound count
  * and the bucket's total item count (the error bound's denominator).
  */
final case class HhEntry(bucket: Int, item: String, minCount: Long, bucketTotal: Long)

/** CONTINUOUS heavy hitters: a Misra–Gries summary per bucket held in
  * keyed state — the BOUNDED-state answer to "top items over an unbounded
  * stream", where [[MapCounterProcessor]]'s exact per-subkey counts grow
  * with distinct items forever. Capacity `c` caps state at c entries per
  * bucket; the classic guarantee holds per bucket: any item with true
  * count > bucketTotal/(c+1) SURVIVES in the summary, and a surviving
  * entry's count underestimates truth by at most bucketTotal/(c+1).
  *
  * Two-level scale shape: items hash-partition into buckets (every
  * occurrence of an item lands in ONE bucket, so per-bucket MG sees its
  * items' full stream); buckets spread the state across executors, and a
  * downstream per-batch aggregation of the emitted entries yields global
  * top-k. This is the streaming sibling of the batch two-pass
  * [[graft.operators.FrequentItems]] (same sketch, same bound — there
  * verified by exact recount, here carried as state across batches and
  * restarts).
  *
  * The MG decrement step is implemented as a SHARED offset ("debt")
  * subtracted lazily at read time instead of an O(c) rewrite of every
  * entry per overflow: entry survival and the count lower bound are
  * identical to textbook MG; an overflow costs O(1) plus a compaction
  * scan only when a slot might have freed — never worse than textbook's
  * O(c) decrement-all, usually far less.
  */
class HeavyHittersProcessor(capacity: Int)
    extends StatefulProcessor[Int, HhItem, HhEntry] {

  @transient private var counts: MapState[String, Long] = _
  @transient private var meta: MapState[String, Long] = _ // "__debt", "__total", "__size"

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    counts = getHandle.getMapState[String, Long](
      "mg", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    meta = getHandle.getMapState[String, Long](
      "mgMeta", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  private def metaGet(k: String): Long = if (meta.containsKey(k)) meta.getValue(k) else 0L

  override def handleInputRows(
      key: Int,
      rows: Iterator[HhItem],
      timerValues: TimerValues
  ): Iterator[HhEntry] = {
    var debt = metaGet("__debt")
    var total = metaGet("__total")
    var size = metaGet("__size")
    // drop dead entries (stored count at/below the debt line) and refresh
    // the live-entry count — called when capacity LOOKS full, because debt
    // bumps kill entries without updating `size`
    def compact(): Unit = {
      var s = 0L
      counts.iterator().foreach { case (k, v) =>
        if (v - debt > 0L) s += 1L else counts.removeKey(k)
      }
      size = s
    }
    var lastCompactDebt = -1L
    rows.foreach { r =>
      total += 1L
      val stored = if (counts.containsKey(r.item)) counts.getValue(r.item) else -1L
      if (stored - debt > 0L) {
        counts.updateValue(r.item, stored + 1L) // live entry: count up
      } else {
        if (size >= capacity && debt != lastCompactDebt) {
          compact() // dead/absent needs a slot; debt bumps may have freed one
          lastCompactDebt = debt
        }
        if (size < capacity) {
          counts.updateValue(r.item, debt + 1L) // stored counts are debt-relative
          size += 1L
        } else {
          // MG decrement-all in O(1): raise the shared debt; entries that
          // sink to the debt line die (dropped by the next compact)
          debt += 1L
        }
      }
    }
    // compact: remove dead entries so `size` frees up for future batches
    val live = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    counts.iterator().foreach { case (k, v) =>
      val c = v - debt
      if (c > 0L) live += ((k, c)) else counts.removeKey(k)
    }
    // re-base stored values when debt grows large to keep longs far from
    // overflow on century-long streams
    if (debt > (1L << 40)) {
      live.foreach { case (k, c) => counts.updateValue(k, c) }
      debt = 0L
    }
    meta.updateValue("__debt", debt)
    meta.updateValue("__total", total)
    meta.updateValue("__size", live.size.toLong)
    val t = total
    live.sortBy { case (k, c) => (-c, k) }
      .map { case (k, c) => HhEntry(key, k, c, t) }
      .iterator
  }
}

object StreamHeavyHitters {

  /** Continuous bounded-state heavy hitters over a stream of items.
    *
    * @param nBuckets sketch parallelism (items hash to one bucket each)
    * @param capacity MG entries per bucket; per-bucket error bound is
    *                 bucketTotal/(capacity+1)
    */
  def track(ds: Dataset[String], nBuckets: Int, capacity: Int): Dataset[HhEntry] = {
    implicit val outEnc = Encoders.product[HhEntry]
    implicit val inEnc = Encoders.product[HhItem]
    ds.map(s => HhItem(math.floorMod(s.hashCode, nBuckets), s))
      .groupByKey(_.bucket)(Encoders.scalaInt)
      .transformWithState(
        new HeavyHittersProcessor(capacity), TimeMode.None(), OutputMode.Update())
  }
}
