package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One keyed occurrence at an event time (epoch ms). */
final case class DecayEvent(key: String, ts: Long)

/** A key's trending score anchored at `anchorTs` (its latest seen event
  * time): `score = Σ over events 2^(-(anchorTs - t_i) / halfLifeMs)`.
  */
final case class DecayScore(key: String, anchorTs: Long, score: Double)

/** Exponentially-decayed per-key counters — the "trending" metric every
  * feed/abuse/ranking system keeps: each occurrence contributes 1 at its
  * own event time and halves every `halfLifeMs` thereafter. State is TWO
  * numbers per key (anchor timestamp + score at anchor), not an event
  * log: fold-in is O(1) per event.
  *
  * The maintained quantity is the SUM Σ 2^(-(anchor - t_i)/hl), which is
  * arrival-order-INDEPENDENT: a newer event re-anchors (decay the score
  * forward, add 1), an out-of-order straggler adds its already-decayed
  * contribution under the current anchor — either way the state equals
  * the definition over the event multiset, so replays of reordered
  * batches converge to the same score (spec asserts against the formula
  * computed independently).
  *
  * Reference analog: callysto users hand-roll this as a table of
  * (ts, score) pairs updated in agent closures; here it is a keyed
  * StatefulProcessor with the same RocksDB-backed recovery as every
  * other state shape. Readouts anchor at each key's LATEST event; a
  * consumer comparing keys at wall-clock T decays each emitted score by
  * 2^(-(T - anchorTs)/hl) — a pure column expression, no state.
  */
class DecayCounterProcessor(halfLifeMs: Long)
    extends StatefulProcessor[String, DecayEvent, DecayScore] {

  @transient private var state: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Double)](
      "decay", Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[DecayEvent],
      timerValues: TimerValues
  ): Iterator[DecayScore] = {
    var (anchor, score) =
      if (state.exists()) state.get() else (Long.MinValue, 0.0)
    rows.foreach { e =>
      if (anchor == Long.MinValue) { anchor = e.ts; score = 1.0 }
      else if (e.ts >= anchor) {
        score = score * halve(e.ts - anchor) + 1.0
        anchor = e.ts
      } else {
        score += halve(anchor - e.ts) // straggler: decayed contribution
      }
    }
    state.update((anchor, score))
    Iterator.single(DecayScore(key, anchor, score))
  }

  private def halve(dtMs: Long): Double =
    math.pow(0.5, dtMs.toDouble / halfLifeMs)
}

object DecayCounter {

  /** Track per-key exponentially-decayed counts (half-life in ms). */
  def track(ds: Dataset[DecayEvent], halfLifeMs: Long): Dataset[DecayScore] = {
    implicit val outEnc = Encoders.product[DecayScore]
    ds.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(
        new DecayCounterProcessor(halfLifeMs), TimeMode.None(), OutputMode.Update())
  }
}
