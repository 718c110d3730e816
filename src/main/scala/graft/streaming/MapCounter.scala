package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One keyed sub-event: (key, subkey) occurrence to count. */
final case class SubEvent(key: String, sub: String)

/** A (key, subkey) counter value after a batch of increments. */
final case class SubCount(key: String, sub: String, count: Long)

/** Per-key sub-map counters on `MapState` — the fourth state shape next to
  * the ValueState table (StateTable.scala), per-key timers (Timers.scala)
  * and the ListState event log (RecentN.scala): a nested KV
  * `key → {subkey → count}`. Callysto users model this as a table whose
  * VALUE is a whole HashMap — bincode re-serializes the entire map on
  * every increment (reference: callysto/src/types/table.rs:86-113, any
  * `table.set(k, map, msg)` pattern); MapState reads and writes ONE
  * subkey, so a key with a million subkeys pays O(1) per increment, not
  * O(|map|) — the difference between a counter service and a rewrite
  * storm at 100 TB event rates.
  *
  * Emits the new count of every (key, sub) touched in the micro-batch —
  * an update-mode changelog like StateTable's.
  */
class MapCounterProcessor
    extends StatefulProcessor[String, SubEvent, SubCount] {

  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long](
      "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[SubEvent],
      timerValues: TimerValues
  ): Iterator[SubCount] = {
    val touched = scala.collection.mutable.LinkedHashSet.empty[String]
    rows.foreach { r =>
      val cur = if (counts.containsKey(r.sub)) counts.getValue(r.sub) else 0L
      counts.updateValue(r.sub, cur + 1L)
      touched += r.sub
    }
    // materialize BEFORE returning: the output iterator may be drained
    // after the executor's implicit key context has moved on, and state
    // reads are only valid for the current key
    touched.toList.map(sub => SubCount(key, sub, counts.getValue(sub))).iterator
  }
}

object MapCounter {

  /** Count (key, subkey) occurrences across a stream with per-subkey
    * point updates.
    */
  def counts(ds: Dataset[SubEvent]): Dataset[SubCount] = {
    implicit val outEnc = Encoders.product[SubCount]
    ds.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new MapCounterProcessor, TimeMode.None(), OutputMode.Update())
  }
}
