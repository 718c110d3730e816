package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ListState}

/** One keyed long observation. */
final case class KeyedValue(key: String, v: Long)

/** A key's bounded recent-history window after a batch of appends. */
final case class RecentWindow(key: String, recent: Seq[Long])

/** Per-key bounded event log on `ListState` — the third state shape next
  * to the ValueState table (StateTable.scala) and timers (Timers.scala):
  * callysto users model "recent events per key" as a table of Vec values,
  * rewriting the whole Vec per message (bincode has no append); ListState
  * appends WITHOUT reading existing entries (RocksDB merge operand), so
  * per-event cost is O(1) — the difference between an append log and a
  * read-modify-write at 100 TB event rates. The bound is enforced lazily:
  * the list is trimmed only when it exceeds `2·n` (a put of n rows),
  * amortizing the rewrite over n appends instead of paying it per event.
  *
  * Emits each key's current last-`n` window once per micro-batch.
  */
class RecentNProcessor(n: Int)
    extends StatefulProcessor[String, KeyedValue, RecentWindow] {
  require(n > 0, "window size must be positive")

  @transient private var log: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    log = getHandle.getListState[Long]("log", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[KeyedValue],
      timerValues: TimerValues
  ): Iterator[RecentWindow] = {
    rows.foreach(r => log.appendValue(r.v))
    val all = log.get().toArray
    val recent = if (all.length > n) all.takeRight(n) else all
    if (all.length > 2 * n) log.put(recent)
    Iterator.single(RecentWindow(key, recent.toSeq))
  }
}

object RecentN {

  /** Track the last `n` values per key across a stream. */
  def windows(ds: Dataset[KeyedValue], n: Int): Dataset[RecentWindow] = {
    implicit val outEnc = Encoders.product[RecentWindow]
    ds.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new RecentNProcessor(n), TimeMode.None(), OutputMode.Update())
  }
}
