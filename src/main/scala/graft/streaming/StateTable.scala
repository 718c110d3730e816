package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One table mutation — the engine analog of callysto's changelog envelope
  * `ChangelogKey { op: Add|Discard|Update, serialized_key }` (reference:
  * callysto/src/runtime/changelog.rs:18-35). `value = None` with op=del is
  * the tombstone (empty changelog payload, table.rs:374).
  */
final case class StateOp[K, V](key: K, value: Option[V], op: String)

object StateOp {
  val Set = "set"
  val Del = "del"
  def set[K, V](key: K, value: V): StateOp[K, V] = StateOp(key, Some(value), Set)
  def del[K, V](key: K): StateOp[K, V] = StateOp(key, None, Del)
}

/** One applied change. `prev` is the state value BEFORE the op — it makes
  * recovery observable: after a checkpoint restart, the first `set` on a
  * key must report the pre-restart value as `prev`, which is only possible
  * if the state store was restored (recovery path of
  * callysto/src/runtime/recovery.rs:51-99, which Spark serves from the
  * checkpoint instead of a changelog topic replay).
  */
final case class StateChange[K, V](key: K, value: Option[V], prev: Option[V], deleted: Boolean)

/** CTable parity (`CTable::get/set/del`, reference:
  * callysto/src/types/table.rs:79-113) on Structured Streaming keyed state.
  *
  * Architecture mapping (SURVEY.md §2.1 P4-P11):
  *   - per-partition RocksDB shards  → one state store per shuffle
  *     partition (RocksDBStateStoreProvider; config, not code);
  *   - changelog topic + replay      → checkpoint commit log + automatic
  *     restore on restart (atomic with offsets — the exactly-once the
  *     reference stubs at table.rs:149-159);
  *   - bincode K/V serde             → Spark Encoders.
  *
  * The processor consumes an op stream and emits the applied changelog —
  * downstream sinks subscribe to it exactly like a compacted changelog
  * topic consumer.
  */
class StateTableProcessor[K, V](valueEnc: Encoder[V], ttl: Option[java.time.Duration] = None)
    extends StatefulProcessor[K, StateOp[K, V], StateChange[K, V]] {

  @transient private var state: ValueState[V] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[V](
      "value", valueEnc, ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))

  override def handleInputRows(
      key: K,
      rows: Iterator[StateOp[K, V]],
      timerValues: TimerValues
  ): Iterator[StateChange[K, V]] =
    rows.map { op =>
      // Option(get()) rather than exists()+get(): on a TTL'd ValueState
      // the two must agree, and get() is the read that actually applies
      // the expiration filter.
      val prev = Option(state.get())
      op.op match {
        case StateOp.Set =>
          val v = op.value.getOrElse(throw new IllegalArgumentException("set requires a value"))
          state.update(v)
          StateChange(key, Some(v), prev, deleted = false)
        case StateOp.Del =>
          state.clear()
          StateChange(key, None, prev, deleted = true)
        case other =>
          throw new IllegalArgumentException(s"unknown table op: $other")
      }
    }
}

object StateTable {

  /** Apply an op stream (or batch) to keyed state, returning the applied
    * changelog. Streaming: `transformWithState` with update-mode semantics.
    *
    * `ttl` bounds per-key state lifetime by PROCESSING time: a key idle
    * longer than the TTL reads as absent (its next set reports
    * `prev = None`) and its storage is reclaimed — the retention knob a
    * 100 TB keyed-state deployment needs when keys churn (the reference's
    * RocksDB store grows forever; callysto/src/stores/rocksdb.rs has no
    * expiry). TTL requires TimeMode.ProcessingTime.
    */
  def changes[K, V](
      ops: Dataset[StateOp[K, V]],
      ttl: Option[java.time.Duration] = None
  )(implicit
      kEnc: Encoder[K],
      vEnc: Encoder[V],
      cEnc: Encoder[StateChange[K, V]]
  ): Dataset[StateChange[K, V]] =
    ops
      .groupByKey(_.key)
      .transformWithState(
        new StateTableProcessor[K, V](vEnc, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update()
      )

  /** Batch snapshot with upsert semantics: the latest row per key wins —
    * the queryable analog of reading a compacted changelog topic end to
    * end (what a callysto table materializes; examples/src/inmemory.rs
    * `table.set(num, num, msg)` keeps last-write-per-key).
    *
    * `orderCols` must be a deterministic total order (ties broken) for the
    * "latest" row to be well-defined.
    */
  def snapshot(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
