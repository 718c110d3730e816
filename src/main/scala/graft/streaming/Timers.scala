package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One keyed event on the engine's clock (event time). */
final case class KeyedTick(key: String, ts: java.sql.Timestamp)

/** Per-key session accumulator: event count + latest event time (ms). */
final case class SessAcc(n: Long, maxTsMs: Long)

/** A closed idle session: no events for the gap after `last_ts_ms`. */
final case class SessionClosed(key: String, n_events: Long, last_ts_ms: Long)

/** PER-KEY timers on keyed state — the reference's `timer` semantics
  * (callysto/src/types/timer.rs:23-80) at table granularity instead of
  * app granularity: callysto users combine a table_agent with a timer
  * service scanning the table for idle keys; here each key arms its OWN
  * event-time timer in the state store and the runtime calls back exactly
  * when the watermark passes it. `Trigger.ProcessingTime` on agents covers
  * the app-level timer (AgentsSpec); this covers the keyed one.
  *
  * The processor closes idle sessions: every input extends the key's
  * session and re-arms its timer at (latest event + gap); when the timer
  * fires with no newer event having moved it, the session is emitted and
  * state cleared. Timers live in the state store, so they survive
  * checkpoint restarts like any other state, and each fires on the
  * shuffle partition that owns the key — no driver-side scanning, no
  * global scheduling structure: the 100 TB shape for "do something when a
  * key goes quiet" (abandoned carts, device-offline alerts, session cuts).
  */
class IdleSessionProcessor(gapMs: Long)
    extends StatefulProcessor[String, KeyedTick, SessionClosed] {

  @transient private var acc: ValueState[SessAcc] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    acc = getHandle.getValueState[SessAcc]("sess", Encoders.product[SessAcc], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[KeyedTick],
      timerValues: TimerValues
  ): Iterator[SessionClosed] = {
    val prev = if (acc.exists()) Some(acc.get()) else None
    var n = prev.map(_.n).getOrElse(0L)
    var mx = prev.map(_.maxTsMs).getOrElse(Long.MinValue)
    rows.foreach { r =>
      n += 1
      mx = math.max(mx, r.ts.getTime)
    }
    // re-arm: exactly one live timer per key (the old one is deleted, not
    // left to fire as a stale close)
    prev.foreach(p => getHandle.deleteTimer(p.maxTsMs + gapMs))
    getHandle.registerTimer(mx + gapMs)
    acc.update(SessAcc(n, mx))
    Iterator.empty
  }

  override def handleExpiredTimer(
      key: String,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo
  ): Iterator[SessionClosed] = {
    val cur = if (acc.exists()) Some(acc.get()) else None
    cur match {
      case Some(a) if a.maxTsMs + gapMs == expiredTimerInfo.getExpiryTimeInMs() =>
        acc.clear()
        Iterator.single(SessionClosed(key, a.n, a.maxTsMs))
      case _ => Iterator.empty // stale timer for an already-extended session
    }
  }
}

object Timers {

  /** Close sessions idle for `gapMs`, watermark-driven. Input must carry
    * event time in `ts`; `watermarkDelay` is the usual lateness bound.
    */
  def idleSessions(
      ticks: Dataset[KeyedTick],
      gapMs: Long,
      watermarkDelay: String = "0 seconds"
  ): Dataset[SessionClosed] = {
    implicit val closedEnc = Encoders.product[SessionClosed]
    ticks
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)(Encoders.STRING)
      .transformWithState(
        new IdleSessionProcessor(gapMs),
        TimeMode.EventTime(),
        OutputMode.Append()
      )
  }
}
