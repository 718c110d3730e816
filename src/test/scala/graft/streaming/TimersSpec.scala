package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Per-key event-time timers (streaming/Timers.scala): idle sessions
  * close exactly when the watermark passes last-event + gap, extended
  * sessions move their timer instead of firing it.
  */
class TimersSpec extends SparkSpec {

  test("idle sessions close on timer expiry; extended sessions re-arm instead of firing") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[KeyedTick]
    val collected = mutable.ArrayBuffer.empty[SessionClosed]
    val ckpt = Files.createTempDirectory("graft-timers").toString

    val q = Timers
      .idleSessions(input.toDS(), gapMs = 5000L)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[SessionClosed], _: Long) =>
        collected.synchronized { collected ++= ds.collect() }; ()
      }
      .start()

    def tick(k: String, ms: Long) = KeyedTick(k, new Timestamp(ms))

    // batch 1: two sessions open; timers armed at 6s (k1) and 7s (k2)
    input.addData(tick("k1", 1000L), tick("k2", 2000L))
    q.processAllAvailable()
    assert(collected.isEmpty, "nothing may close before the watermark reaches an expiry")

    // batch 2: k1 extends at 30s — its 6s timer must be DELETED, not fired;
    // watermark advances to 30s
    input.addData(tick("k1", 30000L))
    q.processAllAvailable()

    // batch 3: unrelated key at 60s. The data batch runs with watermark 30s
    // (fires k2's 7s timer); the watermark then advances to 60s and the
    // follow-up no-data batch fires k1's re-armed 35s timer — timers fire
    // as the watermark passes them, they do NOT wait for more input data.
    input.addData(tick("k3", 60000L))
    q.processAllAvailable()
    val afterB3 = collected.synchronized(collected.toList)
    assert(afterB3.toSet == Set(SessionClosed("k2", 1L, 2000L), SessionClosed("k1", 2L, 30000L)),
      s"expected k2(1 event) and k1(2 events, extended) closed, got $afterB3")
    assert(!afterB3.exists(c => c.key == "k1" && c.n_events == 1L),
      "k1's deleted first timer fired a spurious 1-event close")

    // batch 4: watermark reaches 100s — k3's 65s timer fires; k4 (105s
    // expiry vs watermark 100s) stays open
    input.addData(tick("k4", 100000L))
    q.processAllAvailable()
    q.stop()
    val finalOut = collected.synchronized(collected.toList)
    assert(finalOut.contains(SessionClosed("k3", 1L, 60000L)),
      s"k3 must close once the watermark passes its gap, got $finalOut")
    assert(finalOut.size == 3, s"exactly three sessions close, got $finalOut")
    assert(!finalOut.exists(_.key == "k4"), "k4's gap never elapsed under the watermark")
  }

  test("armed timers survive a checkpoint restart and fire with the restored session") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[KeyedTick]
    val collected = mutable.ArrayBuffer.empty[SessionClosed]
    val ckpt = Files.createTempDirectory("graft-timers-recovery").toString

    def start() = Timers
      .idleSessions(input.toDS(), gapMs = 5000L)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[SessionClosed], _: Long) =>
        collected.synchronized { collected ++= ds.collect() }; ()
      }
      .start()

    val q1 = start()
    input.addData(KeyedTick("r1", new java.sql.Timestamp(1000L)),
      KeyedTick("r1", new java.sql.Timestamp(2000L)))
    q1.processAllAvailable()
    q1.stop()
    assert(collected.isEmpty, "session must still be open at shutdown")

    // restart from the checkpoint; only a watermark-advancing event arrives
    input.addData(KeyedTick("r2", new java.sql.Timestamp(60000L)))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val out = collected.synchronized(collected.toList)
    // r1's 7s timer was armed BEFORE the restart; its firing with the full
    // 2-event session proves both the accumulator and the timer registry
    // were restored from the checkpointed store
    assert(out == List(SessionClosed("r1", 2L, 2000L)),
      s"expected r1 to close post-restart with its pre-restart session, got $out")
  }
}
