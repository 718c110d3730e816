package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.engine.Graft
import graft.streaming.{MapCounter, SubEvent}

/** State-store micro-bench: 1M (key, subkey) increments through the
  * MapCounter `transformWithState` processor on the RocksDB provider —
  * the write-path shape of the reference's hottest store use
  * (table.rs counter patterns over rocksdb.rs).
  *
  * Measures the RocksDB tuning knobs in [[Graft.session]]
  * (rocksdb.rs:35-41,127-153 parity): run once as-is ("tuned") and once
  * with SPARK_GRAFT_ROCKSDB_TUNING=off ("untuned", Spark defaults) in
  * SEPARATE JVMs (session configs freeze at first build). Results are
  * recorded in BASELINE.md.
  *
  * Env: SPARK_GRAFT_STATE_KEYS (default 100000 distinct keys),
  * SPARK_GRAFT_STATE_SUBS (default 10 subkeys per key — 1M state entries
  * at the defaults), SPARK_GRAFT_STATE_BATCHES (default 4).
  */
object StateBench {

  /** foreachBatch must capture through a static holder (serialized). */
  object RowsSeen {
    val n = new java.util.concurrent.atomic.AtomicLong(0)
  }

  def main(args: Array[String]): Unit = {
    val nKeys = sys.env.getOrElse("SPARK_GRAFT_STATE_KEYS", "100000").toInt
    val nSubs = sys.env.getOrElse("SPARK_GRAFT_STATE_SUBS", "10").toInt
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STATE_BATCHES", "4").toInt
    val mode =
      if (sys.env.get("SPARK_GRAFT_ROCKSDB_TUNING").contains("off")) "untuned" else "tuned"
    val spark = Graft.session(s"graft-state-bench-$mode")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val total = nKeys.toLong * nSubs
    val perBatch = (total / nBatches).toInt
    val in = MemoryStream[SubEvent]
    val ck = java.nio.file.Files.createTempDirectory("graft-state-bench").toString
    val q = MapCounter.counts(in.toDS())
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.SubCount], _: Long) =>
        RowsSeen.n.addAndGet(df.count())
        ()
      }

    // every (key, sub) pair exactly once: fresh state entry per row — the
    // 1M-key cold-write worst case, spread over nBatches commits
    val t0 = System.nanoTime()
    var off = 0L
    var started: Option[org.apache.spark.sql.streaming.StreamingQuery] = None
    (0 until nBatches).foreach { bi =>
      val rows = (0 until perBatch).map { i =>
        val g = off + i
        SubEvent(s"k${g / nSubs}", s"s${g % nSubs}")
      }
      in.addData(rows)
      off += perBatch
      started match {
        case None =>
          val query = q.start()
          query.awaitTermination() // AvailableNow drains then stops
          started = Some(query)
        case Some(_) =>
          val query = q.start()
          query.awaitTermination()
      }
    }
    val sec = (System.nanoTime() - t0) / 1e9
    // snapshot BEFORE the restart phase: `emitted` must cover exactly the
    // write-path rows that `entries`/`entries_per_sec` cover, or the
    // emitted-vs-entries sanity relation breaks and the field stops being
    // comparable to pre-round-12 artifacts (round-12 ADVICE)
    val writeEmitted = RowsSeen.n.get

    // Restart-recovery latency (round-11 verdict #6): one tiny batch
    // through a FRESH query on the same checkpoint. The stateful operator
    // must reload all `off` state entries before committing — with
    // changelog checkpointing ON that is snapshot + changelog-file replay
    // (the reference's changelog-topic recovery shape, recovery.rs:51-99);
    // with SPARK_GRAFT_CHANGELOG=off it is a full-snapshot reload. Run
    // both modes in separate JVMs and diff restart_sec.
    in.addData((0 until 1000).map(i => SubEvent(s"k${i % nKeys}", "s0")))
    val tR = System.nanoTime()
    val rq = q.start()
    rq.awaitTermination()
    val restartSec = (System.nanoTime() - tR) / 1e9

    val clMode =
      if (sys.env.get("SPARK_GRAFT_CHANGELOG").contains("off")) "snapshot" else "changelog"
    spark.stop()
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.OFF)
    println(
      s"""{"metric":"state_increments","mode":"$mode","checkpoint_mode":"$clMode",""" +
        s""""entries":$off,"emitted":$writeEmitted,"batches":$nBatches,"sec":$sec,""" +
        s""""entries_per_sec":${(off / sec).toLong},"restart_sec":$restartSec,""" +
        s""""restart_emitted":${RowsSeen.n.get - writeEmitted}}""")
    System.out.flush()
  }
}
