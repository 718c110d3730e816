package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Bounded per-key event log on ListState (streaming/RecentN.scala). */
class RecentNSpec extends SparkSpec {

  test("keeps exactly the last n values per key in arrival order, across batches and restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[KeyedValue]
    val collected = mutable.ArrayBuffer.empty[RecentWindow]
    val ckpt = Files.createTempDirectory("graft-recentn").toString

    def start() = RecentN
      .windows(input.toDS(), n = 3)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[RecentWindow], _: Long) =>
        collected.synchronized { collected ++= ds.collect() }; ()
      }
      .start()

    val q1 = start()
    input.addData(KeyedValue("a", 1L), KeyedValue("a", 2L), KeyedValue("b", 10L))
    q1.processAllAvailable()
    input.addData(KeyedValue("a", 3L), KeyedValue("a", 4L))
    q1.processAllAvailable()
    q1.stop()

    val byBatch = collected.synchronized(collected.toList)
    assert(byBatch.contains(RecentWindow("a", Seq(1L, 2L))), s"first window wrong: $byBatch")
    assert(byBatch.contains(RecentWindow("b", Seq(10L))))
    assert(byBatch.contains(RecentWindow("a", Seq(2L, 3L, 4L))),
      s"window must slide to the last 3 in arrival order: $byBatch")

    // restart: the log survives the checkpoint; 7 total appends for 'a'
    // exercise the lazy 2n trim at least once
    input.addData(KeyedValue("a", 5L), KeyedValue("a", 6L), KeyedValue("a", 7L))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val finalA = collected.synchronized(collected.toList).last
    assert(finalA == RecentWindow("a", Seq(5L, 6L, 7L)),
      s"post-restart window must continue the pre-restart log: $finalA")
  }
}
