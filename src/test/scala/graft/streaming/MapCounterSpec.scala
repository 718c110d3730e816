package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** MapState sub-map counters: per-(key, subkey) point increments
  * accumulate across micro-batches and survive a checkpoint restart —
  * without ever rewriting a key's whole sub-map.
  */
class MapCounterSpec extends SparkSpec {

  test("per-subkey counts accumulate across batches and survive restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val in = MemoryStream[SubEvent]
    val collected = mutable.ArrayBuffer.empty[SubCount]
    val ckpt = Files.createTempDirectory("graft-mapcounter").toString

    def start() = MapCounter.counts(in.toDS())
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[SubCount], _: Long) =>
        collected.synchronized { collected ++= ds.collect() }; ()
      }
      .start()

    val q1 = start()
    in.addData(
      SubEvent("u1", "click"), SubEvent("u1", "click"), SubEvent("u1", "view"),
      SubEvent("u2", "click"))
    q1.processAllAvailable()

    // batch 1 changelog: only touched pairs, with their NEW totals
    val b1 = collected.synchronized(collected.toList).map(c => (c.key, c.sub) -> c.count).toMap
    assert(b1 === Map(("u1", "click") -> 2L, ("u1", "view") -> 1L, ("u2", "click") -> 1L))
    q1.stop()

    // restart: increments continue FROM the restored sub-map
    val q2 = start()
    in.addData(SubEvent("u1", "click"), SubEvent("u2", "purchase"))
    q2.processAllAvailable()
    q2.stop()

    val b2 = collected.synchronized(collected.toList).drop(3)
      .map(c => (c.key, c.sub) -> c.count).toMap
    assert(b2 === Map(("u1", "click") -> 3L, ("u2", "purchase") -> 1L),
      s"expected restored counts to keep growing; got $b2")
  }
}
