package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Source-side backpressure: a backlog drains as BOUNDED micro-batches
  * under `maxFilesPerTrigger` — the burst-safety the reference lacks (its
  * consumer channel is unbounded, callysto/src/kafka/cconsumer.rs:69; its
  * sinks bound only their own buffers). One giant catch-up batch is how a
  * restart against a week of backlog kills executors at 100 TB.
  */
class BackpressureSpec extends SparkSpec {

  test("a 4-file backlog drains as >=4 bounded batches under maxFilesPerTrigger=1") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-bp").resolve("in").toString

    // backlog: 4 separate single-file commits of 5 rows each
    val template = (1L to 5L).toDF("v")
    (0 until 4).foreach { i =>
      (1L to 5L).map(_ + i * 100).toDF("v").repartition(1)
        .write.mode("append").parquet(dir)
    }

    val batches = mutable.ArrayBuffer.empty[Long]
    val q = Sources.parquetDir(s, dir, template, maxFilesPerTrigger = Some(1))
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow()) // drain the whole backlog, then stop
      .option("checkpointLocation", Files.createTempDirectory("graft-bp-ck").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = df.count()
        if (n > 0) batches.synchronized { batches += n }; ()
      }
      .start()
    q.awaitTermination()

    val got = batches.synchronized(batches.toList)
    assert(got.sum === 20L, s"backlog must drain completely, got $got")
    assert(got.size >= 4, s"expected >=4 bounded batches (one per file), got $got")
    assert(got.forall(_ <= 5L), s"a batch exceeded the single-file bound: $got")
  }
}
