package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Event-time semantics under streaming execution: watermark-gated late
  * data drop on tumbling windows, and streaming deduplication — the
  * behaviors a batch oracle cannot check.
  */
class StreamOpsSpec extends SparkSpec {

  test("tsFromNanos is exact for ns epochs beyond double's 2^53 range") {
    val s = spark
    import s.implicits._
    // exact-microsecond ns values that double division rounds off by 1 us
    val vals = Seq(1754000000000016000L, 1754000000000015000L,
      1704067200000000000L, 9007199254740993000L)
    vals.toDF("ns")
      .select($"ns", unix_micros(StreamOps.tsFromNanos($"ns")).as("us"))
      .collect()
      .foreach(r => assert(r.getLong(1) === r.getLong(0) / 1000))
  }

  test("tumbling window finalizes on watermark and drops late data") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Long, String)]
    val rows = mutable.ArrayBuffer.empty[Row]
    val src = input
      .toDF()
      .select(timestamp_seconds($"_1").as("ts"), $"_2".as("k"))
    val agg = StreamOps.tumbling(
      StreamOps.watermarked(src, "ts", "10 minutes"),
      $"ts",
      "5 minutes",
      keys = Seq($"k"),
      aggs = Seq(count(lit(1)).as("n"))
    )
    val q = agg
      .select(unix_timestamp($"window.start").as("ws"), $"k", $"n")
      .writeStream
      .outputMode("append") // append: a window emits once, when the watermark passes it
      .option("checkpointLocation", Files.createTempDirectory("graft-wm").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        rows.synchronized { rows ++= df.collect() }; ()
      }
      .start()

    // Window [0, 300): two 'a', one 'b'.
    input.addData((60L, "a"), (120L, "a"), (200L, "b"))
    q.processAllAvailable()
    assert(rows.isEmpty) // watermark hasn't passed the window end yet

    // Advance event time far enough to close [0, 300).
    input.addData((7200L, "a"))
    q.processAllAvailable()
    val finalized = rows.toList.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(finalized === Set((0L, "a", 2L), (0L, "b", 1L)))

    // A late event inside the already-finalized window, far behind the
    // watermark: must be dropped — no new emission, no mutation.
    input.addData((90L, "a"))
    q.processAllAvailable()
    val afterLate = rows.toList.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(afterLate.size === 2)
    assert(afterLate.toSet === finalized)
    q.stop()
  }

  test("chained stateful aggregations: per-key window counts roll up to per-window totals") {
    // two stateful operators in ONE streaming query (Spark 4 multi-stateful
    // append pipelines): stage 1 counts per (key, 5-min window), stage 2
    // re-aggregates the finalized stage-1 rows per window — the declarative
    // form of callysto's agent -> changelog topic -> downstream-agent chain
    // collapsed into a single exactly-once query.
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Long, String)]
    val rows = mutable.ArrayBuffer.empty[Row]
    val src = input
      .toDF()
      .select(timestamp_seconds($"_1").as("ts"), $"_2".as("k"))
    val perKey = StreamOps.tumbling(
      StreamOps.watermarked(src, "ts", "10 minutes"),
      $"ts",
      "5 minutes",
      keys = Seq($"k"),
      aggs = Seq(count(lit(1)).as("n"))
    )
    val perWindow = perKey
      .groupBy($"window")
      .agg(sum($"n").as("total"), count(lit(1)).as("n_keys"))
    val q = perWindow
      .select(unix_timestamp($"window.start").as("ws"), $"total", $"n_keys")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-chain").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        rows.synchronized { rows ++= df.collect() }; ()
      }
      .start()

    // window [0, 300): a,a,b ; window [300, 600): b,c,c,c
    input.addData((60L, "a"), (120L, "a"), (200L, "b"))
    input.addData((310L, "b"), (350L, "c"), (400L, "c"), (590L, "c"))
    q.processAllAvailable()
    assert(rows.isEmpty) // nothing finalized through EITHER stateful stage yet

    input.addData((7200L, "a")) // advance watermark past both windows
    q.processAllAvailable()
    val got = rows.toList.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((0L, 3L, 2L), (300L, 4L, 2L)),
      s"chained aggregation produced $got")
    q.stop()
  }

  test("streaming dropDuplicates suppresses re-deliveries across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Long, String)]
    val rows = mutable.ArrayBuffer.empty[Row]
    val q = StreamOps
      .dedup(input.toDF().toDF("id", "payload"), Seq("id"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-dd").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        rows.synchronized { rows ++= df.collect() }; ()
      }
      .start()

    input.addData((1L, "x"), (2L, "y"), (1L, "x-dup-same-batch"))
    q.processAllAvailable()
    input.addData((2L, "y-redelivered"), (3L, "z"))
    q.processAllAvailable()
    q.stop()

    val ids = rows.toList.map(_.getLong(0)).sorted
    assert(ids === List(1L, 2L, 3L)) // each id exactly once, dups dropped
  }

  test("dropDuplicatesWithinWatermark expires dedup state by event time") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Long, Long)] // (id, epochSec)
    val rows = mutable.ArrayBuffer.empty[Row]
    val src = input.toDF().select($"_1".as("id"), timestamp_seconds($"_2").as("ts"))
    val q = StreamOps
      .dedupWithinWatermark(StreamOps.watermarked(src, "ts", "10 seconds"), Seq("id"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-ddw").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        rows.synchronized { rows ++= df.collect() }; ()
      }
      .start()

    // two deliveries of id=1 within the watermark delay → one survivor
    input.addData((1L, 100L), (1L, 105L), (2L, 100L))
    q.processAllAvailable()
    assert(rows.toList.map(_.getLong(0)).sorted === List(1L, 2L))

    // march the watermark far past id=1's state, then redeliver id=1 much
    // later: dedup state has expired, so it's a NEW event, not a duplicate
    input.addData((9L, 5000L))
    q.processAllAvailable()
    input.addData((8L, 5100L))
    q.processAllAvailable()
    input.addData((1L, 6000L))
    q.processAllAvailable()
    q.stop()
    assert(rows.toList.map(_.getLong(0)).count(_ == 1L) === 2)
  }

  test("STREAMING session window emits merged sessions once the watermark closes them") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(String, Long)]
    val rows = mutable.ArrayBuffer.empty[Row]
    val src = input.toDF().select($"_1".as("user"), timestamp_seconds($"_2").as("ts"))
    val q = StreamOps
      .session(
        StreamOps.watermarked(src, "ts", "10 seconds"),
        $"ts", "100 seconds", Seq($"user"), Seq(count(lit(1)).as("n")))
      .select($"user", unix_timestamp($"session_window.start").as("start"), $"n")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-sess").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        rows.synchronized { rows ++= df.collect() }; ()
      }
      .start()

    // u1: events at 0/50/120 chain into one session (gaps < 100s); a later
    // event at 500 starts a second session
    input.addData(("u1", 0L), ("u1", 50L), ("u1", 120L), ("u1", 500L))
    q.processAllAvailable()
    // close everything: advance watermark far past 500+100
    input.addData(("u9", 5000L))
    q.processAllAvailable()
    input.addData(("u8", 5100L))
    q.processAllAvailable()
    q.stop()

    val sessions = rows.toList
      .filter(_.getString(0) == "u1")
      .map(r => (r.getLong(1), r.getLong(2)))
      .sorted
    assert(sessions === List((0L, 3L), (500L, 1L)))
  }

  test("session window merges events within the gap in batch and streaming alike") {
    val s = spark
    import s.implicits._
    // Batch execution of the same session_window expression: gap 100s.
    val df = Seq(
      ("u1", 0L), ("u1", 50L), ("u1", 120L), // one session: each gap < 100
      ("u1", 500L),                          // new session (gap 380 >= 100)
      ("u2", 10L)
    ).toDF("user", "sec").select($"user", timestamp_seconds($"sec").as("ts"))
    val sessions = StreamOps
      .session(df, $"ts", "100 seconds", Seq($"user"), Seq(count(lit(1)).as("n")))
      .select($"user", unix_timestamp($"session_window.start").as("start"), $"n")
      .orderBy($"user", $"start")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(sessions.toSeq === Seq(("u1", 0L, 3L), ("u1", 500L, 1L), ("u2", 10L, 1L)))
  }
}
