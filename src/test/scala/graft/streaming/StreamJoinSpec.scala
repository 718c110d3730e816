package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stream-stream joins with watermark-bounded state: the ad-tech
  * impressions×clicks shape — equi-key plus an event-time range, inner and
  * left-outer (outer emits the null-padded row once the watermark closes
  * the time bound).
  */
class StreamJoinSpec extends SparkSpec {

  test("watermarked stream-stream left-outer join matches in-window and null-pads expired") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val impIn = MemoryStream[(Long, Long)]
    val clkIn = MemoryStream[(Long, Long)]
    val rows = mutable.ArrayBuffer.empty[Row]

    val imp = StreamOps.watermarked(
      impIn.toDF().select($"_1".as("ad_id"), timestamp_seconds($"_2").as("imp_time")),
      "imp_time", "5 seconds")
    val clk = StreamOps.watermarked(
      clkIn.toDF().select($"_1".as("click_ad_id"), timestamp_seconds($"_2").as("click_time")),
      "click_time", "5 seconds")

    val joined = StreamOps.streamJoin(
      imp,
      clk,
      expr("""ad_id = click_ad_id AND
              click_time BETWEEN imp_time AND imp_time + INTERVAL 30 seconds"""),
      "left_outer"
    )

    val q = joined
      .select($"ad_id", unix_timestamp($"imp_time").as("it"), $"click_ad_id")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-ssj").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        rows.synchronized { rows ++= df.collect() }; ()
      }
      .start()

    // ad 1: click lands inside [imp, imp+30s] → match.
    // ad 3: never clicked → must surface as (3, null) once state expires.
    impIn.addData((1L, 10L), (3L, 20L))
    clkIn.addData((1L, 15L))
    q.processAllAvailable()
    val matched = rows.toList.filter(!_.isNullAt(2)).map(r => (r.getLong(0), r.getLong(2)))
    assert(matched === List((1L, 1L)))

    // Advance BOTH watermarks well past ad 3's join window, then run the
    // follow-up batches that apply the new watermark and evict.
    impIn.addData((99L, 1000L))
    clkIn.addData((98L, 1000L))
    q.processAllAvailable()
    impIn.addData((97L, 1100L))
    clkIn.addData((96L, 1100L))
    q.processAllAvailable()

    val unmatched = rows.toList.filter(_.isNullAt(2)).map(r => (r.getLong(0), r.getLong(1)))
    assert(unmatched.contains((3L, 20L)), s"expected null-padded row for ad 3, got $rows")
    q.stop()
  }

  test("watermarked stream-stream left-semi join emits matched left rows once, evicts by watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val impIn = MemoryStream[(Long, Long)]
    val clkIn = MemoryStream[(Long, Long)]
    val rows = mutable.ArrayBuffer.empty[Row]

    val imp = StreamOps.watermarked(
      impIn.toDF().select($"_1".as("ad_id"), timestamp_seconds($"_2").as("imp_time")),
      "imp_time", "5 seconds")
    val clk = StreamOps.watermarked(
      clkIn.toDF().select($"_1".as("click_ad_id"), timestamp_seconds($"_2").as("click_time")),
      "click_time", "5 seconds")

    // Semi join: "impressions that got a click" without duplicating the
    // left row per click — the streaming form of the existence filter
    // (batch analog: q_join_semi). Same state-eviction contract as inner.
    val joined = StreamOps.streamJoin(
      imp,
      clk,
      expr("""ad_id = click_ad_id AND
              click_time BETWEEN imp_time AND imp_time + INTERVAL 30 seconds"""),
      "left_semi"
    )

    val q = joined
      .select($"ad_id", unix_timestamp($"imp_time").as("it"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-sssemi").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        rows.synchronized { rows ++= df.collect() }; ()
      }
      .start()

    // ad 1 clicked TWICE inside the window → exactly one output row.
    // ad 3 never clicked → no output ever.
    impIn.addData((1L, 10L), (3L, 20L))
    clkIn.addData((1L, 15L), (1L, 25L))
    q.processAllAvailable()
    impIn.addData((99L, 1000L))
    clkIn.addData((98L, 1000L))
    q.processAllAvailable()
    impIn.addData((97L, 1100L))
    clkIn.addData((96L, 1100L))
    q.processAllAvailable()

    val ids = rows.toList.map(_.getLong(0))
    assert(ids === List(1L), s"semi join must emit ad 1 exactly once and never ad 3, got $rows")
    q.stop()
  }

  test("watermarked stream-stream full-outer join null-pads the unmatched side in BOTH directions") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val impIn = MemoryStream[(Long, Long)]
    val clkIn = MemoryStream[(Long, Long)]
    val rows = mutable.ArrayBuffer.empty[Row]

    val imp = StreamOps.watermarked(
      impIn.toDF().select($"_1".as("ad_id"), timestamp_seconds($"_2").as("imp_time")),
      "imp_time", "5 seconds")
    val clk = StreamOps.watermarked(
      clkIn.toDF().select($"_1".as("click_ad_id"), timestamp_seconds($"_2").as("click_time")),
      "click_time", "5 seconds")

    val joined = StreamOps.streamJoin(
      imp,
      clk,
      expr("""ad_id = click_ad_id AND
              click_time BETWEEN imp_time AND imp_time + INTERVAL 30 seconds"""),
      "full_outer"
    )

    val q = joined
      .select($"ad_id", $"click_ad_id")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-ssfo").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        rows.synchronized { rows ++= df.collect() }; ()
      }
      .start()

    // ad 1 matches; ad 3 is an impression with no click; ad 7 is a click
    // with no impression — full outer must eventually surface all three.
    impIn.addData((1L, 10L), (3L, 20L))
    clkIn.addData((1L, 15L), (7L, 22L))
    q.processAllAvailable()
    impIn.addData((99L, 1000L))
    clkIn.addData((98L, 1000L))
    q.processAllAvailable()
    impIn.addData((97L, 1100L))
    clkIn.addData((96L, 1100L))
    q.processAllAvailable()

    val got = rows.toList.map { r =>
      (if (r.isNullAt(0)) -1L else r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))
    }.toSet
    assert(got.contains((1L, 1L)), s"matched pair missing: $got")
    assert(got.contains((3L, -1L)), s"left-unmatched impression missing: $got")
    assert(got.contains((-1L, 7L)), s"right-unmatched click missing: $got")
    q.stop()
  }

  test("agent progress exposes throughput counters (C12 instrumentation parity)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val in = MemoryStream[String]
    val app = new GraftApp(s, "metered", Files.createTempDirectory("graft-prog").toString)
    // the sink must RUN the frame — foreachBatch rows count toward progress
    // only when the batch function executes an action
    app.agent("meter", () => in.toDF(), GraftSink.ForeachBatch((df, _) => { df.count(); () }))(identity)
    app.start("meter")
    in.addData("a", "b", "c")
    app.processAllAvailable("meter")
    val p = app.progress("meter")
    assert(p.isDefined) // progress surface is live
    // the trigger loop may append empty batches after the data batch; total
    // input rows across recent progress must account for all 3
    val total = app.query("meter").get.recentProgress.map(_.numInputRows).sum
    assert(total === 3L)
    app.stop("meter")
  }
}
