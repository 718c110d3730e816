package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

/** Gap-fill semantics: dense per-key grid, forward fill across gaps, no
  * fill before a key's first bucket, keys independent.
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapFill densifies each key's range and forward-fills interior gaps only") {
    val df = Seq(
      // key 1: events at hours 0 and 3 — hours 1, 2 are gaps
      (1L, ts("2024-01-01 00:10:00"), 5.0),
      (1L, ts("2024-01-01 00:40:00"), 7.0),
      (1L, ts("2024-01-01 03:15:00"), 1.0),
      // key 2: single event — a one-bucket grid, nothing to fill
      (2L, ts("2024-01-01 10:30:00"), 9.0)
    ).toDF("user_id", "ts", "value")

    val out = TimeSeries
      .gapFill(df, "user_id", "ts", c => sum(c), width = "1 HOUR", truncUnit = "hour")
      .orderBy($"user_id", $"bucket_ts")
      .as[(Long, Timestamp, Double, Boolean)]
      .collect()
      .toList

    assert(out == List(
      (1L, ts("2024-01-01 00:00:00"), 12.0, false), // 5 + 7 in-bucket agg
      (1L, ts("2024-01-01 01:00:00"), 12.0, true), // forward-filled
      (1L, ts("2024-01-01 02:00:00"), 12.0, true), // forward-filled
      (1L, ts("2024-01-01 03:00:00"), 1.0, false),
      (2L, ts("2024-01-01 10:00:00"), 9.0, false)
    ))
  }

  test("gapFill grid size is bounded by range/width per key, not event count") {
    // 100 events inside ONE hour must produce exactly one bucket
    val rows = (0 until 100).map(i => (7L, ts(f"2024-01-01 05:00:${i % 60}%02d"), 1.0))
    val out = TimeSeries
      .gapFill(rows.toDF("user_id", "ts", "value"), "user_id", "ts", c => sum(c), "1 HOUR", "hour")
      .collect()
    assert(out.length == 1)
    assert(out.head.getDouble(2) == 100.0)
  }

  test("scd2 compresses runs, emits half-open intervals, null-safe on the attribute") {
    val log = Seq(
      // key 1: A,A (compress) -> B -> NULL (a change) -> NULL (compress) -> A again
      (1L, 10L, 1L, Some("A")),
      (1L, 20L, 2L, Some("A")),
      (1L, 30L, 3L, Some("B")),
      (1L, 40L, 4L, None),
      (1L, 50L, 5L, None),
      (1L, 60L, 6L, Some("A")),
      // key 2: single version stays open
      (2L, 15L, 7L, Some("Z"))
    ).toDF("k", "t", "seq", "attr")

    val out = TimeSeries
      .scd2(log, keyCol = "k", attrCol = "attr", seqCols = Seq("t", "seq"))
      .orderBy($"k", $"valid_from")
      .as[(Long, Option[String], Long, Option[Long], Boolean)]
      .collect()
      .toList

    assert(out == List(
      (1L, Some("A"), 10L, Some(30L), false),
      (1L, Some("B"), 30L, Some(40L), false),
      (1L, None, 40L, Some(60L), false),
      (1L, Some("A"), 60L, None, true),
      (2L, Some("Z"), 15L, None, true)
    ))
  }

  test("scd2 intervals tile each key's timeline: next valid_from == previous valid_to") {
    val rnd = new scala.util.Random(42)
    val log = (0 until 400).map { i =>
      (i % 7L, rnd.nextInt(10000).toLong * 10 + i, i.toLong, s"s${rnd.nextInt(3)}")
    }.toDF("k", "t", "seq", "attr")
    val out = TimeSeries
      .scd2(log, "k", "attr", Seq("t", "seq"))
      .orderBy($"k", $"valid_from")
      .as[(Long, String, Long, Option[Long], Boolean)]
      .collect()
      .toList
    out.groupBy(_._1).values.foreach { versions =>
      val sorted = versions.sortBy(_._3)
      // exactly one open version per key, and it is the last one
      assert(sorted.count(_._5) == 1 && sorted.last._5 && sorted.last._4.isEmpty)
      sorted.sliding(2).foreach {
        case List(a, b) =>
          assert(a._4.contains(b._3)) // half-open tiling, no gaps/overlaps
          assert(a._2 != b._2)        // consecutive versions really differ
        case _ =>
      }
    }
  }
}
