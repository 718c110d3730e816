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
}
