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

  test("sessionize splits on gap > threshold, keys independent, exact bounds") {
    val gap = 1000L // µs
    val df = Seq(
      // key 1: [10, 500, 1400] then jump to [5000, 5100]
      (1L, 10L, 100L), (1L, 500L, 101L), (1L, 1400L, 102L),
      (1L, 5000L, 103L), (1L, 5100L, 104L),
      // key 2: single event
      (2L, 7L, 200L)
    ).toDF("user_id", "tus", "event_id")
    val out = TimeSeries
      .sessionize(df, "user_id", "tus", "event_id", gapUs = gap)
      .orderBy($"user_id", $"session_idx")
      .as[(Long, Long, Long, Long, Long, Long)]
      .collect()
      .toList
    assert(out == List(
      (1L, 1L, 3L, 10L, 1400L, 1390L), // 500-10 and 1400-500 are <= gap
      (1L, 2L, 2L, 5000L, 5100L, 100L), // 5000-1400 > gap opens session 2
      (2L, 1L, 1L, 7L, 7L, 0L)
    ))
  }

  test("sessionize: gap exactly equal to threshold does NOT split") {
    val df = Seq((1L, 0L, 1L), (1L, 1000L, 2L)).toDF("user_id", "tus", "event_id")
    val out = TimeSeries.sessionize(df, "user_id", "tus", "event_id", gapUs = 1000L)
    assert(out.count() == 1)
  }

  test("decayAvg: halving weights, short-history normalizer, newest dominates") {
    val df = Seq(
      (1L, 1L, 10L, 4.0), (1L, 2L, 20L, 8.0), (1L, 3L, 30L, 2.0)
    ).toDF("user_id", "event_id", "tus", "value")
    val out = TimeSeries
      .decayAvg(df, "user_id", "tus", "event_id", "value", depth = 8)
      .orderBy($"tus")
      .select($"decay_avg")
      .as[Double]
      .collect()
      .toList
    // row 1: 4/1 = 4; row 2: (4*0.5+8)/1.5 ; row 3: ((4*.25)+(8*.5)+2)/1.75
    assert(out(0) == 4.0)
    assert(out(1) == (4.0 * 0.5 + 8.0) / 1.5)
    assert(out(2) == (4.0 * 0.25 + 8.0 * 0.5 + 2.0) / 1.75)
  }

  test("rollingAnomaly: spike flagged, warmup rows never flagged, frame excludes self") {
    // 9 steady values then a spike; minPrior=5 means rows 1-5 are warmup
    val rows = (1 to 9).map(i => (1L, i.toLong, i.toLong * 100, 10.0)) :+
      (1L, 10L, 1000L, 50.0)
    val df = rows.toDF("user_id", "event_id", "tus", "value")
    val out = TimeSeries
      .rollingAnomaly(df, "user_id", "tus", "event_id", "value",
        lookback = 10, minPrior = 5, sigmas = 2.0)
      .orderBy($"tus")
      .as[(Long, Long, Long, Double, Long, Option[Double], Boolean)]
      .collect()
      .toList
    assert(out.head._5 == 0L && out.head._6.isEmpty && !out.head._7) // no priors
    assert(out.take(5).forall(!_._7)) // warmup: n_prior < minPrior
    // steady rows among identical priors: zero variance, zero deviation -> not flagged
    assert(!out(8)._7 && out(8)._6.contains(10.0))
    // the spike: priors all 10.0, var 0, deviation 40 -> flagged
    assert(out.last._7 && out.last._6.contains(10.0) && out.last._5 == 9L)
  }

  test("interpolate fills interior gaps linearly between the surrounding observations") {
    val df = Seq(
      // key 1: observed sums 12.0@h0 and 3.0@h3 — gaps at h1, h2
      (1L, ts("2024-01-01 00:10:00"), 5.0),
      (1L, ts("2024-01-01 00:40:00"), 7.0),
      (1L, ts("2024-01-01 03:15:00"), 3.0),
      // key 2: single bucket — nothing to interpolate
      (2L, ts("2024-01-01 10:30:00"), 9.0)
    ).toDF("user_id", "ts", "value")

    val out = TimeSeries
      .interpolate(df, "user_id", "ts", c => sum(c), width = "1 HOUR", truncUnit = "hour")
      .orderBy($"user_id", $"bucket_ts")
      .as[(Long, Timestamp, Double, Boolean)]
      .collect()

    assert(out.map(r => (r._1, r._3, r._4)).toSeq == Seq(
      (1L, 12.0, false),
      (1L, 9.0, true),  // 12 + (3-12)*1/3
      (1L, 6.0, true),  // 12 + (3-12)*2/3
      (1L, 3.0, false),
      (2L, 9.0, false)
    ))
  }
}
