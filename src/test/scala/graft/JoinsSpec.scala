package graft

import org.apache.spark.sql.functions._

import graft.operators.Joins

/** Specs for the as-of and salted joins (operators/Joins.scala). */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    // (key, ts, left_payload)
    (1L, 100L, "p1"),
    (1L, 200L, "p2"),
    (1L, 50L, "p0"), // before any right row -> null
    (2L, 10L, "q1"), // key with no right rows at all
    (3L, 100L, "r1") // ts exactly equal to a right row -> inclusive
  ).toDF("k", "ts", "lp")

  private val right = Seq(
    // (key, ts, payload)
    (1L, 100L, 10L), // equal to p1's ts -> taken (inclusive bound)
    (1L, 150L, 11L), // latest before p2
    (1L, 90L, 12L),
    (3L, 100L, 30L)
  ).toDF("k", "ts", "pay")

  test("asOfJoin attaches the latest right row at or before each left ts") {
    val out = Joins
      .asOfJoin(left, right, key = "k", tsCol = "ts", payload = Seq("pay"))
      .orderBy($"k", $"ts")
      .select($"lp", $"pay")
      .as[(String, Option[Long])]
      .collect()
      .toSeq
    assert(out == Seq(
      ("p0", None), // 1@50: no right row <= 50
      ("p1", Some(10L)), // 1@100: right row at exactly 100 (inclusive)
      ("p2", Some(11L)), // 1@200: latest is 150
      ("q1", None), // key 2: no right rows
      ("r1", Some(30L)) // 3@100: equal-ts right row
    ))
  }

  test("asOfJoin matches a naive per-row max-ts lookup on real events") {
    import graft.streaming.StreamOps.tsFromNanos
    val ev = graft.sources.Tables(spark, sf).events
      .select($"user_id", $"event_id", $"event_type", tsFromNanos($"ts").as("ts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts")

    val fast = Joins
      .asOfJoin(p, c, "user_id", "ts", Seq("click_id"))
      .select($"user_id", $"purchase_id", $"click_id")

    // naive reference: range join + keep the max-ts click per purchase
    val naive = p
      .join(
        c.select($"user_id".as("cu"), $"click_id", $"ts".as("cts")),
        $"user_id" === $"cu" && $"cts" <= $"ts",
        "left_outer"
      )
      .groupBy($"user_id", $"purchase_id")
      .agg(max_by($"click_id", $"cts").as("click_id"))

    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("asOfJoinNative (custom plan) equals the union+window formulation") {
    val native = Joins
      .asOfJoinNative(left, right, key = "k", tsCol = "ts", payload = Seq("pay"))
    val composed = Joins
      .asOfJoin(left, right, key = "k", tsCol = "ts", payload = Seq("pay"))
    assert(
      native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty,
      "custom AsofJoinExec differs from the union+window reference"
    )
  }

  test("asOfJoinNative plans through AsofJoinExec and equals the naive lookup on real events") {
    import graft.streaming.StreamOps.tsFromNanos
    val ev = graft.sources.Tables(spark, sf).events
      .select($"user_id", $"event_id", $"event_type", tsFromNanos($"ts").as("ts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts")

    val native = Joins.asOfJoinNative(p, c, "user_id", "ts", Seq("click_id"))
    assert(
      native.queryExecution.executedPlan.toString.contains("AsofJoin"),
      "expected AsofJoinExec in the physical plan"
    )
    val composed = Joins.asOfJoin(p, c, "user_id", "ts", Seq("click_id"))
    assert(
      native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty,
      "native and composed as-of joins disagree on real events"
    )
  }

  test("asOfJoinBroadcast equals the sorted-merge exec and plans with zero exchanges") {
    import graft.streaming.StreamOps.tsFromNanos
    val ev = graft.sources.Tables(spark, sf).events
      .select($"user_id", $"event_id", $"event_type", tsFromNanos($"ts").as("ts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts")

    for (dir <- Seq("backward", "forward"); tol <- Seq(None, Some(3600L * 1000000L))) {
      val bcast = Joins
        .asOfJoinBroadcast(p, c, "user_id", "ts", Seq("click_id"), dir, tol)
        .select($"user_id", $"purchase_id", $"click_id")
      val native = Joins
        .asOfJoinNative(p, c, "user_id", "ts", Seq("click_id"), dir, tol)
        .select($"user_id", $"purchase_id", $"click_id")
      assert(
        bcast.exceptAll(native).isEmpty && native.exceptAll(bcast).isEmpty,
        s"broadcast as-of ($dir, tol=$tol) differs from sorted-merge exec"
      )
    }

    // the whole point: NO shuffle anywhere — narrow map over the left scan
    val plan = Joins
      .asOfJoinBroadcast(p, c, "user_id", "ts", Seq("click_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"broadcast as-of must be shuffle-free, plan:\n$plan")
  }

  test("asOfJoinBroadcast fails LOUDLY when the right side exceeds the collect bound") {
    val l = Seq((1L, 100L, "x")).toDF("k", "ts", "lp")
    val r = spark.range(50).select($"id".as("k"), $"id".as("ts"), $"id".as("pay"))
    val e = intercept[IllegalArgumentException] {
      Joins.asOfJoinBroadcast(l, r, "k", "ts", Seq("pay"), maxBroadcastRows = 10L)
    }
    assert(e.getMessage.contains("exceeds 10 rows"), s"wrong guard message: ${e.getMessage}")
    assert(e.getMessage.contains("asOfJoinNative"), "guard must name the large-side alternative")
    // at the bound itself it still runs
    val ok = Joins.asOfJoinBroadcast(l, r.limit(10), "k", "ts", Seq("pay"), maxBroadcastRows = 10L)
    assert(ok.count() == 1L)
  }

  test("a genuinely-null payload value in the latest right row stays null (no stale fill)") {
    val l = Seq((1L, 200L, "p")).toDF("k", "ts", "lp")
    val r = Seq((1L, 100L, Some(5L)), (1L, 150L, (None: Option[Long])))
      .toDF("k", "ts", "pay")
    val composed = Joins.asOfJoin(l, r, "k", "ts", Seq("pay"))
      .select($"pay").as[Option[Long]].collect().toSeq
    val native = Joins.asOfJoinNative(l, r, "k", "ts", Seq("pay"))
      .select($"pay").as[Option[Long]].collect().toSeq
    // the LATEST right row (ts=150) carries null — both paths must emit
    // null, not resurrect the stale ts=100 value
    assert(composed == Seq(None), s"union+window resurrected a stale value: $composed")
    assert(native == Seq(None), s"native exec resurrected a stale value: $native")
  }

  test("multi-column payloads never tear (all columns come from ONE right row)") {
    val l = Seq((1L, 200L)).toDF("k", "ts")
    val r = Seq(
      (1L, 100L, Some(1L), Some(2L)),
      (1L, 150L, (None: Option[Long]), Some(7L))
    ).toDF("k", "ts", "a", "b")
    val out = Joins.asOfJoin(l, r, "k", "ts", Seq("a", "b"))
      .select($"a", $"b").as[(Option[Long], Option[Long])].collect().head
    assert(out == (None, Some(7L)), s"torn row: $out (mixed fields from different right rows)")
  }

  test("broadcast as-of treats null timestamps as -infinity, exactly like the native exec") {
    val l = Seq((1L, Some(10L), "a"), (1L, (None: Option[Long]), "b")).toDF("k", "ts", "tag")
    val r = Seq((1L, Some(5L), 100L), (1L, (None: Option[Long]), 50L)).toDF("k", "ts", "pay")
    def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame) =
      f(l, r).select($"tag", $"pay").as[(String, Option[Long])].collect().toMap
    val native = run(Joins.asOfJoinNative(_, _, "k", "ts", Seq("pay")))
    val bcast = run(Joins.asOfJoinBroadcast(_, _, "k", "ts", Seq("pay")))
    assert(native == Map("a" -> Some(100L), "b" -> Some(50L)))
    assert(bcast == native, s"broadcast diverged on null timestamps: $bcast vs $native")
    // with a tolerance, null-ts rows never qualify — on either path
    val nativeTol = run(Joins.asOfJoinNative(_, _, "k", "ts", Seq("pay"), toleranceMicros = Some(100L)))
    val bcastTol = run(Joins.asOfJoinBroadcast(_, _, "k", "ts", Seq("pay"), toleranceMicros = Some(100L)))
    assert(nativeTol == Map("a" -> Some(100L), "b" -> None))
    assert(bcastTol == nativeTol, s"broadcast tolerance diverged: $bcastTol vs $nativeTol")
  }

  test("saltedJoin rejects join types that would duplicate unmatched small-side rows") {
    val ev = Seq((1L, "click", 1.0)).toDF("event_id", "event_type", "value")
    val dim = Seq(("click", 1.0)).toDF("event_type", "weight")
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(ev, dim, "event_type", "event_id", 8, "full_outer")
    }
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(ev, dim, "event_type", "event_id", 8, "right_outer")
    }
  }

  test("asOfJoinNative rejects mismatched key/ts types instead of comparing garbage") {
    val l = Seq((1L, 10L)).toDF("k", "ts")
    val rIntKey = Seq((1, 5L, 9L)).toDF("k", "ts", "pay")
    intercept[IllegalArgumentException] {
      Joins.asOfJoinNative(l, rIntKey, "k", "ts", Seq("pay"))
    }
  }

  test("asOfJoinNative supports composite keys via a struct column") {
    // two-part key (region, user): pack into one struct column — the
    // exec's single key expression + natural struct ordering handle it
    val l2 = Seq(
      ("eu", 1L, 100L, "p1"),
      ("us", 1L, 100L, "p2") // same user id, different region: must NOT share state
    ).toDF("region", "u", "ts", "lp")
      .withColumn("k", struct($"region", $"u"))
    val r2 = Seq(
      ("eu", 1L, 50L, 7L)
    ).toDF("region", "u", "ts", "pay")
      .withColumn("k", struct($"region", $"u"))
    val out = Joins
      .asOfJoinNative(l2, r2, key = "k", tsCol = "ts", payload = Seq("pay"))
      .select($"lp", $"pay")
      .as[(String, Option[Long])]
      .collect()
      .toMap
    assert(out("p1") == Some(7L), "eu user should see the eu right row")
    assert(out("p2") == None, "us user must not see the eu right row")
  }

  test("saltedJoin equals the unsalted join for every join type and salt count") {
    val ev = graft.sources.Tables(spark, sf).events
      .select($"event_id", $"event_type", $"value")
    val dim = Seq(("click", 1.0), ("view", 0.5), ("purchase", 5.0))
      .toDF("event_type", "weight")
    for (n <- Seq(1, 8); jt <- Seq("inner", "left_outer")) {
      val salted = Joins.saltedJoin(ev, dim, "event_type", "event_id", n, jt)
      val plain = ev.join(dim, Seq("event_type"), jt)
      assert(
        salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"salted($n, $jt) differs from plain join"
      )
    }
  }

  test("saltedJoin spreads a hot key across salt buckets") {
    val ev = graft.sources.Tables(spark, sf).events
      .select($"event_id", $"event_type", $"value")
    val dim = Seq(("click", 1.0)).toDF("event_type", "weight")
    // reconstruct the salt the operator assigns and count distinct values
    // for the hot key: with 8 salts over thousands of rows all 8 occur
    val nBuckets = ev
      .filter($"event_type" === "click")
      .select(pmod(xxhash64($"event_id"), lit(8L)).cast("int").as("s"))
      .distinct()
      .count()
    assert(nBuckets == 8L, s"expected 8 salt buckets, got $nBuckets")
  }

  test("rangeJoinBinned equals the naive range join for every bin width") {
    // adversarial values: negatives (floor-div sign handling), bounds ON
    // bin edges, zero-width intervals, overlapping + disjoint intervals,
    // null bounds, inverted (lo > hi) intervals
    val pts = Seq(-17L, -10L, -1L, 0L, 1L, 9L, 10L, 49L, 50L, 99L, 250L)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("pid", "v")
    val ivs = Seq(
      (1L, Some(-20L), Some(-5L)),
      (2L, Some(-5L), Some(5L)),
      (3L, Some(0L), Some(0L)), // zero-width
      (4L, Some(10L), Some(49L)), // edges exactly on bin boundaries
      (5L, Some(40L), Some(120L)), // overlaps interval 4
      (6L, Some(200L), Some(300L)),
      (7L, None, Some(10L)), // null lo -> never matches
      (8L, Some(10L), None), // null hi -> never matches
      (9L, Some(60L), Some(55L)) // inverted -> empty
    ).toDF("iid", "lo", "hi")
    val naive = pts
      .join(ivs, $"v" >= $"lo" && $"v" <= $"hi")
      .select($"pid", $"iid")
    for (w <- Seq(1L, 7L, 10L, 64L, 1000L)) {
      val binned = Joins
        .rangeJoinBinned(pts, ivs, "v", "lo", "hi", binWidth = w)
        .select($"pid", $"iid")
      assert(
        binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty,
        s"binned(w=$w) differs from the naive range join")
      // exactly-once: no duplicate pairs even when an interval spans many bins
      assert(
        binned.count() == binned.distinct().count(),
        s"binned(w=$w) produced duplicate pairs")
    }
  }

  test("intervalOverlapJoinBinned equals the naive overlap join for every bin width") {
    // adversarial spans: negatives, zero-width, bin-edge-aligned bounds,
    // nested, identical, touching-at-a-point (inclusive bounds -> match),
    // disjoint, null and inverted intervals
    val a = Seq(
      (1L, Some(-20L), Some(-5L)),
      (2L, Some(-5L), Some(5L)),
      (3L, Some(0L), Some(0L)),      // zero-width
      (4L, Some(10L), Some(49L)),    // edges on bin boundaries
      (5L, Some(40L), Some(120L)),
      (6L, Some(200L), Some(300L)),
      (7L, None, Some(10L)),         // null -> never matches
      (8L, Some(60L), Some(55L))     // inverted -> empty
    ).toDF("aid", "lo_a", "hi_a")
    val b = Seq(
      (1L, Some(-30L), Some(-20L)),  // touches interval a1 at -20
      (2L, Some(-4L), Some(-4L)),
      (3L, Some(0L), Some(500L)),    // spans many bins, overlaps most
      (4L, Some(10L), Some(49L)),    // identical to a4
      (5L, Some(45L), Some(46L)),    // nested inside a4 and a5
      (6L, Some(121L), Some(199L)),  // gap between a5 and a6
      (7L, Some(50L), None)          // null -> never matches
    ).toDF("bid", "lo_b", "hi_b")
    // the contract excludes degenerate (lo > hi) intervals — the raw
    // overlap predicate alone would vacuously match an inverted interval
    // against any superset span, so the naive reference filters them too
    val naive = a.filter($"lo_a" <= $"hi_a")
      .join(b.filter($"lo_b" <= $"hi_b"), $"lo_a" <= $"hi_b" && $"lo_b" <= $"hi_a")
      .select($"aid", $"bid")
    for (w <- Seq(1L, 7L, 10L, 64L, 1000L)) {
      val binned = Joins
        .intervalOverlapJoinBinned(a, b, "lo_a", "hi_a", "lo_b", "hi_b", binWidth = w)
        .select($"aid", $"bid")
      assert(
        binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty,
        s"binned(w=$w) differs from the naive overlap join")
      // canonical-bin emission: exactly once per pair even when both
      // intervals share many bins
      assert(
        binned.count() == binned.distinct().count(),
        s"binned(w=$w) produced duplicate pairs")
    }
  }

  test("rangeJoinBinned rejects non-integral columns instead of silently losing precision") {
    val p = Seq(1.5).toDF("v")
    val i = Seq((1L, 2L)).toDF("lo", "hi")
    intercept[IllegalArgumentException] {
      Joins.rangeJoinBinned(p, i, "v", "lo", "hi", binWidth = 10L)
    }
  }

  test("bloomSemiJoin(exact) equals the plain left-semi join on real tables") {
    val tb = graft.sources.Tables(spark, sf)
    val li = tb.lineitem
    val dim = tb.orders.filter(col("o_totalprice") > 150000)
    val got = Joins
      .bloomSemiJoin(li, "l_orderkey", dim, "o_orderkey", expectedItems = 100000L)
      .select("l_orderkey", "l_linenumber")
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue))
      .toSet
    val want = li
      .join(dim.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue))
      .toSet
    assert(got === want)
  }

  test("bloom prefilter alone never drops a true match and stays near the fpp bound") {
    val tb = graft.sources.Tables(spark, sf)
    val li = tb.lineitem
    val dim = tb.orders.filter(col("o_totalprice") > 180000)
    val pre = Joins
      .bloomSemiJoin(li, "l_orderkey", dim, "o_orderkey",
        expectedItems = 50000L, fpp = 0.01, exact = false)
    val exactRows = Joins
      .bloomSemiJoin(li, "l_orderkey", dim, "o_orderkey", expectedItems = 50000L)
      .count()
    val preRows = pre.count()
    // superset of the true semi join (no false negatives)...
    assert(preRows >= exactRows)
    // ...and the false-positive overhang is bounded: fpp=1% of the
    // non-matching rows, with slack for hash variance
    val nonMatching = li.count() - exactRows
    assert(preRows - exactRows <= math.max(50, (nonMatching * 0.05).toLong),
      s"pre=$preRows exact=$exactRows nonMatching=$nonMatching")
  }

  test("bloomSemiJoin works on string keys") {
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "k")
    val keep = Seq("alpha", "gamma").toDF("k")
    val got = Joins
      .bloomSemiJoin(docs, "k", keep, "k", expectedItems = 10L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L))
  }

  test("collapseChangelog keeps exactly the highest-seq op per key") {
    val ops = Seq(
      (1L, 10L, "a", false),
      (1L, 30L, "c", true), // latest for key 1 — a delete
      (1L, 20L, "b", false),
      (2L, 5L, "x", false)
    ).toDF("k", "seq", "v", "deleted")
    val got = Joins
      .collapseChangelog(ops, Seq("k"), "seq")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
      .toSet
    assert(got === Set((1L, "c", true), (2L, "x", false)))
  }

  test("mergeUpsert: untouched survive, updates replace, deletes remove, inserts appear") {
    val target = Seq((1L, "one", 1.0), (2L, "two", 2.0), (3L, "three", 3.0)).toDF("k", "name", "v")
    val updates = Seq(
      (2L, "TWO", 22.0, false), // update
      (3L, "gone", 0.0, true), // delete
      (9L, "nine", 9.0, false) // insert
    ).toDF("k", "name", "v", "deleted")
    val got = Joins
      .mergeUpsert(target, updates, Seq("k"), "deleted")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(got === Set((1L, "one", 1.0), (2L, "TWO", 22.0), (9L, "nine", 9.0)))
  }

  test("mergeUpsert rejects an updates schema that is not target + delete flag") {
    val target = Seq((1L, "one")).toDF("k", "name")
    val bad = Seq((1L, true)).toDF("k", "deleted") // missing payload column
    intercept[IllegalArgumentException] {
      Joins.mergeUpsert(target, bad, Seq("k"), "deleted")
    }
  }

  test("mergeUpsert after collapseChangelog replays a full op log correctly (delete then re-set)") {
    val target = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    // key 1: set, delete, then re-set at the highest seq → must survive with the last value
    // key 2: delete at the highest seq → must vanish
    val ops = Seq(
      (1L, 1L, 10.0, false),
      (1L, 2L, 0.0, true),
      (1L, 3L, 30.0, false),
      (2L, 1L, 0.0, true)
    ).toDF("k", "seq", "v", "deleted")
    val got = Joins
      .mergeUpsert(target, Joins.collapseChangelog(ops, Seq("k"), "seq"), Seq("k"), "deleted")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .toSet
    assert(got === Set((1L, 30.0)))
  }
}
