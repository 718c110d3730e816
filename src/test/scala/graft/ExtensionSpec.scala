package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Extension surface: codegen sketch expressions (MinHashSig, SimHashBits),
  * the ShingleExplode Generator, and the CentroidAgg Aggregator.
  */
class ExtensionSpec extends SparkSpec {

  test("MinHashSig matches the HOF xxhash64 formulation exactly") {
    val s = spark
    import s.implicits._
    val df = Seq(Seq(11L, 22L, 33L), Seq(7L), Seq.empty[Long]).toDF("h")
    val k = 8
    val hof = aggregate(
      $"h",
      array_repeat(lit(Long.MaxValue), k),
      (acc, h) => transform(acc, (m, i) => least(m, xxhash64(h, i + lit(1))))
    )
    val rows = df
      .select(GraftFunctions.minhash($"h", k).as("fast"), hof.as("ref"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    // empty input → MaxValue-filled signature
    assert(rows(2).getSeq[Long](0) === Seq.fill(k)(Long.MaxValue))
  }

  test("SimHashBits sets bit i by majority of token-hash bit i") {
    val s = spark
    import s.implicits._
    // two of three hashes have bit 0 set (1L, 3L) → bit 0 = 1;
    // only one has bit 1 set (3L = 0b11) → bit 1 = 0
    val bits = Seq(Tuple1(Seq(1L, 3L, 4L)))
      .toDF("h")
      .select(GraftFunctions.simhashBits($"h").as("b"))
      .collect()(0)
      .getSeq[Long](0)
    assert(bits.length === 64)
    assert(bits(0) === 1L)
    assert(bits(1) === 0L)
    assert(bits(2) === 0L) // only 4L has bit 2: count = -1-1+1 < 0
  }

  test("ShingleExplode emits distinct normalized n-grams with short-doc fallback") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "The  quick brown FOX the quick brown fox"),
      (2L, "tiny doc")
    ).toDF("doc_id", "text")
    val out = df
      .select($"doc_id", GraftFunctions.shingles($"text", 3))
      .as[(Long, String)]
      .collect()
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).toSet)
      .toMap
    // 6 trigram positions but duplicates collapse; normalization lowercases
    assert(out(1L) === Set(
      "the quick brown", "quick brown fox", "brown fox the", "fox the quick"))
    assert(out(2L) === Set("tiny doc")) // < n tokens → whole text
  }

  test("approx_count_distinct lands within 5% of the exact distinct count") {
    val s = spark
    import s.implicits._
    val df = graft.sources.Tables(s, sf).lineitem
    val row = df
      .agg(
        countDistinct($"l_partkey").as("exact"),
        approx_count_distinct($"l_partkey", 0.02).as("approx")
      )
      .collect()(0)
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"HLL estimate $approx vs exact $exact drifted > 5%")
  }

  test("FuseCosineRule rewrites dot/(norm*norm) into the one-pass cosine") {
    val s = spark
    import s.implicits._
    // parquet-backed (a LocalRelation would be constant-folded before the
    // rule's effect is observable in the optimized plan)
    val emb = graft.sources.Tables(s, sf).embeddings.limit(50)
    val df = emb.select($"embedding".as("a"), reverse($"embedding").as("b"))
    val textbook = df.select(
      (GraftFunctions.dot($"a", $"b") /
        (GraftFunctions.norm($"a") * GraftFunctions.norm($"b"))).as("c"))
    def hasExpr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
                pred: org.apache.spark.sql.catalyst.expressions.Expression => Boolean): Boolean =
      plan.exists(_.expressions.exists(_.exists(pred)))
    val optimized = textbook.queryExecution.optimizedPlan
    assert(
      hasExpr(optimized, _.isInstanceOf[graft.functions.CosineSimilarity]),
      s"cosine not fused:\n$optimized")
    assert(
      !hasExpr(optimized, _.isInstanceOf[graft.functions.DotProduct]),
      "raw dot survived the fuse")
    // bit-identical to the direct expression (the rule's safety contract)
    val direct = df.select(GraftFunctions.cosine($"a", $"b").as("c")).as[Double].collect()
    assert(textbook.as[Double].collect() === direct)
    // commuted norms fuse too
    val commuted = df.select(
      (GraftFunctions.dot($"a", $"b") /
        (GraftFunctions.norm($"b") * GraftFunctions.norm($"a"))).as("c"))
    assert(
      hasExpr(commuted.queryExecution.optimizedPlan,
        _.isInstanceOf[graft.functions.CosineSimilarity]))
    assert(commuted.as[Double].collect() === direct)
    // mismatched operands must NOT fuse
    val unrelated = df.select(
      (GraftFunctions.dot($"a", $"b") /
        (GraftFunctions.norm($"a") * GraftFunctions.norm($"a"))).as("c"))
    assert(
      !hasExpr(unrelated.queryExecution.optimizedPlan,
        _.isInstanceOf[graft.functions.CosineSimilarity]))
  }

  test("CentroidAgg propagates non-finite components as NaN dimensions") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", Seq(1.0f, Float.NaN)),
      ("a", Seq(3.0f, 6.0f))
    ).toDF("g", "v")
    val centroid = udaf(new graft.functions.CentroidAgg(2))
    val out = df.groupBy($"g").agg(centroid($"v").as("c"))
      .select($"c.values").as[Seq[Double]].head()
    assert(out(0) === 2.0, "finite dimension must still average")
    assert(out(1).isNaN, "NaN component must surface as NaN, not quantize to 0")
  }

  test("CentroidAgg computes elementwise means per group") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", Seq(1.0f, 2.0f)),
      ("a", Seq(3.0f, 6.0f)),
      ("b", Seq(10.0f, 20.0f))
    ).toDF("g", "v")
    val centroid = udaf(new graft.functions.CentroidAgg(2))
    val out = df
      .groupBy($"g")
      .agg(centroid($"v").as("c"))
      .select($"g", $"c.values")
      .as[(String, Seq[Double])]
      .collect()
      .toMap
    assert(out("a") === Seq(2.0, 4.0))
    assert(out("b") === Seq(10.0, 20.0))
  }

  test("Misra-Gries summary keeps every item above n/(k+1) with estimates in [true-n/(k+1), true]") {
    val s = spark
    import s.implicits._
    // skewed stream: item i appears 2^(10-i) times for i in 0..9, plus a
    // long tail of singletons — deterministic, n = 1023 + 500
    val heavy = (0 until 10).flatMap(i => Seq.fill(1 << (10 - i))(s"h$i"))
    val tail = (0 until 500).map(i => s"t$i")
    val items = scala.util.Random.shuffle(heavy ++ tail): Seq[String]
    val n = items.size
    val k = 63
    val mg = udaf(new graft.functions.FrequentItemsAgg(k))
    for (parts <- Seq(1, 7, 32)) {
      val est = items.toDF("item").repartition(parts)
        .agg(mg($"item").as("m")).select($"m").as[Map[String, Long]].head()
      val err = n.toDouble / (k + 1)
      val trueCounts = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      trueCounts.foreach { case (item, c) =>
        if (c > err)
          assert(est.contains(item), s"item $item (count $c > $err) missing at parts=$parts")
      }
      est.foreach { case (item, e) =>
        val c = trueCounts(item)
        assert(e <= c && e >= c - err, s"estimate $e for $item outside [${c - err}, $c]")
      }
    }
  }

  test("two-pass heavyHitters is exact and partition-invariant") {
    val s = spark
    import s.implicits._
    val items = ((0 until 400).map(_ => "hot") ++ (0 until 99).map(i => s"cold$i")).toDF("x")
    val expected = Set(("hot", 400L))
    for (parts <- Seq(1, 13)) {
      val out = graft.operators.FrequentItems
        .heavyHitters(items.repartition(parts), "x", s = 0.5, k = 15)
        .as[(String, Long)].collect().toSet
      assert(out == expected, s"parts=$parts: got $out")
    }
  }

  test("HLL sketches are mergeable: daily-sketch union equals direct sketch, near exact") {
    val s = spark
    import s.implicits._
    val ev = graft.sources.Tables(spark, sf).events
      .select($"event_type", to_date(graft.streaming.StreamOps.tsFromNanos($"ts")).as("day"), $"user_id")
    val direct = ev.groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).as("est"))
    val merged = ev.groupBy($"event_type", $"day")
      .agg(hll_sketch_agg($"user_id").as("sk"))
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
    val exact = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact"))
    val joined = direct.withColumnRenamed("est", "d")
      .join(merged.withColumnRenamed("est", "m"), "event_type")
      .join(exact, "event_type")
      .as[(String, Long, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (et, d, m, ex) =>
      assert(d == m, s"$et: merged-daily estimate $m != direct estimate $d — sketch union is lossy")
      assert(math.abs(d - ex).toDouble / ex <= 0.05, s"$et: estimate $d vs exact $ex drifts > 5%")
    }
  }

  test("heavyHitters rejects a capacity too small for the threshold") {
    val s = spark
    import s.implicits._
    val df = Seq("a").toDF("x")
    intercept[IllegalArgumentException] {
      graft.operators.FrequentItems.heavyHitters(df, "x", s = 0.001, k = 100)
    }
  }

  test("DeflateRatio: deterministic, orders repetitive < natural < random, matches direct JVM run") {
    val s = spark
    import s.implicits._
    val repetitive = "spam ham " * 500
    val natural =
      "the quick brown fox jumps over the lazy dog while seventeen judges " +
        "quietly examined four dozen unusual exhibits from the northern province "
    val random = new scala.util.Random(42).alphanumeric.take(4000).mkString
    val df = Seq(("rep", repetitive), ("nat", natural), ("rnd", random), ("empty", ""))
      .toDF("k", "text")
    val got = df
      .select($"k", GraftFunctions.deflateRatio($"text").as("r"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    // exact agreement with a direct Deflater run through the same helper
    for ((k, t) <- Seq("rep" -> repetitive, "nat" -> natural, "rnd" -> random))
      assert(got(k) === graft.functions.DeflateUtil.ratio(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)))
    assert(got("rep") < 0.1, s"repetitive text should collapse, got ${got("rep")}")
    assert(got("rep") < got("nat") && got("nat") < got("rnd"),
      s"ordering violated: $got")
    assert(got("rnd") > 0.7, s"alphanumeric noise should stay near 1, got ${got("rnd")}")
    assert(got("empty") === 1.0)
    // determinism across a second evaluation (fresh codegen + thread reuse)
    val again = df.select($"k", GraftFunctions.deflateRatio($"text").as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === again)
  }

  test("count-min sketch estimates honor the (eps, delta) contract and merge losslessly") {
    val s = spark
    import s.implicits._
    val ev = graft.sources.Tables(s, "/root/testdata/sf0.01").events
    val n = ev.count()
    val truth = ev.groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    def sketchOf(df: org.apache.spark.sql.DataFrame): org.apache.spark.util.sketch.CountMinSketch = {
      val bytes = df
        .agg(count_min_sketch($"event_type", lit(0.001), lit(0.99), lit(42)).as("s"))
        .head().getAs[Array[Byte]]("s")
      org.apache.spark.util.sketch.CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    }

    val whole = sketchOf(ev)
    truth.foreach { case (k, c) =>
      val est = whole.estimateCount(k)
      assert(est >= c, s"CMS underestimated $k: $est < $c")
      assert(est <= c + (0.001 * n).ceil.toLong,
        s"CMS overestimated $k beyond eps*n: $est vs $c + ${(0.001 * n).ceil}")
    }

    // mergeability (the property that makes it a distributed sketch):
    // shard sketches merged == whole-input estimates
    val odd = sketchOf(ev.filter($"event_id" % 2 === 1))
    val even = sketchOf(ev.filter($"event_id" % 2 === 0))
    val merged = even.mergeInPlace(odd)
    truth.keys.foreach { k =>
      assert(merged.estimateCount(k) === whole.estimateCount(k),
        s"merged shard sketches disagree with the whole-input sketch on $k")
    }
  }

  test("two ed1 calls in ONE projection codegen without colliding locals") {
    val s = spark
    import s.implicits._
    val df = Seq(("abc", "abd", "xyz")).toDF("a", "b", "c")
    val row = df.select(
      GraftFunctions.ed1($"a", $"b").as("d1"),
      GraftFunctions.ed1($"a", $"c").as("d2")
    ).head()
    assert(row.getInt(0) === 1)
    assert(row.isNullAt(1))
  }

  test("EditDistanceAtMost1 agrees with levenshtein on every pair from a mutation corpus") {
    val s = spark
    import s.implicits._
    // strings, their 1-edit mutants, 2-edit mutants, and unrelated noise
    val base = Seq("customer", "Customer#000000017", "a", "", "abba", "xyzzy")
    val mutants = base.flatMap { w =>
      val del = if (w.nonEmpty) Seq(w.substring(1), w.init) else Seq.empty
      val sub = if (w.nonEmpty) Seq("Q" + w.substring(1)) else Seq.empty
      val ins = Seq("Q" + w, w + "Q")
      del ++ sub ++ ins
    }
    val words = (base ++ mutants ++ Seq("zz", "QQ", "abcdefgh")).distinct
    val pairs = for (a <- words; b <- words) yield (a, b)
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      $"a", $"b",
      GraftFunctions.ed1($"a", $"b").as("fast"),
      org.apache.spark.sql.functions.levenshtein($"a", $"b").as("exact")
    ).collect()
    rows.foreach { r =>
      val exact = r.getInt(3)
      val fast = if (r.isNullAt(2)) None else Some(r.getInt(2))
      if (exact <= 1)
        assert(fast === Some(exact), s"(${r.getString(0)}, ${r.getString(1)}): $fast vs $exact")
      else
        assert(fast === None, s"(${r.getString(0)}, ${r.getString(1)}): expected NULL for d=$exact")
    }
  }

  test("UnicodeNormalize recomposes/decomposes; StripAccents folds diacritics; both null-safe") {
    import spark.implicits._
    val composed = "Caf\u00e9 Z\u00fcrich"    // e-acute, u-diaeresis precomposed
    val decomposed = "Cafe\u0301 Zu\u0308rich" // e+U+0301, u+U+0308
    val rows = Seq((decomposed, composed), (composed, composed), ("plain ascii", "plain ascii"))
      .toDF("t", "expectNfc")
      .select(
        GraftFunctions.unicodeNorm($"t", "NFC").as("nfc"),
        GraftFunctions.unicodeNorm($"t", "NFD").as("nfd"),
        GraftFunctions.stripAccents($"t").as("stripped"),
        $"expectNfc")
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) === r.getString(3), "NFC must equal the precomposed form")
      // NFD of the NFC result decomposes back; idempotence on ASCII
      assert(r.getString(2) === r.getString(3).replace("\u00e9", "e").replace("\u00fc", "u"))
    }
    // NFD expands the composed form
    assert(rows(1).getString(1) === decomposed)
    // null propagates
    val n = Seq(Option.empty[String]).toDF("t")
      .select(GraftFunctions.unicodeNorm($"t", "NFC"), GraftFunctions.stripAccents($"t"))
      .collect()(0)
    assert(n.isNullAt(0) && n.isNullAt(1))
    // unknown form rejected at build time
    intercept[Exception](
      Seq("x").toDF("t").select(GraftFunctions.unicodeNorm($"t", "NFX")).collect())
  }

  test("HtmlStripText equals the regexp chain on the corpus and on adversarial fragments") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // wrap corpus text in varied markup, then require bit-equality between
    // the staged-scan expression and the 11-step regexp chain it replaces
    val wrapped = docs.select(
      concat(
        lit("<html><head><script>if (1 < 2) { x = 1; }</script><style>p{}</style></head><body><p>"),
        regexp_replace($"text", "\n", "</p>\n<p>"),
        lit("</p>&amp; &lt;b&gt;&nbsp;t&#39;s</body></html>")).as("h"))
    val mismatches = wrapped
      .select(
        GraftFunctions.htmlStrip($"h").as("fast"),
        graft.queries.IngestQueries.htmlToText($"h").as("chain"))
      .filter(!($"fast" <=> $"chain"))
      .count()
    assert(mismatches == 0L, "expression diverged from the regexp chain on corpus HTML")

    // adversarial: unclosed blocks, tags spliced by block removal, "<>",
    // entities assembling from earlier decodes, whitespace-only, empty
    val evil = Seq(
      "<script>never closed <style>x</style> tail",
      "<sty<script>le>x</script>y</style>z",
      "a <> b < c > d",
      "&amp;lt; &amp;amp; &&lt;",
      "<p>a</p<p>b</p>",
      " \t\n ", "",
      "<style>a</script>b</style>c",
      "<script unclosed tag never ends",
      "x<SCRIPT>case sensitive</SCRIPT>y" // uppercase is NOT a script block
    )
    val pairs = evil.toDF("h")
      .select(
        $"h",
        GraftFunctions.htmlStrip($"h").as("fast"),
        graft.queries.IngestQueries.htmlToText($"h").as("chain"))
      .collect()
    pairs.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"divergence on ${r.getString(0)}: fast=${r.getString(1)} chain=${r.getString(2)}")
    }

    // null-safe
    assert(Seq[String](null).toDF("h").select(GraftFunctions.htmlStrip($"h"))
      .collect().head.isNullAt(0))
  }

  test("canonicalizeUrl handles the adversarial corners the constructed corpus misses") {
    import spark.implicits._
    val cases = Seq(
      // multiple utm params in every position
      ("https://a.com/p?utm_a=1&utm_b=2&id=3", "https://a.com/p?id=3"),
      ("https://a.com/p?id=1&utm_a=2&utm_b=3", "https://a.com/p?id=1"),
      ("https://a.com/p?utm_only=1", "https://a.com/p"),
      // default-port strip is scheme-aware
      ("HTTP://A.com:80/p", "http://a.com/p"),
      ("https://a.com:443/p", "https://a.com/p"),
      ("https://a.com:8443/p", "https://a.com:8443/p"), // NON-default port kept
      ("http://a.com:443/p", "http://a.com:443/p"),     // 443 is not http's default
      // authority lowercases; path and query stay case-sensitive
      ("HTTPS://WWW.Ex.COM/CaseSensitive/Path?Q=Vv", "https://www.ex.com/CaseSensitive/Path?Q=Vv"),
      // fragment and trailing slash, combined
      ("https://a.com/p/?id=1#frag", "https://a.com/p?id=1"),
      ("https://a.com/", "https://a.com"),
      // 'utm_' as path TEXT must survive (only query params are stripped)
      ("https://a.com/utm_guide?id=1", "https://a.com/utm_guide?id=1"),
      // no scheme: authority regex finds nothing, string passes through
      ("a.com/p#x", "a.com/p")
    )
    val got = cases.map(_._1).toDF("url")
      .select(graft.operators.TextOps.canonicalizeUrl($"url").as("c"))
      .as[String].collect().toSeq
    cases.zip(got).foreach { case ((in, want), have) =>
      assert(have == want, s"canonicalizeUrl($in) = $have, want $want")
    }
  }

  test("DeltaVarint: round trip, framing length, and loud contract failures") {
    import graft.functions.VarintUtil
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    def rt(xs: Array[Long]): Seq[Long] = {
      val dec = VarintUtil.decode(VarintUtil.encode(UnsafeArrayData.fromPrimitiveArray(xs)))
      (0 until dec.numElements()).map(dec.getLong)
    }
    def len(xs: Array[Long]): Int =
      VarintUtil.encode(UnsafeArrayData.fromPrimitiveArray(xs)).length
    // round trips across the branchy shapes
    for (xs <- Seq(
        Array.empty[Long], Array(0L), Array(0L, 0L, 0L), Array(127L, 128L, 16384L),
        Array(5L, 6L, 7L, 1000L, 1000000L, (1L << 62) - 1),
        (0L until 500L).toArray))
      assert(rt(xs) == xs.toSeq, s"round trip failed for ${xs.take(8).toSeq}...")
    // framing: 1 byte per started 7-bit group of each GAP
    assert(len(Array(0L)) == 1)               // gap 0
    assert(len(Array(127L)) == 1)             // gap 127 = max 1-byte
    assert(len(Array(128L)) == 2)             // first 2-byte gap
    assert(len(Array(100L, 227L)) == 2)       // gaps 100, 127 -> 1 + 1
    assert(len(Array(100L, 228L)) == 3)       // gaps 100, 128 -> 1 + 2
    assert(len((1L to 100L).toArray) == 100)  // dense gaps of 1
    // contract violations fail LOUDLY, never round-trip wrong
    intercept[IllegalArgumentException] {
      VarintUtil.encode(UnsafeArrayData.fromPrimitiveArray(Array(5L, 3L)))
    }
    intercept[IllegalArgumentException] {
      VarintUtil.encode(UnsafeArrayData.fromPrimitiveArray(Array(-1L)))
    }
    intercept[IllegalArgumentException] {
      VarintUtil.decode(Array(0x80.toByte)) // truncated: continuation with no tail
    }
  }

  test("CdcChunkStarts: incremental scan equals the per-position definition") {
    val s = spark
    import s.implicits._
    import graft.functions.CdcChunkUtil._
    // direct (non-incremental) reference: hash every window from scratch
    def refStarts(text: String): Seq[Int] = {
      val cps = text.codePoints().toArray
      val n = cps.length
      1 +: (Window to n).filter { i =>
        i < n && {
          val h = (0 until Window).map(k => cps(i - 1 - k).toLong * powers(k) % Mod).sum % Mod
          h % Mask == 0L
        }
      }.map(_ + 1)
    }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").limit(200)
    val got = docs
      .select($"doc_id", GraftFunctions.cdcChunkStarts($"text").as("s"), $"text")
      .collect()
    got.foreach { r =>
      val want = refStarts(r.getString(2))
      assert(r.getSeq[Int](1) == want, s"doc ${r.getLong(0)}: starts mismatch")
    }
  }

  test("CdcChunkStarts: content-defined boundaries survive an upstream edit") {
    val s = spark
    import s.implicits._
    // the CDC contract fixed-size chunking cannot meet: prepending text
    // shifts boundary POSITIONS but the chunk CONTENTS after the edit
    // window realign exactly
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .orderBy($"doc_id").select($"text").as[String].take(50).mkString(" ")
    def chunksOf(text: String): Seq[String] = {
      val starts = spark.range(1)
        .select(GraftFunctions.cdcChunkStarts(lit(text)).as("s"))
        .collect()(0).getSeq[Int](0)
      val bounds = starts :+ (text.codePointCount(0, text.length) + 1)
      bounds.sliding(2).map { case Seq(a, b) =>
        val off = text.offsetByCodePoints(0, a - 1)
        val end = text.offsetByCodePoints(0, b - 1)
        text.substring(off, end)
      }.toSeq
    }
    val orig = chunksOf(base)
    val edited = chunksOf("INSERTED PREFIX 12345 " + base)
    assert(orig.size >= 4, "fixture produced too few chunks to compare")
    // all but the first few chunks of the edited doc are byte-identical
    val common = orig.reverse.zip(edited.reverse).takeWhile { case (a, b) => a == b }.size
    assert(common >= orig.size - 2,
      s"expected boundary realignment after the edit; only $common of ${orig.size} suffix chunks matched")
  }

  test("DtwDistance: known alignments, symmetry, null/empty contract") {
    val s = spark
    import s.implicits._
    def dtw(x: Seq[Double], y: Seq[Double]): java.lang.Double = {
      val r = Seq((x, y)).toDF("x", "y")
        .select(call_function("graft_dtw", col("x"), col("y")).as("d"))
        .collect()(0)
      if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0))
    }
    // identical series align along the diagonal at zero cost
    assert(dtw(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)) == 0.0)
    // phase shift: DTW warps it away, pointwise L1 would charge 2·|steps|
    assert(dtw(Seq(0.0, 1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0, 3.0)) == 1.0)
    // textbook hand-checked cell: [1,3] vs [2] -> |1-2| + |3-2| = 2
    assert(dtw(Seq(1.0, 3.0), Seq(2.0)) == 2.0)
    // symmetry (the recurrence is symmetric in the inputs)
    val a = Seq(0.5, 4.25, -1.0, 2.0)
    val b = Seq(1.0, 1.5, 3.0)
    assert(dtw(a, b) == dtw(b, a))
    // expression result equals the direct JVM DP on the same arrays
    assert(dtw(a, b) == functions.DtwUtil.dtw(a.toArray, b.toArray))
    // empty side -> NULL (no silent zero)
    assert(dtw(Seq.empty, Seq(1.0)) == null)
    val nullRow = Seq(("x")).toDF("k")
      .select(call_function("graft_dtw",
        lit(null).cast("array<double>"), array(lit(1.0))).as("d"))
      .collect()(0)
    assert(nullRow.isNullAt(0))
    // NULL ELEMENT inside an array -> NULL result, independent of the
    // physical array representation (UnsafeArrayData would otherwise read
    // the slot as 0.0 while GenericArrayData NPEs). Both argument orders.
    for (elemNullFirst <- Seq(true, false)) {
      val withNullElem = array(lit(1.0), lit(null).cast("double"), lit(3.0))
      val clean = array(lit(1.0), lit(2.0))
      val (l, r) = if (elemNullFirst) (withNullElem, clean) else (clean, withNullElem)
      val row = Seq(("x")).toDF("k")
        .select(call_function("graft_dtw", l, r).as("d")).collect()(0)
      assert(row.isNullAt(0), s"null element (first=$elemNullFirst) must yield NULL")
    }
  }

  test("CdcChunkStarts: non-ASCII code points count as single positions") {
    val s = spark
    import s.implicits._
    // ASCII text interleaved with 2-byte and 3-byte chars: offsets are in
    // CODE POINTS (matching DuckDB substr/ord), never bytes
    val t1 = "héllo wörld ¡este és ün téxt con acentós! " * 8
    val starts = spark.range(1)
      .select(GraftFunctions.cdcChunkStarts(lit(t1)).as("s"))
      .collect()(0).getSeq[Int](0)
    val n = t1.codePointCount(0, t1.length)
    assert(starts.head == 1)
    assert(starts.forall(p => p >= 1 && p <= n))
    assert(starts == starts.sorted && starts.distinct.size == starts.size)
  }
}
