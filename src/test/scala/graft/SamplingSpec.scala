package graft

import graft.operators.Sampling
import graft.sources.Tables
import org.apache.spark.sql.functions.when

/** Hash-gated sampling: determinism under repartitioning (the property
  * RNG-stream sampling lacks) and proportion bounds.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  lazy val events = Tables(spark, "/root/testdata/sf0.01").events

  test("bernoulli sample is deterministic and repartition-invariant") {
    val a = Sampling.bernoulli(events, "event_id", 0.3, seed = 11)
      .select($"event_id").as[Long].collect().sorted.toSeq
    val b = Sampling.bernoulli(events.repartition(7), "event_id", 0.3, seed = 11)
      .select($"event_id").as[Long].collect().sorted.toSeq
    assert(a === b, "sample changed under repartitioning")
    val frac = a.size.toDouble / events.count()
    assert(math.abs(frac - 0.3) < 0.05, s"kept fraction $frac far from 0.3")
  }

  test("portable gate at fraction 1.0 keeps every row (the ffff-prefix edge)") {
    val docs = graft.sources.Tables(spark, sf).documents
    val n = docs.count()
    assert(graft.operators.Sampling.bernoulliPortable(docs, "doc_id", 1.0, 7).count() == n)
    assert(graft.operators.Sampling.bernoulliPortable(docs, "doc_id", 0.0, 7).count() == 0)
  }

  test("different seeds draw different samples") {
    val a = Sampling.bernoulli(events, "event_id", 0.3, seed = 11)
      .select($"event_id").as[Long].collect().toSet
    val b = Sampling.bernoulli(events, "event_id", 0.3, seed = 12)
      .select($"event_id").as[Long].collect().toSet
    assert((a -- b).nonEmpty && (b -- a).nonEmpty)
  }

  test("stratified sample respects per-stratum fractions and drops unlisted strata") {
    val docs = Tables(spark, "/root/testdata/sf0.01").documents
    val out = Sampling
      .stratified(docs, "source", Map("src0" -> 0.8, "src1" -> 0.2), "doc_id", seed = 7)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(out.keySet.subsetOf(Set("src0", "src1")), s"unlisted strata leaked: $out")
    // 25 docs per stratum: loose binomial bounds
    assert(out.getOrElse("src0", 0L) >= 12L)
    assert(out.getOrElse("src1", 0L) <= 12L)
  }

  test("split assignment is total, exclusive, repartition-invariant, and ~proportional") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.splitAssign(events, "event_id", splits, seed = 13)
      .select($"event_id", $"split").as[(Long, String)].collect().sortBy(_._1).toSeq
    val b = Sampling.splitAssign(events.repartition(7), "event_id", splits, seed = 13)
      .select($"event_id", $"split").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(a === b, "split changed under repartitioning")
    val n = events.count()
    assert(a.size.toLong == n, "every row gets exactly one split")
    val byName = a.groupBy(_._2).view.mapValues(_.size.toDouble / n).toMap
    assert(byName.keySet == Set("train", "val", "test"))
    assert(math.abs(byName("train") - 0.8) < 0.05, s"train frac ${byName("train")}")
    assert(math.abs(byName("val") - 0.1) < 0.05)
    assert(math.abs(byName("test") - 0.1) < 0.05)
  }

  test("weighted sample: weight>=1 always kept, weight 0 never, repartition-invariant") {
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, "/root/testdata/sf0.01").documents
    // weight 1 for even ids, 0 for odd: the sample must be exactly the evens
    val w = when($"doc_id" % 2 === 0, 1.0).otherwise(0.0)
    val kept = Sampling.weightedPortable(docs, "doc_id", w, seed = 5)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val evens = docs.filter($"doc_id" % 2 === 0)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept === evens)
    // fractional weights: repartition-invariant and ~proportional
    val frac = Sampling.weightedPortable(docs, "doc_id", lit(0.4), seed = 5)
    val a = frac.select($"doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling
      .weightedPortable(docs.repartition(7), "doc_id", lit(0.4), seed = 5)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(a === b, "weighted sample changed under repartitioning")
    assert(math.abs(a.size.toDouble / docs.count() - 0.4) < 0.07)
  }

  test("hexThresholdCol clamps w=1.0 to 'ffff' (hex(65536)='10000' would lpad-TRUNCATE to '1000')") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val rendered = Seq(1.0, 0.9999999, 0.5, 0.0).toDF("w")
      .select(Sampling.hexThresholdCol($"w").as("t"))
      .as[String].collect().toSeq
    assert(rendered === Seq("ffff", "ffff", "8000", "0000"))
  }

  test("stratum mix: exact epoch counts, copy indices contiguous, unlisted strata dropped") {
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, "/root/testdata/sf0.01").documents
    val mixed = Sampling.mixByStratum(
      docs, "source", Map("src0" -> 3.0, "src1" -> 0.5), "doc_id", seed = 5)
    // integral epochs: EXACTLY 3 copies of every src0 row
    val n0 = docs.filter($"source" === "src0").count()
    assert(mixed.filter($"source" === "src0").count() === 3 * n0)
    assert(mixed.filter($"source" === "src0").groupBy($"doc_id").count()
      .filter($"count" =!= 3).count() === 0)
    // fractional epochs: ~half of src1, one copy each
    val n1 = docs.filter($"source" === "src1").count()
    val m1 = mixed.filter($"source" === "src1").count()
    assert(math.abs(m1.toDouble / n1 - 0.5) < 0.1, s"src1 mix ratio ${m1.toDouble / n1}")
    assert(mixed.filter($"source" === "src1").filter($"copy" =!= 1).count() === 0)
    // strata not in the map vanish
    assert(mixed.filter($"source" === "src2").count() === 0)
    // copy index is 1..n (explode of sequence) — max equals per-row count
    assert(mixed.filter($"source" === "src0").agg(max($"copy")).head.getInt(0) === 3)
  }

  test("split assignment rejects weights that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(events, "event_id", Seq("a" -> 0.5, "b" -> 0.4), 1)
    }
  }

  test("affinePairs: 1-regular bijective pairing, fixed points dropped, repartition-invariant") {
    val n = 1000L
    val ids = spark.range(n).toDF("doc_id")
    val pairs = Sampling.affinePairs(ids, "doc_id", n, a = 48271L, b = 173L)
      .as[(Long, Long)].collect().toList

    // every id appears at most once per side; with no fixed points both
    // sides cover all n ids (a bijection minus fixed points)
    assert(pairs.map(_._1).distinct.size == pairs.size, "left side repeated an id")
    assert(pairs.map(_._2).distinct.size == pairs.size, "right side repeated an id")
    assert(pairs.forall { case (a, b) => a != b }, "fixed point leaked")
    assert(pairs.size >= n - 2, s"affine map has at most gcd-bounded fixed points; got ${pairs.size}")
    assert(pairs.forall { case (i, p) => p == (i * 48271L + 173L) % n }, "not the declared map")

    // purely computed — identical under repartitioning
    val re = Sampling.affinePairs(ids.repartition(13), "doc_id", n, 48271L, 173L)
      .as[(Long, Long)].collect().toSet
    assert(re == pairs.toSet)
  }

  test("affinePairs rejects a multiplier sharing a factor with n") {
    intercept[IllegalArgumentException] {
      Sampling.affinePairs(spark.range(10).toDF("doc_id"), "doc_id", 10L, a = 15L, b = 0L)
    }
  }

  test("temperatureMix: repartition-invariant, flattens toward small sources, alpha=1 is plain thinning") {
    // Skewed synthetic strata (the sf corpus has uniform source sizes,
    // which makes every alpha degenerate): big=4000, mid=800, small=200.
    val skewed = spark
      .range(5000)
      .toDF("doc_id")
      .withColumn(
        "source",
        when($"doc_id" < 4000, "big").when($"doc_id" < 4800, "mid").otherwise("small"))
    val a = Sampling.temperatureMix(skewed, "source", "doc_id", alpha = 0.5, targetFraction = 0.5, seed = 37)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.temperatureMix(skewed.repartition(7), "source", "doc_id", alpha = 0.5, targetFraction = 0.5, seed = 37)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(a === b, "mix changed under repartitioning")

    // alpha < 1 must RAISE the small source's output share above its input share
    val in = skewed.groupBy($"source").count().as[(String, Long)].collect().toMap
    val out = Sampling.temperatureMix(skewed, "source", "doc_id", 0.5, 0.5, 37)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    val inShare = in("small").toDouble / in.values.sum
    val outShare = out("small").toDouble / out.values.sum
    assert(outShare > inShare * 1.5, s"alpha=0.5 should boost the small source: $inShare -> $outShare")
    // ...without exceeding its full size (fraction capped at 1)
    assert(out("small") <= in("small"))

    // alpha = 1: p_s = n_s / N, so every stratum keeps ~targetFraction
    // (md5-gate variance on a stratum of n rows is ~sqrt(.25/n))
    val flat = Sampling.temperatureMix(skewed, "source", "doc_id", 1.0, 0.5, 37)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    flat.foreach { case (s, kept) =>
      val rate = kept.toDouble / in(s)
      val tol = 4 * math.sqrt(0.25 / in(s))
      assert(math.abs(rate - 0.5) < tol, s"alpha=1 keep-rate for $s is $rate, expected 0.5±$tol")
    }
  }

  test("globalIndex: contiguous 1..n, repartition- and partition-count-invariant, order = seeded md5") {
    val docs = Tables(spark, sf).documents
    val n = docs.count()
    val a = Sampling.globalIndex(docs, "doc_id", seed = 17)
      .select($"doc_id".as[Long], $"global_idx".as[Long]).collect().toMap
    assert(a.size.toLong == n, "one index per row")
    assert(a.values.toSeq.sorted == (1L to n).toSeq, "indices not contiguous 1..n")
    // invariant to the input's physical layout AND the chosen partition count
    val b = Sampling.globalIndex(docs.repartition(7), "doc_id", seed = 17, numPartitions = 3)
      .select($"doc_id".as[Long], $"global_idx".as[Long]).collect().toMap
    assert(a == b, "global index changed under repartitioning / partition count")
    // the order really is (md5(key:seed), key)
    val expected = docs.select($"doc_id".as[Long]).collect().toSeq
      .sortBy(id => (org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$id:17"), id))
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    assert(a == expected, "order disagrees with the seeded md5 total order")
  }

  test("reservoirPerGroup: exactly k per group, ranks 1..k, repartition-invariant") {
    val docs = Tables(spark, sf).documents
    val out = Sampling.reservoirPerGroup(docs, "source", "doc_id", k = 7, seed = 5)
    val perGroup = out.groupBy($"source").count().as[(String, Long)].collect().toMap
    val groupSizes = docs.groupBy($"source").count().as[(String, Long)].collect().toMap
    groupSizes.foreach { case (g, n) =>
      assert(perGroup(g) == math.min(7L, n), s"group $g drew ${perGroup(g)} of $n")
    }
    val ranks = out.filter($"source" === "src0")
      .select($"sample_rank".as[Long]).collect().sorted.toSeq
    assert(ranks == (1L to ranks.size).toSeq, "ranks not contiguous 1..k")
    val a = out.select($"doc_id".as[Long]).collect().toSet
    val b = Sampling.reservoirPerGroup(docs.repartition(7), "source", "doc_id", 7, 5)
      .select($"doc_id".as[Long]).collect().toSet
    assert(a == b, "draw changed under repartitioning")
    // a different seed draws a different sample
    val c = Sampling.reservoirPerGroup(docs, "source", "doc_id", 7, seed = 6)
      .select($"doc_id".as[Long]).collect().toSet
    assert(a != c, "seed does not influence the draw")
  }

  test("weightedReservoirPerGroup: k per group, weight-biased, repartition-invariant") {
    val docs = Tables(spark, sf).documents
      .select($"lang", $"doc_id", $"n_chars".cast("long").as("w"))
    val out = Sampling.weightedReservoirPerGroup(docs, "lang", "doc_id", "w", k = 5, seed = 23)
    val perGroup = out.groupBy($"lang").count().as[(String, Long)].collect().toMap
    docs.groupBy($"lang").count().as[(String, Long)].collect().foreach { case (g, n) =>
      assert(perGroup(g) == math.min(5L, n), s"group $g drew ${perGroup(g)} of $n")
    }
    // A-ES bias: across MANY seeds, sampled rows' mean weight exceeds the
    // population mean (probability ∝ weight; one seed is too noisy)
    val popMean = docs.agg(org.apache.spark.sql.functions.avg($"w")).as[Double].head()
    val sampleMeans = (1 to 20).map { s =>
      Sampling.weightedReservoirPerGroup(docs, "lang", "doc_id", "w", 5, seed = s)
        .agg(org.apache.spark.sql.functions.avg($"w")).as[Double].head()
    }
    val meanOfMeans = sampleMeans.sum / sampleMeans.size.toDouble
    assert(meanOfMeans > popMean,
      f"weighted draw not biased toward heavy rows: sample $meanOfMeans%.1f vs pop $popMean%.1f")
    // deterministic under repartitioning
    val a = out.select($"doc_id".as[Long]).collect().toSet
    val b = Sampling
      .weightedReservoirPerGroup(docs.repartition(7), "lang", "doc_id", "w", 5, 23)
      .select($"doc_id".as[Long]).collect().toSet
    assert(a == b, "draw changed under repartitioning")
  }

  test("dsirLogWeights: target-like docs score higher; repartition-invariant") {
    val docs = Tables(spark, sf).documents
    val w = graft.operators.TextOps
      .dsirLogWeights(docs, "doc_id", "text", isTarget = $"lang" === "en",
        buckets = 64, seed = 41)
    val byLang = w.join(docs.select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang" === "en")
      .agg(org.apache.spark.sql.functions.avg($"log_weight" / $"n_toks").as("m"))
      .as[(Boolean, Double)].collect().toMap
    // per-token importance of English docs must exceed the rest — the
    // whole point of the estimator
    assert(byLang(true) > byLang(false),
      s"target mean ${byLang(true)} not above raw mean ${byLang(false)}")
    val a = w.select($"doc_id".as[Long], $"log_weight".as[Double]).collect().toMap
    val b = graft.operators.TextOps
      .dsirLogWeights(docs.repartition(7), "doc_id", "text",
        isTarget = $"lang" === "en", buckets = 64, seed = 41)
      .select($"doc_id".as[Long], $"log_weight".as[Double]).collect().toMap
    assert(a == b, "weights changed under repartitioning")
  }
}
