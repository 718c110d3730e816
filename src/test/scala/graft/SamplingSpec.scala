package graft

import graft.operators.Sampling
import graft.sources.Tables

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
}
