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

  test("split assignment rejects weights that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(events, "event_id", Seq("a" -> 0.5, "b" -> 0.4), 1)
    }
  }
}
