package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityLr

/** Hard-sigmoid fixed-point logistic regression
  * ([[QualityLr]], round-12 verdict #5). The registered queries gate the
  * exact integer GD trajectory cross-engine; THIS spec proves the
  * operator actually LEARNS — the driver fixture's documents share one
  * vocabulary across all `lang` values (label independent of text, so
  * any classifier sits at base rate there), which makes a separable toy
  * corpus the right place to assert discrimination.
  */
class QualityLrSpec extends SparkSpec {

  // tokens chosen to hash to distinct buckets (59/52 vs 24/26 — asserted
  // below so a Buckets change fails loudly rather than silently mixing)
  private val posText = "alpha omega alpha omega alpha"
  private val negText = "zebra quark zebra quark zebra"

  private def corpus(n: Int) = {
    val s = spark
    import s.implicits._
    (0 until n).map { i =>
      val pos = i % 2 == 0
      (i.toLong, if (pos) posText else negText, if (pos) "en" else "de", "src", 30L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("separable classes: trains to perfect held-out accuracy, balanced intercept") {
    val s = spark
    import s.implicits._
    val docs = corpus(40)
    // bucket-collision guard for the chosen tokens
    val buckets = docs
      .select(explode(split($"text", " ")).as("tk")).distinct()
      .select($"tk",
        pmod(conv(substring(md5($"tk"), 1, 15), 16, 10).cast("long"),
          lit(QualityLr.Buckets.toLong)).as("b"))
      .as[(String, Long)].collect().toMap
    assert(buckets.values.toSet.size == buckets.size,
      s"spec tokens collide in ${QualityLr.Buckets} buckets: $buckets — pick different tokens")

    val train = docs.filter($"doc_id" % 5 =!= 0)
    val test = docs.filter($"doc_id" % 5 === 0)
    val traj = QualityLr.train(QualityLr.features(train), QualityLr.labels(train))
    val wFinal = traj.filter($"round" === QualityLr.Rounds).select($"b", $"w_micro")

    // balanced classes: the intercept must not swallow the signal
    val wInt = wFinal.filter($"b" === -1L).select($"w_micro").as[Long].head()
    assert(math.abs(wInt) < 2000L, s"intercept dominates a balanced corpus: $wInt")

    val scored = QualityLr.score(QualityLr.features(test), wFinal)
      .join(QualityLr.labels(test), Seq("doc_id"))
    val n = scored.count()
    val right = scored.filter($"pred" === $"y").count()
    assert(n > 0 && right == n, s"separable toy corpus misclassified: $right/$n")
    // and the decision is driven by genuinely opposite-sign weights
    val wPos = wFinal.filter($"b" === buckets("alpha")).select($"w_micro").as[Long].head()
    val wNeg = wFinal.filter($"b" === buckets("zebra")).select($"w_micro").as[Long].head()
    assert(wPos > 0 && wNeg < 0, s"expected opposite-sign class weights, got $wPos / $wNeg")
  }

  test("trajectory shape: Rounds × (Buckets+1) rows, deterministic across rebuilds") {
    val s = spark
    import s.implicits._
    val docs = corpus(30)
    def traj() = QualityLr.train(QualityLr.features(docs), QualityLr.labels(docs))
    val a = traj().orderBy($"round", $"b").collect().toSeq
    assert(a.size == QualityLr.Rounds * (QualityLr.Buckets + 1))
    val b = traj().orderBy($"round", $"b").collect().toSeq
    assert(a == b, "GD trajectory is not deterministic across rebuilds")
  }

  test("scoring docs with entirely unseen tokens falls back to the intercept, no crash") {
    val s = spark
    import s.implicits._
    val train = corpus(40)
    val wFinal = QualityLr.train(QualityLr.features(train), QualityLr.labels(train))
      .filter($"round" === QualityLr.Rounds).select($"b", $"w_micro")
    val oov = Seq((1000L, "unseen tokens only here", "fr", "src", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = QualityLr.score(QualityLr.features(oov), wFinal).collect()
    assert(out.length == 1 && !out.head.isNullAt(2), s"OOV scoring broke: ${out.toSeq}")
  }
}
