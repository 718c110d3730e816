package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graphs, Similarity, TextOps}

/** Hand-fixture adversarial coverage for the round-10 session-2
  * operators, complementing their oracle-gated registry queries:
  * resource-allocation link prediction (including the hub-middle cap's
  * truncation semantics), the simplified silhouette's value contract,
  * and quantized-NB scoring against hand-computable models.
  */
class Round10OpsSpec extends SparkSpec {

  test("resourceAllocation: hand graph scores, non-edges only, hub cap truncates") {
    val s = spark
    import s.implicits._
    // path + wedge graph: 1-2, 2-3, 1-4, 4-3  (square 1-2-3-4)
    // non-edges: (1,3) via middles {2,4}; (2,4) via middles {1,3}
    // all degrees = 2 -> RA = 1/2 + 1/2 = 1.0 for both candidates
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 4L), (3L, 4L)).toDF("src", "dst")
    val ra = Graphs.resourceAllocation(edges, minCommon = 2, maxMiddleDeg = 64L)
      .orderBy($"src", $"dst").collect()
    assert(ra.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 3L), (2L, 4L)))
    assert(ra.forall(_.getAs[Long]("ra_pico") == 1000000000000L), // 2 x (1e12 div 2)
      s"expected exactly 1.0 in picounits, got ${ra.map(_.getAs[Long]("ra_pico")).toSeq}")
    assert(ra.forall(_.getAs[Double]("ra_score") == 1.0))

    // hub middle: star center 10 connected to 1..5 -> every pair (i,j)
    // is a candidate through the hub; capping the hub's degree (5) below
    // the threshold removes ALL candidates (score truncation is total
    // here, and replayable - the cap is part of the operator contract)
    val star = (1L to 5L).map(i => (math.min(i, 10L), math.max(i, 10L))).toDF("src", "dst")
    val capped = Graphs.resourceAllocation(star, minCommon = 1, maxMiddleDeg = 4L)
    assert(capped.count() == 0, "deg-5 hub middle must be capped out at maxMiddleDeg=4")
    val uncapped = Graphs.resourceAllocation(star, minCommon = 1, maxMiddleDeg = 64L)
    // C(5,2)=10 candidate pairs, each scoring 1e12 div 5
    assert(uncapped.count() == 10)
    assert(uncapped.collect().forall(_.getAs[Long]("ra_pico") == 200000000000L))
  }

  test("kmeansSilhouette: values in [-1,1], own-centroid members score near 1 on separated blobs") {
    val s = spark
    import s.implicits._
    // two tight, far-apart blobs in 64-d (first coordinate +-100)
    val rows = (0 until 12).map { i =>
      val base = if (i % 2 == 0) 100.0f else -100.0f
      (i.toLong, Array.fill(64)(0.0f).updated(0, base + (i / 2) * 0.25f).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val sil = Similarity
      .kmeansSilhouette(df, "vec_id", "embedding", dim = 64, k = 2, rounds = 3, seed = 17)
      .collect()
    assert(sil.length == 12)
    assert(sil.forall(r => r.getAs[Double]("s") >= -1.0 && r.getAs[Double]("s") <= 1.0))
    // separation 200 vs within-blob spread <= 1.25 -> silhouettes ~ 1
    assert(sil.forall(_.getAs[Double]("s") > 0.9),
      s"expected near-1 silhouettes on separated blobs: ${sil.map(_.getAs[Double]("s")).min}")
    // a and b are nonnegative distances, b (other blob) >> a
    assert(sil.forall(r => r.getAs[Double]("b") > r.getAs[Double]("a")))
    // k = 1 has no "other centroid" (b would be NULL and greatest() skips
    // nulls) -> refuse loudly instead of emitting a silent null chain
    val ex = intercept[IllegalArgumentException] {
      Similarity.kmeansSilhouette(df, "vec_id", "embedding", dim = 64, k = 1,
        rounds = 1, seed = 17)
    }
    assert(ex.getMessage.contains("k >= 2"))
  }

  test("nbQuantizedModel/nbScore: hand-computable two-class model, deterministic tie-break") {
    val s = spark
    import s.implicits._
    // train: class A says "x x y", class B says "z z y" (1 doc each)
    val train = Seq(
      (1L, "A", "x"), (1L, "A", "x"), (1L, "A", "y"),
      (2L, "B", "z"), (2L, "B", "z"), (2L, "B", "y")
    ).toDF("doc_id", "lang", "tk")
    val (model, clsq) = TextOps.nbQuantizedModel(train)
    // vocab V=3, per-class n_tok=3, priors 1/2 each
    val cq = clsq.orderBy($"lang").collect()
    assert(cq.map(_.getString(0)).toSeq === Seq("A", "B"))
    assert(cq.map(_.getAs[Long]("prior_micro")).distinct.length == 1) // equal priors
    assert(cq.map(_.getAs[Long]("lnz_micro")).distinct.length == 1) // ln(3+3) both
    // test doc "x": score_A - score_B = lp_A(x) - lp_B(x) = ln(3) - ln(1) micro
    val pred = TextOps.nbScore(Seq((10L, "x")).toDF("doc_id", "tk"), model, clsq).collect()(0)
    assert(pred.getString(1) == "A")
    assert(pred.getLong(2) == math.round(math.log(3.0) * 1e6),
      s"margin should be exactly ln(3) micro: ${pred.getLong(2)}")
    // test doc "y": both classes identical -> exact integer tie -> lower class label
    val tie = TextOps.nbScore(Seq((11L, "y")).toDF("doc_id", "tk"), model, clsq).collect()(0)
    assert(tie.getString(1) == "A" && tie.getLong(2) == 0L,
      s"exact tie must break to the lower label with zero margin: $tie")
    // OOV-only doc: all lsum 0, decision falls to -len * lnz (equal) + prior (equal) -> tie
    val oov = TextOps.nbScore(Seq((12L, "qq")).toDF("doc_id", "tk"), model, clsq).collect()(0)
    assert(oov.getString(1) == "A" && oov.getLong(2) == 0L)
  }
}
