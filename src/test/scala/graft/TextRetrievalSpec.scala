package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Retrieval/inference layer: BM25 ranked retrieval, hashed-linear
  * classifier inference, inverted-index export. The registered queries
  * hash-check these against DuckDB replays; here we pin the semantic
  * contracts on hand-checkable fixtures (ranking order, exact margins,
  * posting-list shape) and partitioning-independence.
  */
class TextRetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "rare common common common"),
    (2L, "rare rare common common"),
    (3L, "common common common common"),
    (4L, "other words only here")
  ).toDF("doc_id", "text")

  test("bm25TopK ranks by term rarity and tf; docs without hits are absent") {
    val top = TextOps.bm25TopK(corpus, "doc_id", "text", Seq("rare", "common"), k = 10)
      .collect()
    val ids = top.map(_.getLong(0)).toSeq
    // doc 4 has no query term: excluded entirely
    assert(!ids.contains(4L))
    assert(ids.length == 3)
    // doc 2 (two hits of the rare high-idf term) beats doc 1 (one hit)
    // beats doc 3 (only the common, low-idf term)
    assert(ids == Seq(2L, 1L, 3L))
    val byId = top.map(r => r.getLong(0) -> r).toMap
    assert(byId(2L).getAs[Long]("n_hits") == 2) // two distinct terms matched
    assert(byId(3L).getAs[Long]("n_hits") == 1)
    assert(byId(3L).getAs[Int]("dl") == 4)
    // scores strictly ordered (no accidental ties from the fixture)
    val scores = top.map(_.getAs[Double]("score")).toSeq
    assert(scores.sliding(2).forall(p => p.head > p.last))
  }

  test("bm25TopK respects k and is repartition-invariant") {
    val k1 = TextOps.bm25TopK(corpus, "doc_id", "text", Seq("rare", "common"), k = 1).collect()
    assert(k1.length == 1 && k1.head.getLong(0) == 2L)
    val shuffled = TextOps
      .bm25TopK(corpus.repartition(7), "doc_id", "text", Seq("rare", "common"), k = 10)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("score"))).toSeq
    val base = TextOps.bm25TopK(corpus, "doc_id", "text", Seq("rare", "common"), k = 10)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("score"))).toSeq
    assert(shuffled == base) // DECIMAL per-doc sum: bit-identical across partitionings
  }

  test("hashedLinearScore: feature count, exact margin arithmetic, keep gate") {
    val df = TextOps.hashedLinearScore(corpus, "doc_id", "text", buckets = 64, seed = 3)
    val rows = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L))
    // 4 tokens → 4 unigrams + 3 bigrams = 7 features
    assert(rows.values.forall(_.getAs[Long]("n_features") == 7L))
    rows.values.foreach { r =>
      val margin = r.getAs[Long]("margin")
      val n = r.getAs[Long]("n_features")
      assert(r.getAs[Double]("score") == margin.toDouble / (1000.0 * n.toDouble))
      assert(r.getAs[Boolean]("keep") == margin > 0)
    }
    // identical text ⇒ identical features ⇒ identical margin
    val twin = Seq((10L, "rare common common common")).toDF("doc_id", "text")
    val twinMargin = TextOps.hashedLinearScore(twin, "doc_id", "text", 64, 3)
      .collect().head.getAs[Long]("margin")
    assert(twinMargin == rows(1L).getAs[Long]("margin"))
  }

  test("hashedLinearScore single-token doc has no bigrams") {
    val one = Seq((1L, "solo")).toDF("doc_id", "text")
    val r = TextOps.hashedLinearScore(one, "doc_id", "text", 64, 3).collect().head
    assert(r.getAs[Long]("n_features") == 1L)
  }

  test("invertedIndex: sorted postings, correct tf, df cap") {
    val idx = TextOps.invertedIndex(corpus, "doc_id", "text", maxDf = 3L)
      .collect().map(r => r.getString(0) -> r).toMap
    // "common" appears in docs 1,2,3 (df=3, kept at cap); tf 3,2,4
    val c = idx("common")
    assert(c.getAs[Long]("df") == 3L)
    assert(c.getSeq[Long](2) == Seq(1L, 2L, 3L))
    assert(c.getSeq[Long](3) == Seq(3L, 2L, 4L))
    val r = idx("rare")
    assert(r.getSeq[Long](2) == Seq(1L, 2L) && r.getSeq[Long](3) == Seq(1L, 2L))
    // cap: lower it and "common" (df=3) must drop while df-2 terms stay
    val capped = TextOps.invertedIndex(corpus, "doc_id", "text", maxDf = 2L)
      .collect().map(_.getString(0)).toSet
    assert(!capped.contains("common") && capped.contains("rare"))
  }

  test("phraseSearch: token boundaries, overlapping hits, positions") {
    val docs = Seq(
      (1L, "a b c a b"),       // "a b" at 1 and 4
      (2L, "aa b c"),          // substring "a b" inside "aa b" must NOT match
      (3L, "x x x"),           // overlapping self-phrase "x x" at 1 and 2
      (4L, "a"),               // shorter than the phrase
      (5L, "c d e")
    ).toDF("doc_id", "text")
    val ab = TextOps.phraseSearch(docs, "doc_id", "text", Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Int](3))).toMap
    assert(ab.keySet == Set(1L))
    assert(ab(1L) == ((2, Seq(1, 4))))
    val xx = TextOps.phraseSearch(docs, "doc_id", "text", Seq("x", "x"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Int](3))).toMap
    assert(xx(3L) == ((2, Seq(1, 2)))) // overlaps both counted
    // three-token phrase and single-token degenerate form
    val abc = TextOps.phraseSearch(docs, "doc_id", "text", Seq("a", "b", "c"))
      .collect().map(_.getLong(0)).toSet
    assert(abc == Set(1L))
    val single = TextOps.phraseSearch(docs, "doc_id", "text", Seq("a"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(single == Map(1L -> 2, 4L -> 1))
  }

  test("invertedIndex df-cap runs BEFORE the posting collect (anti-join below the aggregate)") {
    // Round-7 verdict: filtering df on the AGGREGATED rows still builds
    // the hot stopword's |corpus|-entry array in the aggregation buffer
    // and only then discards it — an executor OOM at 100 TB. The plan
    // contract: every collect_list aggregate must sit ABOVE a left-anti
    // join (the df pre-pass dropping over-cap terms from the row stream).
    val plan = TextOps.invertedIndex(corpus, "doc_id", "text", maxDf = 2L)
      .queryExecution.optimizedPlan
    val collectAggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.aggregateExpressions.exists(_.toString.contains("collect_list")) => a
    }
    assert(collectAggs.nonEmpty, "expected a collect_list aggregate in the plan")
    collectAggs.foreach { agg =>
      val antiBelow = agg.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
      }
      assert(antiBelow.nonEmpty,
        s"over-cap terms must be anti-joined out BELOW the posting collect; got:\n$agg")
    }
  }

  test("invertedIndex posting order is repartition-invariant") {
    val a = TextOps.invertedIndex(corpus.repartition(5), "doc_id", "text", 10L)
      .orderBy($"term").collect().map(r => (r.getString(0), r.getSeq[Long](2), r.getSeq[Long](3)))
    val b = TextOps.invertedIndex(corpus, "doc_id", "text", 10L)
      .orderBy($"term").collect().map(r => (r.getString(0), r.getSeq[Long](2), r.getSeq[Long](3)))
    assert(a.toSeq == b.toSeq)
  }

  private def evalRow(df: org.apache.spark.sql.DataFrame, term: String) =
    df.filter($"term" === term).collect().head

  test("retrievalEval: counts, MRR from the first relevant rank, perfect NDCG when ranks agree") {
    // tf(x): doc1=3, doc2=1, doc3=2 → BM25 order (short docs, same-ish
    // dl) follows tf: 1, 3, 2 — which is also the relevance order, so
    // NDCG@10 = 1 and the first binary-relevant (tf ≥ 2) doc is rank 1.
    val docs = Seq(
      (1L, "x x x"),
      (2L, "x y z"),
      (3L, "x x y"),
      (4L, "no hits here")
    ).toDF("doc_id", "text")
    val r = evalRow(TextOps.retrievalEval(docs, "doc_id", "text", Seq("x"), k = 10, relTf = 2), "x")
    assert(r.getAs[Long]("n_candidates") == 3)
    assert(r.getAs[Long]("n_rel") == 2)
    assert(r.getAs[Long]("first_rel_rank") == 1L)
    assert(r.getAs[Double]("mrr") == 1.0)
    assert(r.getAs[Double]("ndcg") == 1.0)
  }

  test("retrievalEval: dl-normalization reordering vs relevance drives NDCG below 1") {
    // docA has MORE hits (rel 3) but is long; docB has fewer (rel 2) and
    // is short — BM25 ranks B first, the ideal ranking puts A first.
    val docs = Seq(
      (1L, "x x x " + Seq.fill(60)("pad").mkString(" ")),
      (2L, "x x y")
    ).toDF("doc_id", "text")
    val r = evalRow(TextOps.retrievalEval(docs, "doc_id", "text", Seq("x"), k = 10, relTf = 2), "x")
    assert(r.getAs[Long]("first_rel_rank") == 1L) // both are binary-relevant
    val ndcg = r.getAs[Double]("ndcg")
    assert(ndcg < 1.0 && ndcg > 0.5, s"expected genuine reordering penalty, got $ndcg")
  }

  test("retrievalEval: no binary-relevant candidate → mrr 0, sentinel rank") {
    val docs = Seq((1L, "x a"), (2L, "x b")).toDF("doc_id", "text")
    val r = evalRow(TextOps.retrievalEval(docs, "doc_id", "text", Seq("x"), k = 10, relTf = 3), "x")
    assert(r.getAs[Long]("n_rel") == 0)
    assert(r.getAs[Long]("first_rel_rank") == -1L)
    assert(r.getAs[Double]("mrr") == 0.0)
    assert(r.getAs[Double]("ndcg") > 0.0) // graded gains still rank
  }

  test("retrievalEval is repartition-invariant") {
    val docs = Seq.tabulate(40)(i => (i.toLong, Seq.fill(i % 5 + 1)("x").mkString(" ") + " filler"))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextOps.retrievalEval(d, "doc_id", "text", Seq("x"), k = 10, relTf = 2)
        .collect().map(_.toSeq).toSeq
    assert(run(docs.repartition(7)) == run(docs))
  }
}
