package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Degenerate-input behavior of the dedup family: empty corpora, single
  * documents, and all-identical corpora — the shapes that show up in
  * SOME partition of any real 100 TB run and must not crash or mislabel.
  */
class DedupEdgeSpec extends SparkSpec {
  import spark.implicits._

  private val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val single = Seq((1L, "just one document here")).toDF("doc_id", "text")
  private val clones = Seq(
    (1L, "same text every time"),
    (2L, "same text every time"),
    (3L, "same text every time")
  ).toDF("doc_id", "text")

  test("exact dedup: empty -> empty; single -> one keeper; clones -> one keeper with n_copies=3") {
    assert(Dedup.exact(empty, "doc_id", "text").count() == 0)
    val s = Dedup.exact(single, "doc_id", "text").collect()
    assert(s.length == 1 && s.head.getAs[Long]("keep_id") == 1L)
    val c = Dedup.exact(clones, "doc_id", "text").collect()
    assert(c.length == 1)
    assert(c.head.getAs[Long]("keep_id") == 1L)
    assert(c.head.getAs[Long]("n_copies") == 3L)
  }

  test("minhash/simhash/jaccard pairs: empty and single inputs yield no pairs; clones pair fully") {
    for (df <- Seq(empty, single)) {
      assert(Dedup.minhashPairs(df, "doc_id", "text").count() == 0)
      assert(Dedup.simhashPairs(df, "doc_id", "text").count() == 0)
      assert(Dedup.jaccardPairs(df, "doc_id", "text").count() == 0)
    }
    // identical docs: every pair (3 choose 2) at similarity 1 / hamming 0
    val mh = Dedup.minhashPairs(clones, "doc_id", "text").collect()
    assert(mh.length == 3 && mh.forall(_.getAs[Double]("est_jaccard") == 1.0))
    val sh = Dedup.simhashPairs(clones, "doc_id", "text").collect()
    assert(sh.length == 3 && sh.forall(_.getAs[Int]("hamming_dist") == 0))
    val jc = Dedup.jaccardPairs(clones, "doc_id", "text").collect()
    assert(jc.length == 3 && jc.forall(_.getAs[Double]("jaccard") == 1.0))
  }

  test("editDistancePairs finds exactly the distance<=1 pairs, including empty-string edges") {
    val docs = Seq(
      (1L, "cat"), (2L, "cut"), // substitution
      (3L, "cart"), // insertion vs cat
      (4L, "ca"), // deletion vs cat
      (5L, "dog"), // unrelated
      (6L, ""), // empty: distance 1 only to single-char strings
      (7L, "a"),
      (8L, "cat") // exact duplicate of 1
    ).toDF("id", "name")
    val got = Dedup
      .editDistancePairs(docs, "id", "name")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    // brute-force reference over all pairs
    val rows = Seq(1L -> "cat", 2L -> "cut", 3L -> "cart", 4L -> "ca", 5L -> "dog",
      6L -> "", 7L -> "a", 8L -> "cat")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(
          math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib, lev(sa, sb))).toSet
    assert(got === want)
    assert(got.contains((1L, 8L, 0)) && got.contains((1L, 2L, 1)) && got.contains((6L, 7L, 1)))
  }

  test("editDistancePairs maxKeyFreq cap drops hot-key blocks instead of going quadratic") {
    // 50 strings sharing the deletion key "x" (all are 1-char edits of "x")
    val docs = (1L to 50L).map(i => (i, "x" + ('a' + (i % 26)).toChar)).toDF("id", "name")
    val uncapped = Dedup.editDistancePairs(docs, "id", "name").count()
    val capped = Dedup.editDistancePairs(docs, "id", "name", maxKeyFreq = 10).count()
    assert(capped <= uncapped)
  }

  test("connected components: empty pairs -> empty labels; clone pairs collapse to one component") {
    val emptyPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(emptyPairs).count() == 0)
    val pairs = Dedup.jaccardPairs(clones, "doc_id", "text").select($"id_a", $"id_b")
    val comp = Dedup.connectedComponents(pairs).collect()
    assert(comp.map(_.getAs[Long]("component")).toSet == Set(1L))
    assert(comp.map(_.getAs[Long]("id")).toSet == Set(1L, 2L, 3L))
  }

  test("sortedNeighborhood: clones pair within window; far-apart ranks never pair; empty/single safe") {
    for (df <- Seq(empty, single)) {
      assert(Dedup.sortedNeighborhoodPairs(df, "doc_id", "text", 40, 5, 0.5).count() == 0)
    }
    // 3 clones sort adjacent: all 3 pairs at jaccard 1, rank_gap <= 2
    val p = Dedup.sortedNeighborhoodPairs(clones, "doc_id", "text", 40, 5, 0.5).collect()
    assert(p.length == 3, s"expected 3 clone pairs, got ${p.length}")
    assert(p.forall(_.getAs[Double]("jaccard") == 1.0))
    assert(p.forall(_.getAs[Long]("rank_gap") <= 2L))
    // identical texts more than `window` ranks apart do NOT pair (the
    // method's documented miss) — distinct prefixes force rank distance
    val spread = Seq(
      (1L, "aaa common tail words here"),
      (2L, "bbb filler one"), (3L, "ccc filler two"), (4L, "ddd filler three"),
      (5L, "zzz common tail words here")
    ).toDF("doc_id", "text")
    val sp = Dedup.sortedNeighborhoodPairs(spread, "doc_id", "text", 40, 2, 0.5)
      .select($"id_a".as[Long], $"id_b".as[Long]).collect().toSet
    assert(!sp.contains((1L, 5L)),
      "pair beyond the rank window should be missed by construction")
  }
}
