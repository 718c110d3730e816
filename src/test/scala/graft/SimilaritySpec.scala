package graft

import graft.operators.Similarity
import graft.sources.Tables

/** Recall check for LSH ANN vs exact brute force, plus determinism of the
  * seeded hyperplanes.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = Tables(spark, sf).embeddings

  test("lsh hyperplanes are deterministic across calls") {
    val a = Similarity.hyperplanes(8, 64)
    val b = Similarity.hyperplanes(8, 64)
    assert(a.flatten.toSeq == b.flatten.toSeq)
  }

  test("multi-table lsh top-k achieves >=60% recall@5 vs brute force") {
    val queries = emb.filter($"vec_id" < 8)
    val exact = Similarity
      .bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    val approx = Similarity
      .lshTopK(emb, queries, "vec_id", "embedding", 5)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    info(s"lsh recall@5 = $recall")
    assert(recall >= 0.6, s"recall@5 = $recall")
  }

  test("ivf top-k achieves >=70% recall@5 vs brute force with 6/16 cells probed") {
    val queries = emb.filter($"vec_id" < 8)
    val exact = Similarity
      .bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    val approx = Similarity
      .ivfTopK(emb, queries, "vec_id", "embedding", 5)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    info(s"ivf recall@5 = $recall")
    assert(recall >= 0.7, s"ivf recall@5 = $recall")
  }

  test("lsh-blocked near-dup pairs: high recall on planted duplicates, strong candidate pruning") {
    // plant near-duplicates: every 10th vector gets a slightly-noised twin
    // (cos >= ~0.95) — the angular regime sign-LSH dedup is built for
    val rnd = new scala.util.Random(5)
    val base = Array.fill(200)(Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat))
    val rows = base.zipWithIndex.flatMap { case (v, i) =>
      val self = Seq((i.toLong, v.toSeq))
      if (i % 10 == 0) {
        val twin = v.map(x => x + (rnd.nextDouble() * 0.1 - 0.05).toFloat)
        self :+ ((1000L + i, twin.toSeq))
      } else self
    }.toSeq
    val df = rows.toDF("vec_id", "embedding")

    val found = Similarity
      .lshCosinePairs(df, "vec_id", "embedding", threshold = 0.9)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    val planted = base.indices.filter(_ % 10 == 0).map(i => (i.toLong, 1000L + i)).toSet
    val recall = planted.count(found.contains).toDouble / planted.size
    assert(recall >= 0.95, s"planted near-dup recall = $recall")

    // pruning: the candidate join must examine far fewer pairs than n^2/2
    val candidates = Similarity
      .lshCosinePairs(df, "vec_id", "embedding", threshold = -1.0)
      .count()
    val allPairs = rows.size.toLong * (rows.size - 1) / 2
    assert(
      candidates < allPairs / 10,
      s"LSH examined $candidates of $allPairs pairs — no pruning"
    )
  }

  test("brute force ranks are 1..k per query") {
    val res = Similarity
      .bruteForceTopK(emb, emb.filter($"vec_id" < 8), "vec_id", "embedding", 5)
      .as[(Long, Long, Int)].collect()
    val byQuery = res.groupBy(_._1)
    assert(byQuery.size == 8)
    assert(byQuery.values.forall(_.map(_._3).sorted.toSeq == Seq(1, 2, 3, 4, 5)))
  }
}
