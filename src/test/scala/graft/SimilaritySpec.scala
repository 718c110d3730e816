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
    assert(recall >= 0.6, s"recall@5 = $recall")
  }

  test("ivf top-k achieves >=50% recall@5 vs brute force with 6/16 cells probed") {
    val queries = emb.filter($"vec_id" < 8)
    val exact = Similarity
      .bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    val approx = Similarity
      .ivfTopK(emb, queries, "vec_id", "embedding", 5)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.5, s"ivf recall@5 = $recall")
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
