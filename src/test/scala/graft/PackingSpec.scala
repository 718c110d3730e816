package graft

import graft.operators.{Dedup, Packing}

/** Sequence packing and contamination-audit operators: model-checked
  * against in-memory folds and planted leaks.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packBins matches a sequential concat-and-chunk model per shard") {
    val rows = Seq.tabulate(100)(i => (i.toLong, (i % 37 + 1).toLong))
    val df = rows.toDF("doc_id", "n_tokens").repartition(5)
    val got = Packing
      .packBins(df, "doc_id", "n_tokens", binTokens = 64, nShards = 4)
      .select($"doc_id", $"shard", $"bin", $"bin_offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)

    // model: per shard, in doc_id order, exclusive running sum of tokens
    val model = rows
      .groupBy { case (id, _) => id % 4 }
      .flatMap { case (shardId, docs) =>
        var cum = 0L
        docs.sortBy(_._1).map { case (id, toks) =>
          val r = (id, shardId, cum / 64, cum % 64)
          cum += toks
          r
        }
      }
      .toSeq.sortBy(_._1)
    assert(got.toSeq === model)
  }

  test("packBins is invariant to input partitioning") {
    val rows = Seq.tabulate(60)(i => (i.toLong, (i % 11 + 1).toLong))
    val a = Packing.packBins(rows.toDF("doc_id", "n_tokens"), "doc_id", "n_tokens", 32, 3)
      .select($"doc_id", $"bin", $"bin_offset").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    val b = Packing.packBins(rows.toDF("doc_id", "n_tokens").repartition(13), "doc_id", "n_tokens", 32, 3)
      .select($"doc_id", $"bin", $"bin_offset").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  test("contamination flags a planted leak at 1.0 and a novel doc at 0.0") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val test = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // exact copy
      (11L, "totally novel words never seen anywhere in training data")
    ).toDF("doc_id", "text")
    val out = Dedup.contamination(train, test, "doc_id", "text", shingleN = 5)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(10L)._4 == 1.0, s"planted copy not fully contaminated: ${out(10L)}")
    assert(out(11L)._4 == 0.0, s"novel doc flagged contaminated: ${out(11L)}")
  }

  test("contamination counts partial overlap correctly") {
    // test doc shares its first 5-gram with train but not the rest
    val train = Seq((1L, "a b c d e x y z w v")).toDF("doc_id", "text")
    val test = Seq((10L, "a b c d e q r s t u")).toDF("doc_id", "text")
    val out = Dedup.contamination(train, test, "doc_id", "text", shingleN = 5)
      .as[(Long, Long, Long, Double)].collect().head
    // 6 distinct 5-grams in the test doc; exactly one ("a b c d e") leaks
    assert(out._2 == 6L && out._3 == 1L, s"unexpected counts: $out")
  }

  test("pairPack matches the folded-pairing model: total, exclusive, budget-safe, padding-minimal fold") {
    // token counts engineered so some fold pairs overflow the budget
    val rows = Seq.tabulate(25)(i => (i.toLong, (i * 7 % 60 + 10).toLong))
    val df = rows.toDF("doc_id", "n_tok").repartition(4)
    val budget = 80
    val got = Packing.pairPack(df, "doc_id", "n_tok", budget)
      .as[(String, Long, String, Long, Long)].collect()

    // every doc appears in exactly one final bin
    val placed = got.flatMap(_._3.split(",")).map(_.toLong).sorted
    assert(placed.toSeq == rows.map(_._1).sorted, "doc multiset changed")
    // no pair bin exceeds the budget; padding arithmetic correct
    got.foreach { case (bin, nDocs, _, fill, pad) =>
      if (nDocs == 2) assert(fill <= budget, s"pair bin $bin overflows: $fill")
      assert(pad == math.max(budget - fill, 0L), s"padding wrong in $bin")
    }
    // model: rank desc by tokens (id tiebreak), fold rank b with n+1-b
    val ranked = rows.sortBy { case (id, t) => (-t, id) }.zipWithIndex
      .map { case ((id, t), i) => (i + 1, id, t) }
    val n = ranked.size
    val modelBins = ranked.groupBy { case (idx, _, _) => math.min(idx, n + 1 - idx) }
      .flatMap { case (b, docs) =>
        val fill = docs.map(_._3).sum
        if (docs.size == 1 || fill <= budget)
          Seq(s"p$b" -> docs.map(_._2).sorted.mkString(","))
        else docs.map { case (idx, id, _) => s"s$idx" -> id.toString }
      }.toMap
    val gotBins = got.map(r => r._1 -> r._3).toMap
    assert(gotBins == modelBins, s"fold assignment diverged:\n$gotBins\nvs\n$modelBins")
  }
}
