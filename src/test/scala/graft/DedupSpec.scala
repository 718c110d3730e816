package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Quality checks for the sketch-based dedup operators: the DuckDB oracle
  * can't verify them (engine-specific hashes), so we assert recall against
  * the exact n-gram Jaccard ground truth instead.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables(spark, sf).documents

  lazy val exactPairs: Set[(Long, Long)] =
    Dedup
      .jaccardPairs(docs, "doc_id", "text", shingleN = 3, threshold = 0.5)
      .select($"id_a", $"id_b")
      .as[(Long, Long)]
      .collect()
      .toSet

  test("planted near-duplicates exist in the corpus") {
    assert(exactPairs.nonEmpty)
  }

  test("prefix-filter join equals uncapped exact jaccard — recall 1, same scores") {
    val exact = Dedup
      .jaccardPairs(docs, "doc_id", "text", shingleN = 3, threshold = 0.5)
      .select($"id_a", $"id_b", $"jaccard")
      .as[(Long, Long, Double)]
      .collect()
      .toSet
    val viaPrefix = Dedup
      .prefixFilterPairs(docs, "doc_id", "text", shingleN = 3, threshold = 0.5)
      .select($"id_a", $"id_b", $"jaccard")
      .as[(Long, Long, Double)]
      .collect()
      .toSet
    assert(viaPrefix == exact,
      s"prefix filter lost ${(exact -- viaPrefix).size} / gained ${(viaPrefix -- exact).size}")
  }

  test("prefix-filter candidate volume is below the full inverted-index join's") {
    // The point of prefix filtering: fewer candidate pairs than joining
    // every posting. Compare candidate counts directly (both lossless).
    val sh = docs
      .select($"doc_id".as("id"), graft.functions.GraftFunctions.shingles($"text", 3))
      .select($"id", $"shingle".as("s"))
    val fullCands = sh.as("a")
      .join(sh.as("b"), $"a.s" === $"b.s" && $"a.id" < $"b.id")
      .select($"a.id", $"b.id").distinct().count()
    val prefixCands = {
      val sizes = sh.groupBy($"id").agg(count(lit(1)).as("n"))
      val dfreq = sh.groupBy($"s").agg(count(lit(1)).as("df"))
      val ranked = sh.join(dfreq, "s").withColumn(
        "pos",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy($"id").orderBy($"df", $"s")))
      val prefix = ranked.join(sizes, "id")
        .filter($"pos" <= $"n" - ceil(lit(0.5) * $"n") + 1)
        .select($"id", $"s")
      prefix.as("a")
        .join(prefix.as("b"), $"a.s" === $"b.s" && $"a.id" < $"b.id")
        .select($"a.id", $"b.id").distinct().count()
    }
    assert(prefixCands < fullCands,
      s"prefix candidates $prefixCands not below full-join candidates $fullCands")
  }

  test("minhash-LSH finds at least 90% of exact jaccard>=0.5 pairs") {
    val found = Dedup
      .minhashPairs(docs, "doc_id", "text", shingleN = 3, k = 64, bands = 16, threshold = 0.4)
      .select($"id_a", $"id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    val recall = exactPairs.count(found.contains).toDouble / exactPairs.size
    assert(recall >= 0.9, s"minhash recall $recall, found ${found.size} vs exact ${exactPairs.size}")
  }

  test("minhash estimated jaccard within 0.25 of exact for true pairs") {
    val est = Dedup
      .minhashPairs(docs, "doc_id", "text", threshold = 0.4)
      .select($"id_a", $"id_b", $"est_jaccard")
      .as[(Long, Long, Double)]
      .collect()
      .map { case (a, b, j) => (a, b) -> j }
      .toMap
    val exact = Dedup
      .jaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)]
      .collect()
    val diffs = exact.flatMap { case (a, b, j) => est.get((a, b)).map(e => math.abs(e - j)) }
    assert(diffs.nonEmpty && diffs.max <= 0.25, s"max |est-exact| = ${if (diffs.nonEmpty) diffs.max else -1}")
  }

  test("simhash pairs are symmetric-free and within hamming bound") {
    val pairs = Dedup
      .simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Int)]
      .collect()
    assert(pairs.forall { case (a, b, h) => a < b && h <= 3 })
    assert(pairs.nonEmpty, "expected some simhash near-dups among planted duplicates")
  }

  test("packed-long hamming equals the unpacked bit-array definition") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextOps
    // random 0/1 arrays incl. the MSB-set case (bit 0 of the array = bit
    // 63 of the long, where signed-multiply packing would overflow)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val a = Array.fill(64)(rnd.nextInt(2).toLong)
      val b = if (i % 3 == 0) a.clone() else Array.fill(64)(rnd.nextInt(2).toLong)
      if (i % 2 == 0) a(0) = 1L // force the sign bit often
      (a.toSeq, b.toSeq, a.zip(b).count { case (x, y) => x != y })
    }
    val df = rows.toDF("a", "b", "want")
    val got = df
      .select(
        bit_count(TextOps.packBits($"a").bitwiseXOR(TextOps.packBits($"b")))
          .cast("int").as("got"),
        $"want")
      .as[(Int, Int)]
      .collect()
    got.foreach { case (g, w) => assert(g == w) }
  }

  test("connected components label chains and leave separate clusters apart") {
    import spark.implicits._
    // chain 1-2-3, pair 10-11, and 5-6 via two paths (cycle)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (5L, 6L), (6L, 7L), (5L, 7L))
      .toDF("id_a", "id_b")
    val cc = graft.operators.Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc(1L) === 1L && cc(2L) === 1L && cc(3L) === 1L)
    assert(cc(10L) === 10L && cc(11L) === 10L)
    assert(cc(5L) === 5L && cc(6L) === 5L && cc(7L) === 5L)
  }

  test("span dedup removes cross-doc and within-doc repeated windows at any offset") {
    import spark.implicits._
    // W=4 for a hand-checkable scenario
    val shared = "alpha beta gamma delta" // the 4-token span doc 2 repeats
    val docs = Seq(
      (1L, s"intro words $shared closing remark"),       // first instance: untouched
      (2L, s"unrelated prefix tokens here $shared tail"), // later instance: span removed
      (3L, "self self self self self self")               // within-doc repeats collapse
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.spanDedup(docs, "doc_id", "text", windowTokens = 4)
      .orderBy($"id")
      .as[(Long, Long, Long, String)].collect()

    val d1 = out(0); val d2 = out(1); val d3 = out(2)
    assert(d1 === ((1L, 8L, 0L, s"intro words $shared closing remark")),
      s"first instance must keep everything, got $d1")
    assert(d2._3 === 4L, s"doc 2 must lose exactly the shared 4-token span, got $d2")
    assert(d2._4 === "unrelated prefix tokens here tail")
    // "self"×6 with W=4: windows 0,1,2 share one fp; starts 1,2 are dups,
    // covering tokens 1..5 → only token 0 survives
    assert(d3 === ((3L, 6L, 5L, "self")), s"within-doc repeat must collapse, got $d3")
  }

  test("incremental fuzzy gate: corpus near-dups and smaller-batch-id near-dups rejected") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val existing = Seq(
      (2L, base),
      (4L, "completely unrelated text about distributed query engines and shuffles")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, base + " now"),                                   // near-dup of existing 2 → rejected
      (3L, "fresh content that matches nothing in the corpus at all whatsoever"),
      (5L, "fresh content that matches nothing in the corpus at all whatsoever ok"), // ~dup of 3 → rejected
      (7L, "entirely novel seventh document speaking of embeddings and parquet files")
    ).toDF("doc_id", "text")
    val kept = graft.operators.Dedup
      .minhashIncrementalNew(existing, incoming, "doc_id", "text")
      .as[Long].collect().sorted.toSeq
    assert(kept === Seq(3L, 7L),
      s"expected corpus-dup 1 and batch-dup 5 rejected, got $kept")
  }

  test("connected components close a 2000-hop chain within the 20-round cap (pointer halving)") {
    import spark.implicits._
    // adversarial diameter: a straight path 0-1-2-...-2000. Pure min-label
    // propagation needs ~2000 rounds (and would hit the maxIter=20 loud
    // failure); the pointer-halving jump must close it in ~log2(2000)≈11.
    val n = 2000
    val chain = (0 until n).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")
    val cc = graft.operators.Dedup.connectedComponents(chain)
      .as[(Long, Long)].collect()
    assert(cc.length === n + 1)
    assert(cc.forall(_._2 === 0L), "every node of the chain must label to the minimum (0)")
  }

  test("exact dedup keeps every distinct content exactly once") {
    val d = Dedup.exact(docs, "doc_id", "text")
    val total = d.agg(sum($"n_copies")).as[Long].head()
    assert(total == docs.count())
    assert(d.count() == d.select($"content_hash").distinct().count())
  }

  test("bloom-gated incremental dedup equals the plain path exactly") {
    // corpus = even ids, batch = a mix of re-crawls (dups) and new docs
    val existing = docs.filter($"doc_id" % 2 === 0)
    val incoming = docs.filter($"doc_id" % 2 === 1)
      .select($"doc_id", $"text")
      .unionByName(existing.limit(40).select(($"doc_id" + 100000L).as("doc_id"), $"text"))

    val plain = Dedup.incrementalNew(existing, incoming, "doc_id", "text")
      .as[(String, Long)].collect().toSet
    val gated = Dedup.incrementalNewBloomGated(
        existing, incoming, "doc_id", "text", expectedItems = 1000L)
      .as[(String, Long)].collect().toSet
    assert(gated == plain,
      s"bloom gate changed the decision: only-gated=${gated -- plain}, only-plain=${plain -- gated}")
    assert(plain.nonEmpty, "fixture degenerate: nothing admitted")

    // an aggressive fpp still cannot change results (false POSITIVES only
    // add rows to the exact check; false negatives do not exist)
    val sloppy = Dedup.incrementalNewBloomGated(
        existing, incoming, "doc_id", "text", expectedItems = 10L, fpp = 0.5)
      .as[(String, Long)].collect().toSet
    assert(sloppy == plain, "undersized bloom must degrade performance, never correctness")
  }

  test("containmentPairs flags an embedded excerpt that whole-doc Jaccard misses") {
    val long = (1 to 60).map(i => s"tok$i").mkString(" ")
    val excerpt = (20 to 29).map(i => s"tok$i").mkString(" ") // verbatim slice of `long`
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, long), (2L, excerpt), (3L, other)).toDF("doc_id", "text")

    val cont = Dedup.containmentPairs(df, "doc_id", "text", shingleN = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.map(t => (t._1, t._2)).toSeq == Seq((1L, 2L)), s"got ${cont.toSeq}")
    assert(cont.head._3 == 1.0, "verbatim excerpt must have containment exactly 1")

    val jac = Dedup.jaccardPairs(df, "doc_id", "text", shingleN = 3, threshold = 0.5)
      .collect()
    assert(jac.isEmpty, "whole-doc Jaccard should NOT reach 0.5 on a 10/60-token excerpt")
  }
}
