package graft

import graft.operators.TextOps

/** Model check for the distributed BPE trainer: an independent
  * sequential reference (plain Scala, the textbook algorithm) must agree
  * with the window/join formulation on merges, counts, AND the induced
  * segmentation — including the overlap subtlety ("aaaa" merges twice,
  * not three times) and full tie-breaking.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: Sennrich'16 with left-to-right non-overlapping
    * application and (count desc, pair asc) argmax.
    */
  private def refBpe(
      words0: Map[String, Long],
      rounds: Int
  ): (Seq[(Long, String, String, Long)], Map[String, Seq[String]]) = {
    var words: Map[List[String], Long] =
      words0.map { case (w, f) => w.split("").toList -> f }
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    for (round <- 1 to rounds) {
      val counts = words.toSeq
        .flatMap { case (syms, f) => syms.zip(syms.tail).map(p => p -> f) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (counts.nonEmpty) {
        val ((l, r), cnt) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((round.toLong, l, r, cnt))
        words = words.map { case (syms, f) =>
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += (l + r); i += 2 // non-overlapping: consume both
            } else { out += syms(i); i += 1 }
          }
          out.toList -> f
        }
      }
    }
    (merges.result(),
      words.map { case (syms, _) => syms.mkString -> syms.toSeq })
  }

  private val vocab = Map(
    "aaaa" -> 5L,   // overlap: one merge round turns aaaa -> (aa)(aa)
    "aaab" -> 3L,
    "abab" -> 4L,
    "baaa" -> 2L,
    "bbbb" -> 1L
  )

  test("bpeTrain matches the sequential reference on merges and counts (overlap + ties)") {
    val df = vocab.toSeq.toDF("word", "freq")
    val got = TextOps.bpeTrain(df, "word", "freq", rounds = 4)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    val (want, _) = refBpe(vocab, 4)
    assert(got == want, s"merges diverge:\n got=$got\nwant=$want")
  }

  test("bpeSegment matches the reference's induced segmentation") {
    val df = vocab.toSeq.toDF("word", "freq")
    val got = TextOps.bpeSegment(df, "word", "freq", rounds = 4)
      .select($"word", $"segmented").as[(String, String)].collect().toMap
    val (_, want) = refBpe(vocab, 4)
    assert(got == want.map { case (w, s) => w -> s.mkString(" ") },
      s"segmentation diverges:\n got=$got\nwant=$want")
  }
}
