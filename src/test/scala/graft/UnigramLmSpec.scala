package graft

import graft.operators.UnigramLm

/** Unigram-LM tokenizer training ([[UnigramLm]]) — Viterbi max-plus
  * decoding, tie-breaks, greedy WordPiece contrast, and the train-loop
  * pruning invariants the q_text_unigram_* oracles replay.
  */
class UnigramLmSpec extends SparkSpec {

  private def words(ws: (String, Long)*) = {
    val s = spark
    import s.implicits._
    ws.toSeq.toDF("word", "freq")
  }

  test("viterbiSegment picks the max-likelihood split") {
    val vocab = Map("a" -> -100L, "b" -> -100L, "c" -> -100L,
      "ab" -> -200L, "abc" -> -50L)
    val seg = UnigramLm.viterbiSegment(words("abc" -> 1L), vocab).collect()(0)
    // "abc" one piece scores -50; "ab"+"c" and "a"+"b"+"c" score -300
    assert(seg.getAs[String]("segmented") == "abc")
    assert(seg.getAs[Long]("score_micro") == -50L)
    assert(seg.getAs[Long]("n_pieces") == 1L)
  }

  test("exact score ties resolve to the longer piece (k-ascending >= scan)") {
    // "ab"+"q" = -300 exactly ties "a"+"b"+"q" = -300 at the 'b' boundary
    val tied = UnigramLm.viterbiSegment(words("abq" -> 1L),
      Map("a" -> -100L, "b" -> -100L, "q" -> -100L, "ab" -> -200L)).collect()(0)
    assert(tied.getAs[String]("segmented") == "ab q")
    assert(tied.getAs[Long]("score_micro") == -300L)
  }

  test("chars-only vocabulary segments to single chars with the summed score") {
    val seg = UnigramLm.viterbiSegment(words("dog" -> 2L),
      Map("d" -> -10L, "o" -> -20L, "g" -> -30L)).collect()(0)
    assert(seg.getAs[String]("segmented") == "d o g")
    assert(seg.getAs[Long]("score_micro") == -60L)
    assert(seg.getAs[Long]("n_pieces") == 3L)
  }

  test("wordpieceSegment is greedy longest-match-first, not max-likelihood") {
    val vocab = Set("abc", "ab", "cd", "a", "b", "c", "d")
    val seg = UnigramLm.wordpieceSegment(words("abcd" -> 1L), vocab).collect()(0)
    // greedy grabs "abc" first and strands "d"; max-likelihood under
    // uniform weights would prefer "ab"+"cd" equally — the greedy scan
    // must NOT consider it once "abc" matched
    assert(seg.getAs[String]("segmented") == "abc d")
    assert(seg.getAs[Long]("n_pieces") == 2L)
  }

  test("train: chars always survive pruning and segmentations reassemble") {
    val w = words("aaab" -> 10L, "aab" -> 5L, "bba" -> 3L)
    val (model, seg) = UnigramLm.train(w, maxVocab = 8, emRounds = 2)
    val pieces = model.select("piece").collect().map(_.getString(0)).toSet
    assert(Set("a", "b").subsetOf(pieces))
    // multi-char survivors must all have been used by the last EM round
    val unusedMulti = model.filter("length(piece) > 1 AND usage = 0").count()
    assert(unusedMulti == 0L, "pruning left an unused multi-char piece")
    // every word reassembles exactly from its pieces
    seg.collect().foreach { r =>
      assert(r.getAs[String]("segmented").replace(" ", "") == r.getAs[String]("word"))
    }
  }

  test("seedVocab: all single chars plus top multi-char by (count, piece)") {
    val seed = UnigramLm.seedVocab(words("abab" -> 2L), maxVocab = 2).collect()
    val byPiece = seed.map(r => r.getString(0) -> r.getLong(1)).toMap
    // chars: a appears 2x per word * freq 2 = 4, b likewise
    assert(byPiece("a") == 4L && byPiece("b") == 4L)
    // multi candidates: ab(2x)=4, ba(1x)=2, aba=2, bab=2, abab=2 — top 2
    // by (cnt desc, piece asc) = ab(4), aba(2)
    val multi = seed.map(_.getString(0)).filter(_.length > 1).toSet
    assert(multi == Set("ab", "aba"))
  }
}
