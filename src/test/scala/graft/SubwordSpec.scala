package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, Subword}

/** Subword tokenizer contract: greedy longest-match semantics against a
  * straightforward reference model, lossless reassembly, and the
  * planning-once vocab guarantee.
  */
class SubwordSpec extends SparkSpec {

  /** Reference model: obviously-correct greedy matcher. */
  private def model(text: String, vocab: Set[String], maxLen: Int): Seq[String] =
    text.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { word =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = 0
      while (pos < word.length) {
        val n = (math.min(maxLen, word.length - pos) to 2 by -1)
          .find(k => vocab.contains(word.substring(pos, pos + k)))
          .getOrElse(1)
        out += word.substring(pos, pos + n)
        pos += n
      }
      out.toSeq
    }

  test("expression agrees with the reference model on random text") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = "abcde "
    val texts = Seq.tabulate(200)(i =>
      (i.toLong, Seq.fill(20 + rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString))
    val vocab = Seq("ab", "abc", "cde", "de", "ea", "bcd", "aaa", "ee")
    val got = texts.toDF("id", "text")
      .select($"id", GraftFunctions.subword($"text", vocab, 6).as("pieces"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    texts.foreach { case (id, text) =>
      assert(got(id) === model(text, vocab.toSet, 6), s"text: '$text'")
    }
  }

  test("pieces reassemble to the input words exactly (lossless)") {
    val s = spark
    import s.implicits._
    val docs = s.read.parquet(s"$sf/documents.parquet").select($"doc_id", $"text")
    val vocab = Seq("val", "ue", "tab", "le", "scan", "row")
    val rows = docs
      .select($"doc_id", $"text",
        concat_ws("", GraftFunctions.subword($"text", vocab, 6)).as("glued"),
        regexp_replace($"text", "\\s+", "").as("squeezed"))
      .where($"glued" =!= $"squeezed")
    assert(rows.count() === 0L, "concatenated pieces must equal the non-space text")
  }

  test("longest match wins over an earlier shorter match") {
    // "abcde": with {ab, abcd} the greedy result is [abcd, e], never [ab, cde]
    val got = Subword.tokenize(
      org.apache.spark.unsafe.types.UTF8String.fromString("abcde"),
      new java.util.HashSet(java.util.Arrays.asList("ab", "abcd", "cde")), 6)
    assert(got.array.map(_.toString).toList === List("abcd", "e"))
  }

  test("vocab literal is evaluated once at planning, not per row") {
    val s = spark
    import s.implicits._
    // a non-foldable vocab must be rejected by the type check
    val err = intercept[Exception] {
      Seq(("a", Seq("b"))).toDF("t", "v")
        .select(call_function("graft_subword", $"t", $"v", lit(6))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("foldable"),
      s"non-literal vocab must be rejected: ${err.getMessage}")
  }
}
