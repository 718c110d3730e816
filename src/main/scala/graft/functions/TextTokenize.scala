package graft.functions

import scala.collection.mutable

/** Shared single-pass tokenizer for the text sketch expressions: lowercase,
  * split on whitespace (collapsing runs), then optional n-gram shingling.
  * Semantics match TextOps.normText + tokens + shingles for ASCII corpora
  * (per-char lowercase; ASCII whitespace handling identical to `\s+`).
  */
object TextTokenize {

  def tokens(text: String): mutable.ArrayBuffer[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (Character.isWhitespace(c)) {
        if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      } else sb.append(Character.toLowerCase(c))
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out
  }

  /** Distinct n-gram shingles in first-seen order; documents shorter than
    * n tokens yield the whole normalized text as one shingle.
    */
  def shingleSet(toks: mutable.ArrayBuffer[String], n: Int): mutable.LinkedHashSet[String] = {
    val out = mutable.LinkedHashSet.empty[String]
    if (toks.length < n) out += toks.mkString(" ")
    else {
      var j = 0
      while (j + n <= toks.length) {
        out += toks.slice(j, j + n).mkString(" ")
        j += 1
      }
    }
    out
  }
}
