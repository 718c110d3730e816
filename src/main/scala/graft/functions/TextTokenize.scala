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

  // Whole-row helpers invoked from generated code (ShingleHashes /
  // TokenHashes doGenCode): one static-shaped call per row keeps the
  // surrounding operators inside whole-stage codegen — no CodegenFallback
  // row materialization — while the string work itself stays in this
  // JIT-compiled JVM method.

  import org.apache.spark.sql.catalyst.expressions.{UnsafeArrayData, XXH64}
  import org.apache.spark.unsafe.types.UTF8String

  private def hashOf(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
  }

  /** xxhash64 of each distinct n-shingle of `text` (seed 42). */
  def shingleHashArray(text: UTF8String, n: Int): UnsafeArrayData = {
    val shingles = shingleSet(tokens(text.toString), n)
    val out = new Array[Long](shingles.size)
    var i = 0
    shingles.foreach { s => out(i) = hashOf(s); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** xxhash64 of each token of `text`, duplicates kept; empty text hashes
    * as the single empty token (HOF-path parity).
    */
  def tokenHashArray(text: UTF8String): UnsafeArrayData = {
    val toks = tokens(text.toString)
    val words = if (toks.isEmpty) mutable.ArrayBuffer("") else toks
    val out = new Array[Long](words.length)
    var i = 0
    while (i < words.length) { out(i) = hashOf(words(i)); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
