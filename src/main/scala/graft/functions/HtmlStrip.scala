package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd HTML/boilerplate strip — the production form of
  * [[graft.queries.IngestQueries.htmlToText]]'s 11-step regexp chain.
  *
  * The chain is semantically the contract (and stays as the cross-engine
  * oracle form: every step is RE2-replayable in SQL), but it costs eleven
  * full regex-automaton passes and ten intermediate strings per document.
  * This expression computes the IDENTICAL function in staged linear scans
  * with plain `indexOf`/`StringBuilder` work — no regex machinery at all —
  * which is what you want applied to every crawled page of a 100 TB
  * corpus. Equality with the chain is gated in ExtensionSpec over the
  * corpus and over adversarial fragments (unclosed tags, blocks nested in
  * blocks, entity-producing replacements), because the passes MUST stay
  * sequential: block removal scans the original text, tag removal scans
  * its output, entity decode the tags', collapse the entities' — folding
  * them into one scan would change results exactly where the stages
  * interact (e.g. a tag whose body was spliced by script removal).
  *
  * Reference analog: none (payloads are opaque bytes there); this is
  * corpus-prep surface like [[UnicodeNormalize]].
  */
case class HtmlStripText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_strip"

  override protected def nullSafeEval(input: Any): Any =
    HtmlStripUtil.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.HtmlStripUtil$$.MODULE$$.strip($c);""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlStripUtil {

  def strip(input: UTF8String): UTF8String = {
    var s = input.toString
    s = removeBlocks(s, "<script", "</script>")
    s = removeBlocks(s, "<style", "</style>")
    s = removeTags(s)
    s = replaceLiteral(s, "&nbsp;", " ")
    s = replaceLiteral(s, "&lt;", "<")
    s = replaceLiteral(s, "&gt;", ">")
    s = replaceLiteral(s, "&#39;", "'")
    s = replaceLiteral(s, "&amp;", "&")
    UTF8String.fromString(collapseWhitespace(s))
  }

  /** `(?s)<open[^>]*>.*?close` → one space, left-to-right, resuming after
    * each match — exactly the regex's scan: a position where the open tag
    * never closes (no '>' after it, or no closing literal after that)
    * fails the match and the scan advances one char, like backtracking.
    */
  private def removeBlocks(s: String, open: String, close: String): String = {
    if (s.indexOf(open) < 0) return s // overwhelmingly common: no block at all
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.startsWith(open, i)) {
        val j = s.indexOf('>', i + open.length)
        val k = if (j < 0) -1 else s.indexOf(close, j + 1)
        if (k >= 0) { out.append(' '); i = k + close.length }
        else { out.append(s.charAt(i)); i += 1 }
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** `<[^>]+>` → one space: '<', at least one non-'>', then '>'. */
  private def removeTags(s: String): String = {
    if (s.indexOf('<') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        val j = s.indexOf('>', i + 1)
        if (j > i + 1) { out.append(' '); i = j + 1 }
        else { out.append(c); i += 1 } // "<>" or unclosed: regex fails here
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Literal non-overlapping replace, scanning the source left-to-right
    * (replacements are not rescanned within a pass — same as
    * `regexp_replace` with a literal pattern; later PASSES do rescan, as
    * the sequential chain does).
    */
  private def replaceLiteral(s: String, find: String, repl: String): String = {
    var i = s.indexOf(find)
    if (i < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var from = 0
    while (i >= 0) {
      out.append(s, from, i).append(repl)
      from = i + find.length
      i = s.indexOf(find, from)
    }
    out.append(s, from, s.length)
    out.toString
  }

  /** `\s+` → ' ' then trim — Java regex `\s` is [ \t\n\x0B\f\r]. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def collapseWhitespace(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWs(c)) { pendingSpace = out.length > 0 } // leading run trims away
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      i += 1
    }
    out.toString // trailing run never flushed == trimmed
  }
}
