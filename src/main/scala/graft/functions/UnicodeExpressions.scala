package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization — a preprocessing step Spark has no
  * built-in for (DuckDB ships `nfc_normalize`/`strip_accents`; Spark SQL
  * has neither): web-crawled corpora mix composed ("é") and decomposed
  * ("e"+U+0301) forms of the SAME text, which breaks exact dedup hashes,
  * shingle identity, and token equality. Normalizing to NFC before
  * hashing is standard corpus hygiene; accent stripping is the classic
  * recall-over-precision key fold for fuzzy matching.
  *
  * Both are codegen'd Catalyst expressions over `java.text.Normalizer`
  * (no UDF boxing); the fast path skips allocation entirely when
  * `Normalizer.isNormalized` already holds — true for the overwhelmingly
  * ASCII majority of real corpora.
  *
  * Reference analog: none (the reference treats payloads as opaque
  * bytes); extension-layer operator like [[EditDistanceAtMost1]].
  */
case class UnicodeNormalize(child: Expression, form: String) extends UnaryExpression {
  require(
    Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown normalization form: $form")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unicode_norm"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeUtil.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.UnicodeUtil$$.MODULE$$.normalize($c, "$form");""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Remove diacritics: NFD-decompose, drop combining marks, recompose.
  * Matches DuckDB `strip_accents` on Latin diacritics (é→e, ü→u, ñ→n);
  * non-accent symbols pass through untouched.
  */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strip_accents"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeUtil.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.UnicodeUtil$$.MODULE$$.stripAccents($c);""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeUtil {
  import java.text.Normalizer

  private def formOf(name: String): Normalizer.Form = name match {
    case "NFC"  => Normalizer.Form.NFC
    case "NFD"  => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
  }

  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = formOf(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s // ASCII fast path: no realloc
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  private val CombiningMarks = "\\p{Mn}+".r

  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    val decomposed = Normalizer.normalize(str, Normalizer.Form.NFD)
    val stripped = CombiningMarks.replaceAllIn(decomposed, "")
    if (stripped == str) s
    else UTF8String.fromString(Normalizer.normalize(stripped, Normalizer.Form.NFC))
  }
}
