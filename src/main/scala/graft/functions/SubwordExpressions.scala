package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match-first subword tokenization (the WordPiece/BPE
  * inference step): split on whitespace, then repeatedly take the longest
  * vocab piece that prefixes the remaining word, falling back to a
  * single character. The LLM-pipeline primitive that turns "token count"
  * from a whitespace approximation into a real subword count, and the
  * per-document step of every tokenize-and-pack pipeline.
  *
  * Deterministic and engine-portable: the output is a pure function of
  * (text, vocab), so an oracle can replay it with a recursive
  * longest-prefix scan (see queries/TextAnalysis.scala's
  * q_text_subword). The vocab is bounded (top-K n-grams, driver-collected
  * like the IVF codebook — KBs, not data-scale) and ships to executors as
  * a codegen reference object; per-row work is one linear scan with at
  * most `maxPieceLen` hash probes per position, zero allocation beyond
  * the output pieces.
  */
object Subword {

  def tokenize(
      text: UTF8String,
      vocab: java.util.HashSet[String],
      maxPieceLen: Int
  ): GenericArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    val words = text.toString.split("\\s+")
    var w = 0
    while (w < words.length) {
      val word = words(w)
      val len = word.length
      var pos = 0
      while (pos < len) {
        var n = math.min(maxPieceLen, len - pos)
        var take = 1
        while (n >= 2) {
          if (vocab.contains(word.substring(pos, pos + n))) { take = n; n = 1 }
          n -= 1
        }
        out.add(UTF8String.fromString(word.substring(pos, pos + take)))
        pos += take
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `graft_subword(text, vocabArray)` → array<string> of greedy pieces.
  * The vocab argument must be foldable (an array literal): it is
  * evaluated ONCE at planning into a hash set and shipped as a codegen
  * reference — never re-evaluated per row.
  */
case class SubwordTokenize(left: Expression, right: Expression, maxPieceLen: Int)
    extends BinaryExpression {

  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName vocab must be a foldable array literal")
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires (string, array<string>), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_subword"

  private lazy val vocabSet: java.util.HashSet[String] = {
    val set = new java.util.HashSet[String]()
    val arr = right.eval().asInstanceOf[ArrayData]
    if (arr != null) {
      var i = 0
      while (i < arr.numElements()) {
        set.add(arr.getUTF8String(i).toString)
        i += 1
      }
    }
    set
  }

  override protected def nullSafeEval(text: Any, vocab: Any): Any =
    Subword.tokenize(text.asInstanceOf[UTF8String], vocabSet, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("subwordVocab", vocabSet, "java.util.HashSet<String>")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"""${ev.value} = graft.functions.Subword$$.MODULE$$.tokenize(
         |  $t, $setRef, $maxPieceLen);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}
