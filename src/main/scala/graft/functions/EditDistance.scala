package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded edit distance: `ed ≤ 1` decided in ONE linear scan, returning
  * 0, 1, or NULL (= "more than 1"). The verify step of deletion-
  * neighborhood fuzzy matching ([[graft.operators.Dedup.editDistancePairs]])
  * never needs the exact distance of far-apart strings — but the general
  * `levenshtein` builds its O(|a|·|b|) DP table before the caller's
  * `<= 1` filter can discard the row. Early-exit banded matching is the
  * standard trick (cf. Navarro, "A guided tour to approximate string
  * matching", CSUR 2001 §5: cutoff at band k); for k=1 the band IS one
  * alignment walk with a single permitted skip.
  *
  * Reference analog: none — the reference has no string-similarity
  * surface at all; this is part of the extension layer (SURVEY.md §2.6
  * last row) where a native codegen'd Expression replaces what would be
  * a per-row UDF.
  *
  * Distance is over Unicode CODE POINTS — the same comparison plane as
  * the `levenshtein` it replaces (and the DuckDB oracle), so one
  * supplementary-plane substitution counts as ONE edit, not two
  * mismatching UTF-16 units. For pure-BMP input the code-point walk
  * degenerates to the code-unit walk at the same cost.
  */
case class EditDistanceAtMost1(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires (string, string), got ($l, $r)")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ed1"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = EditDistanceUtil.ed1(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    if (r < 0) null else Integer.valueOf(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh local per instance — two ed1 calls in one codegen'd projection
    // must not collide on a shared variable name
    val r = ctx.freshName("ed1r")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      int $r = graft.functions.EditDistanceUtil$$.MODULE$$.ed1($a, $b);
      if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

object EditDistanceUtil {

  /** 0 or 1 if edit distance ≤ 1, else -1 — one scan, no DP table.
    * Compares CODE POINTS (not UTF-16 units) to stay on levenshtein's
    * comparison plane for supplementary-plane text.
    */
  def ed1(ua: UTF8String, ub: UTF8String): Int = {
    val a = codePoints(ua.toString)
    val b = codePoints(ub.toString)
    val la = a.length
    val lb = b.length
    val dl = la - lb
    if (dl > 1 || dl < -1) return -1
    if (dl == 0) {
      // substitution case: at most one mismatching position
      var i = 0
      var diff = 0
      while (i < la) {
        if (a(i) != b(i)) {
          diff += 1
          if (diff > 1) return -1
        }
        i += 1
      }
      diff
    } else {
      // insertion/deletion case: walk both, permit ONE skip on the longer
      val (s, l) = if (dl < 0) (a, b) else (b, a)
      var i = 0
      var j = 0
      var skipped = false
      while (i < s.length) {
        if (s(i) == l(j)) { i += 1; j += 1 }
        else if (!skipped) { skipped = true; j += 1 }
        else return -1
      }
      1 // lengths differ, so the distance is exactly 1
    }
  }

  /** Decode a string to its code-point array in one linear pass. */
  private def codePoints(s: String): Array[Int] = {
    val n = s.codePointCount(0, s.length)
    val out = new Array[Int](n)
    var i = 0
    var k = 0
    while (k < n) {
      val cp = s.codePointAt(i)
      out(k) = cp
      i += Character.charCount(cp)
      k += 1
    }
    out
  }
}

/** `graft_deletions(s)` → array<string>: the string itself plus every
  * single-CODE-POINT deletion, first-occurrence-deduped (the FastSS k=1
  * blocking neighborhood — see Dedup.editDistancePairs). A codegen'd
  * replacement for the slice/concat higher-order-function chain, which
  * spent ~20 Catalyst array allocations per deletion; here each variant
  * is one substring concat. Deletions walk code points so the
  * neighborhood lives on the same comparison plane as `graft_ed1` and
  * `levenshtein` for supplementary-plane keys.
  */
object DeletionNeighborhoodUtil {
  def deletions(u: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val s = u.toString
    val out = new java.util.LinkedHashSet[String]()
    out.add(s)
    var i = 0
    while (i < s.length) {
      val step = Character.charCount(s.codePointAt(i))
      out.add(s.substring(0, i) + s.substring(i + step))
      i += step
    }
    val arr = new Array[AnyRef](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) {
      arr(k) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
}

case class DeletionNeighborhood(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_deletions"

  override protected def nullSafeEval(input: Any): Any =
    DeletionNeighborhoodUtil.deletions(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.DeletionNeighborhoodUtil$$.MODULE$$.deletions($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
