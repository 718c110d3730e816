package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Longest-common-subsequence LENGTH between two token arrays — the
  * order-preserving overlap measure behind template/near-dup analysis
  * that set measures (Jaccard over shingles) miss: reordered tokens
  * share shingles but not a long common subsequence, so LCS separates
  * "same text lightly edited" from "same vocabulary, different text".
  * L[i][j] = if a_i = b_j then L[i−1][j−1]+1 else max(L[i−1][j],
  * L[i][j−1]) — the classic integer DP (Wagner–Fischer family).
  *
  * Shipped like [[DtwDistance]]: a native Expression running one
  * O(n·m) rolling-row DP per row; CodegenFallback is deliberate
  * because callers run it on BOUNDED token prefixes of candidate
  * PAIRS (post-blocking), never on raw corpus rows. All-integer —
  * an oracle replaying the recurrence (DuckDB anti-diagonal
  * recursion) reproduces it exactly on any engine. NULL when either
  * side is NULL or contains a NULL element; 0 for empty arrays.
  *
  * Reference analog: none — extension layer (SURVEY.md §2.6 last row).
  */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<string>, array<string>), got ($l, $r)")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lcs"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val la = a.asInstanceOf[ArrayData]
    val lb = b.asInstanceOf[ArrayData]
    if (DtwUtil.hasNullElement(la) || DtwUtil.hasNullElement(lb)) null
    else {
      val x = Array.tabulate(la.numElements())(i => la.getUTF8String(i))
      val y = Array.tabulate(lb.numElements())(i => lb.getUTF8String(i))
      Integer.valueOf(LcsUtil.lcs(x, y))
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

object LcsUtil {

  /** Rolling-row integer DP; cell order cannot change results (each cell
    * is a fixed function of its three predecessors).
    */
  def lcs(x: Array[org.apache.spark.unsafe.types.UTF8String],
      y: Array[org.apache.spark.unsafe.types.UTF8String]): Int = {
    val n = x.length
    val m = y.length
    if (n == 0 || m == 0) return 0
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        cur(j) =
          if (x(i - 1).equals(y(j - 1))) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m)
  }
}
