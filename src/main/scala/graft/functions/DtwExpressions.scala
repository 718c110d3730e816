package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Exact dynamic-time-warping distance between two double series —
  * the elastic sequence-alignment measure (Sakoe–Chiba 1978) that
  * point-wise metrics (L2, correlation) get wrong under phase shift:
  * D[i][j] = |x_i − y_j| + min(D[i−1][j], D[i][j−1], D[i−1][j−1]).
  *
  * Shipped as a native Expression (the engine's scalar-extension
  * surface, like [[EditDistanceAtMost1]]): one O(n·m) primitive-double
  * rolling-row DP per row, no per-row UDF boxing. CodegenFallback is
  * deliberate — callers run it on BOUNDED aggregated series (e.g. a
  * 30-day daily profile per key), never on raw corpus rows, so the DP
  * dominates and codegen would buy nothing.
  *
  * Engine-portable by construction: the only operations are abs, +,
  * and min over IEEE doubles — every DP cell is a fixed arithmetic
  * tree of the inputs, so an oracle replaying the same recurrence
  * (e.g. DuckDB anti-diagonal recursion) reproduces the distance
  * bit-for-bit. NULL when either side is NULL, empty, or contains a
  * NULL element.
  *
  * Reference analog: none — the reference has no sequence-similarity
  * surface; extension layer (SURVEY.md §2.6 last row).
  */
case class DtwDistance(left: Expression, right: Expression)
    extends BinaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, array<double>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dtw"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val la = a.asInstanceOf[ArrayData]
    val lb = b.asInstanceOf[ArrayData]
    // NULL elements → NULL result, like the empty-array contract. Without
    // this check the behavior depends on the physical representation
    // (UnsafeArrayData reads a null slot as 0.0; GenericArrayData NPEs).
    if (DtwUtil.hasNullElement(la) || DtwUtil.hasNullElement(lb)) null
    else {
      val x = la.toDoubleArray()
      val y = lb.toDoubleArray()
      if (x.length == 0 || y.length == 0) null
      else java.lang.Double.valueOf(DtwUtil.dtw(x, y))
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

object DtwUtil {

  def hasNullElement(arr: ArrayData): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Rolling-row DP; cell values are identical to the full-matrix
    * recurrence (each cell is a fixed function of its three
    * predecessors, so evaluation order cannot change results). */
  def dtw(x: Array[Double], y: Array[Double]): Double = {
    val n = x.length
    val m = y.length
    val prev = new Array[Double](m + 1) // row i-1, 1-based in j
    val cur = new Array[Double](m + 1)
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        val c = math.abs(x(i - 1) - y(j - 1))
        cur(j) =
          if (i == 1 && j == 1) c
          else {
            var best = Double.MaxValue
            if (i > 1) best = math.min(best, prev(j)) // up
            if (j > 1) best = math.min(best, cur(j - 1)) // left
            if (i > 1 && j > 1) best = math.min(best, prev(j - 1)) // diag
            c + best
          }
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m)
  }
}
