package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Hilbert-curve index for a 2-D layout key: maps (x, y) on the 2^16 ×
  * 2^16 grid to the distance along the Hilbert space-filling curve.
  *
  * The layout companion to [[ZOrderKey]]: both interleave two dimensions
  * into one sort key, but Hilbert ordering preserves locality strictly
  * better — every curve step moves to a GRID-ADJACENT cell (Morton order
  * jumps across the plane at power-of-two boundaries), so range filters
  * on either dimension touch fewer, more contiguous files (the reason
  * lake formats offer Hilbert clustering alongside z-order). Standard
  * bit-twiddling walk (Wikipedia "Hilbert curve", converted d↔(x,y)
  * form): per level s = 2^15…1, quadrant = (3·rx) XOR ry contributes
  * s²·quadrant, then the lower quadrant is rotated/reflected into
  * canonical orientation. Pure integer ops on the masked low 16 bits of
  * each input — any engine replays it with the same shift/and/xor walk
  * (the oracle runs it as a 16-step recursive CTE).
  *
  * Reference analog: none — the reference has no storage layout
  * (SURVEY.md §2.5); extension layer alongside graft_zorder.
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).find(d => d.dataType != LongType && d.dataType != IntegerType) match {
      case Some(bad) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName inputs must be int/long, got ${bad.dataType}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_hilbert"

  private def asLong(v: Any): Long = v match {
    case l: java.lang.Long    => l.longValue()
    case n: java.lang.Integer => n.longValue()
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(HilbertUtil.xy2d(asLong(a), asLong(b)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.HilbertUtil$$.MODULE$$.xy2d((long) $a, (long) $b);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

object HilbertUtil {

  /** Curve order: 16 bits per dimension (d fits in 32 bits). */
  val Bits: Int = 16

  /** (x, y) → Hilbert distance on the 2^16 grid; inputs masked to their
    * low 16 bits. The per-level rotate keeps every step grid-adjacent.
    */
  def xy2d(xIn: Long, yIn: Long): Long = {
    val n = 1L << Bits
    var x = xIn & (n - 1)
    var y = yIn & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant into canonical orientation; the reflection is
      // about the FULL grid (n−1−x): s−1−x goes negative once higher bits
      // are set and breaks the walk (hand-checked against the 4×4 curve)
      if (ry == 0) {
        if (rx == 1) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x
        x = y
        y = t
      }
      s >>= 1
    }
    d
  }
}
