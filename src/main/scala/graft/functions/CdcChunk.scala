package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (Rabin-style): 1-based chunk START offsets
  * (in code points) of a document under a polynomial rolling hash — the
  * dedup-friendly segmentation where chunk boundaries move WITH the
  * content, so an insertion early in a document shifts every fixed-size
  * chunk but leaves all content-defined chunks after the edit identical
  * (the rsync/LBFS trick, and the chunk-granular near-dup prime at
  * corpus scale).
  *
  * Definition (chosen SQL-replayable — the oracle recomputes it from
  * scratch per position, the implementation-equality pattern):
  * over code points c_1..c_n, position i ≥ W is a boundary iff
  * `(Σ_{k=0..W-1} c_{i−k} · B^k mod P) mod M == 0` with W = 16,
  * B = 257, P = 2^31 − 1 (Mersenne), M = 64 (expected chunk ≈ 64
  * chars). Boundaries are position-independent (no min-chunk feedback
  * loop), so the boundary SET — not a sequential scan — defines the
  * chunks, which is exactly what a declarative replay can express.
  * Output: array(1, b_1+1, b_2+1, …) — chunk i spans [s_i, s_{i+1}).
  * Code points reach 0x10FFFF, so a term is bounded by 0x10FFFF · P
  * ≈ 2^52 and the 16-term window sum by 0x10FFFF · 16 · P < 2^56 —
  * still exact in plain signed 64-bit in both engines, no wraparound
  * semantics to match. (An earlier comment claimed 2^43 by assuming
  * byte-sized code points; the conclusion held, the bound was wrong.)
  */
case class CdcChunkStarts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunk_starts"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunkUtil.starts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.CdcChunkUtil$$.MODULE$$.starts($c);""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunkUtil {
  final val Window = 16
  final val Base = 257L
  final val Mod = 2147483647L // 2^31 - 1
  final val Mask = 64L

  /** B^k mod P for k = 0..W-1 — the constants the oracle inlines. */
  val powers: Array[Long] = {
    val out = new Array[Long](Window)
    out(0) = 1L
    var k = 1
    while (k < Window) { out(k) = out(k - 1) * Base % Mod; k += 1 }
    out
  }

  /** 1-based chunk start offsets in code points. One O(n) pass: the
    * window hash updates incrementally (add head term, drop tail term —
    * each position costs two mults), matching the per-position
    * Σ c_{i−k}·B^k mod P definition exactly because P is prime and all
    * arithmetic stays within signed-64 exactness.
    */
  def starts(input: UTF8String): UnsafeArrayData = {
    val s = input.toString
    val n = s.codePointCount(0, s.length)
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < s.length) {
      val cp = s.codePointAt(off)
      cps(ci) = cp; ci += 1
      off += Character.charCount(cp)
    }
    val buf = scala.collection.mutable.ArrayBuffer[Int](1)
    if (n >= Window) {
      // h(i) = sum_{k=0..W-1} c_{i-k} * B^k  (mod P), i 1-based
      var h = 0L
      var i = 0
      while (i < Window) { // h(W): c_W*B^0 + c_{W-1}*B^1 + ...
        h = (h + cps(i).toLong * powers(Window - 1 - i)) % Mod
        i += 1
      }
      if (h % Mask == 0L && Window < n) buf += Window + 1
      i = Window
      while (i < n) {
        // slide: drop c_{i-W+1}'s B^{W-1} term, shift by B, add c_{i+1}
        h = (h - cps(i - Window).toLong * powers(Window - 1) % Mod + Mod) % Mod
        h = (h * Base + cps(i).toLong) % Mod
        if (h % Mask == 0L && i + 1 < n) buf += i + 2 // boundary AFTER pos i+1
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(buf.toArray)
  }
}
