package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Portable integer sign-LSH: hyperplane components are ±1 drawn from
  * bit 0 of the first 8 md5 bytes of "t|p|d" (big-endian — the value any
  * engine reads as `('0x'||substr(md5(t||'|'||p||'|'||d),1,16))::UBIGINT
  * & 1`), and the input vector is quantized to `floor(x * 2^20)` longs,
  * so each bucket bit is the sign of an EXACT integer dot product — no
  * float summation order anywhere, bit-identical across engines.
  */
object PortableLsh {

  /** ±1 sign of hyperplane component (table, plane, dim). */
  def sign(t: Int, p: Int, d: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(s"$t|$p|$d".getBytes("UTF-8"))
    if ((digest(7) & 1) == 1) 1L else -1L
  }

  /** Flattened sign matrix, indexed ((t * planes) + p) * dim + d. */
  def signMatrix(nTables: Int, planesPerTable: Int, dim: Int): Array[Long] = {
    val out = new Array[Long](nTables * planesPerTable * dim)
    var t = 0
    while (t < nTables) {
      var p = 0
      while (p < planesPerTable) {
        var d = 0
        while (d < dim) {
          out(((t * planesPerTable) + p) * dim + d) = sign(t, p, d)
          d += 1
        }
        p += 1
      }
      t += 1
    }
    out
  }

  /** One bucket long per table: bit (planes-1-p) of table t's bucket is
    * `sign-dot(t, p) > 0`. Invoked per row from generated code — one
    * static-shaped call keeps the stage in whole-stage codegen.
    */
  def buckets(
      vec: ArrayData,
      signs: Array[Long],
      nTables: Int,
      planesPerTable: Int,
      dim: Int
  ): UnsafeArrayData = {
    val n = math.min(dim, vec.numElements())
    val q = new Array[Long](n)
    var d = 0
    while (d < n) {
      q(d) = math.floor(vec.getFloat(d).toDouble * 1048576.0).toLong
      d += 1
    }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < planesPerTable) {
        val base = ((t * planesPerTable) + p) * dim
        var dot = 0L
        d = 0
        while (d < n) {
          dot += signs(base + d) * q(d)
          d += 1
        }
        bucket = (bucket << 1) | (if (dot > 0L) 1L else 0L)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ±1 Rademacher component for the random-projection family — same md5
    * construction as [[sign]] but namespaced under "rp|" so projection
    * and LSH draw independent matrices.
    */
  def rpSign(k: Int, d: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(s"rp|$k|$d".getBytes("UTF-8"))
    if ((digest(7) & 1) == 1) 1L else -1L
  }

  /** Flattened projection sign matrix, indexed k * dim + d. */
  def rpMatrix(outDim: Int, dim: Int): Array[Long] = {
    val out = new Array[Long](outDim * dim)
    var k = 0
    while (k < outDim) {
      var d = 0
      while (d < dim) {
        out(k * dim + d) = rpSign(k, d)
        d += 1
      }
      k += 1
    }
    out
  }

  /** Exact integer Rademacher dots: input quantized to floor(x·2^20)
    * longs, dots_k = Σ_d sign(k,d)·q_d — pure integer arithmetic, so the
    * whole projection is order-insensitive and bit-identical across
    * engines. One primitive loop per row, invoked from generated code.
    */
  def projDots(vec: ArrayData, signs: Array[Long], outDim: Int, dim: Int): UnsafeArrayData = {
    val n = math.min(dim, vec.numElements())
    val q = new Array[Long](n)
    var d = 0
    while (d < n) {
      q(d) = math.floor(vec.getFloat(d).toDouble * 1048576.0).toLong
      d += 1
    }
    val out = new Array[Long](outDim)
    var k = 0
    while (k < outDim) {
      val base = k * dim
      var dot = 0L
      d = 0
      while (d < n) {
        dot += signs(base + d) * q(d)
        d += 1
      }
      out(k) = dot
      k += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `array<float>` embedding → `array<long>` of `outDim` exact integer
  * Rademacher sign-dots (see [[PortableLsh.projDots]]) — the portable
  * Johnson–Lindenstrauss projection core. Scaling to double
  * (dot / (2^20·√outDim)) is left to the caller so the stored column
  * stays exact.
  */
case class PortableSignProject(child: Expression, outDim: Int, dim: Int)
    extends UnaryExpression {

  require(outDim >= 1 && dim >= 1, s"bad projection shape: outDim=$outDim dim=$dim")

  private lazy val signs: Array[Long] = PortableLsh.rpMatrix(outDim, dim)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rp_dots"

  override protected def nullSafeEval(input: Any): Any =
    PortableLsh.projDots(input.asInstanceOf[ArrayData], signs, outDim, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("rpSigns", signs, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.functions.PortableLsh$$.MODULE$$.projDots(
         |  $a, $signsRef, $outDim, $dim);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<float>` embedding → `array<long>` of one portable sign-LSH
  * bucket key per table (see [[PortableLsh]]). The sign matrix is built
  * once at expression construction and shipped as a codegen reference —
  * the per-row work is one primitive loop, zero allocation beyond the
  * output array.
  */
case class PortableLshBuckets(child: Expression, nTables: Int, planesPerTable: Int, dim: Int)
    extends UnaryExpression {

  require(nTables >= 1 && planesPerTable >= 1 && planesPerTable <= 63 && dim >= 1,
    s"bad LSH shape: tables=$nTables planes=$planesPerTable dim=$dim")

  private lazy val signs: Array[Long] = PortableLsh.signMatrix(nTables, planesPerTable, dim)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  override protected def nullSafeEval(input: Any): Any =
    PortableLsh.buckets(input.asInstanceOf[ArrayData], signs, nTables, planesPerTable, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("lshSigns", signs, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.functions.PortableLsh$$.MODULE$$.buckets(
         |  $a, $signsRef, $nTables, $planesPerTable, $dim);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
