package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Delta + LEB128-varint codec for SORTED non-negative long arrays — the
  * standard posting-list layout of every search index (gaps between
  * consecutive doc ids are small, so one-or-two-byte varints replace
  * 8-byte longs; Lucene/ES ship exactly this shape). The byte LENGTH of
  * the encoding is a pure integer function of the gaps (1 byte per 7-bit
  * group), which is what lets an oracle replay the compressed size
  * exactly while a pinned round-trip equality proves decode ∘ encode =
  * id on the engine side.
  */
case class DeltaVarintEncode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<long>, got $t")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_delta_varint_enc"

  override protected def nullSafeEval(input: Any): Any =
    VarintUtil.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.VarintUtil$$.MODULE$$.encode($c);""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class DeltaVarintDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_delta_varint_dec"

  override protected def nullSafeEval(input: Any): Any =
    VarintUtil.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.VarintUtil$$.MODULE$$.decode($c);""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VarintUtil {

  /** Delta + LEB128: first value verbatim (delta from 0), then gaps.
    * Fails loudly on a violated contract (negative or descending input) —
    * a silently negative gap would round-trip wrong.
    */
  def encode(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new java.io.ByteArrayOutputStream(n * 2)
    var prev = 0L
    var i = 0
    while (i < n) {
      val v = a.getLong(i)
      require(v >= prev,
        s"delta_varint_enc requires sorted non-negative input; saw $v after $prev at $i")
      var d = v - prev
      prev = v
      while ((d & ~0x7fL) != 0L) {
        out.write(((d & 0x7f) | 0x80).toInt)
        d >>>= 7
      }
      out.write(d.toInt)
      i += 1
    }
    out.toByteArray
  }

  def decode(b: Array[Byte]): UnsafeArrayData = {
    val vals = scala.collection.mutable.ArrayBuffer.empty[Long]
    var acc = 0L
    var i = 0
    var d = 0L
    var shift = 0
    while (i < b.length) {
      val byte = b(i) & 0xff
      d |= (byte & 0x7fL) << shift
      if ((byte & 0x80) == 0) {
        acc += d
        vals += acc
        d = 0L
        shift = 0
      } else {
        shift += 7
        require(shift < 64, s"varint overruns 64 bits at byte $i")
      }
      i += 1
    }
    require(shift == 0, "truncated varint stream: continuation bit set on final byte")
    UnsafeArrayData.fromPrimitiveArray(vals.toArray)
  }
}
