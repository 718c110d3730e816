package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built [[BloomFilter]] (Spark's public
  * mergeable sketch, `org.apache.spark.util.sketch`). The filter rides
  * along inside the expression tree — it is Serializable, so the closure
  * ships once per task like a broadcast, and codegen pins it as a
  * reference object: the per-row cost is the sketch's two hash probes,
  * fully inside whole-stage codegen.
  *
  * This is the executor half of the semi-join reduction pattern
  * ([[graft.operators.Joins.bloomSemiJoin]]); Spark's own
  * InjectRuntimeFilter applies the same idea automatically when join
  * statistics allow — this expression makes it an explicit, composable
  * operator (usable on the probe side of ANY downstream op, not just the
  * immediate join).
  *
  * False positives pass (by design, removed by the exact join that
  * follows); false negatives cannot happen — the guarantee JoinsSpec
  * asserts.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires long/int/string key, got $t")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType => filter.mightContainLong(input.asInstanceOf[Long])
    case IntegerType => filter.mightContainLong(input.asInstanceOf[Int].toLong)
    case StringType => filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("graftBloom", filter, classOf[BloomFilter].getName)
    child.dataType match {
      case LongType =>
        nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $bf.mightContainLong($a);")
      case IntegerType =>
        nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $bf.mightContainLong((long) $a);")
      case StringType =>
        nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $bf.mightContainBinary($a.getBytes());")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
