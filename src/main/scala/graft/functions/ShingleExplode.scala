package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Generator (UDTF): one output row per DISTINCT word n-gram
  * shingle of the normalized input text — the engine's generator
  * extension surface (SURVEY.md §2.6 last row; mirrors "tokenize/explode"
  * UDTF parity, §7.3).
  *
  * Equivalent to `explode(array_distinct(transform(...)))` but in a single
  * pass over the string: no intermediate token array, no shingle array
  * materialization, no per-element lambda dispatch — at 100 TB the
  * inverted-index build (dedup's first shuffle) reads every byte of the
  * corpus through this path.
  *
  * Normalization matches TextOps.normText (lower, collapse whitespace,
  * trim); documents shorter than n tokens yield their whole normalized
  * text as a single shingle (same fallback as TextOps.shingles).
  */
case class ShingleExplode(child: Expression, n: Int)
    extends Generator
    with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }

  override def elementSchema: StructType =
    StructType(Seq(StructField("shingle", StringType, nullable = false)))

  override def prettyName: String = "graft_shingles"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Iterator.empty
    val toks = TextTokenize.tokens(raw.asInstanceOf[UTF8String].toString)
    TextTokenize.shingleSet(toks, n).iterator.map(s => InternalRow(UTF8String.fromString(s)))
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
