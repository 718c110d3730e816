package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio text-quality signal (deflate level 6, raw stream):
  * `compressed_bytes / raw_bytes` of the UTF-8 text. Highly repetitive
  * machine-generated text compresses far below natural language, and
  * near-random strings sit close to 1.0 — the standard cheap quality
  * filter next to the heuristic ratios in TextAnalysis (Gopher-style
  * repetition scoring is q_text_repetition; this is its codec-grade
  * complement that needs no tokenization at all).
  *
  * Reference analog: quality gates live in user closures over the message
  * stream (callysto/src/types/agent.rs:86-91); here it is a codegen'd
  * column expression that stays inside whole-stage codegen — one helper
  * call per row, a thread-local reused Deflater, zero per-row codec
  * allocation. At 100 TB this reads every byte once, embarrassingly
  * row-parallel, no shuffle.
  *
  * Not SQL-oracle-able (DuckDB exposes no deflate); contract is asserted
  * in ExtensionSpec: determinism, the repetitive ≪ natural < random
  * ordering, and exact agreement with a direct JVM Deflater run.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_deflate_ratio"

  override protected def nullSafeEval(input: Any): Any =
    DeflateUtil.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.DeflateUtil$$.MODULE$$.ratio($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateUtil {
  // Deflater is native-backed and costly to construct; executor task
  // threads are long-lived, so one per thread amortizes to zero. reset()
  // between rows is a cheap zlib state rewind.
  private val local = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(6, /* nowrap = */ true)
  }
  private val sink = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }

  /** compressed/raw byte ratio; empty text → 1.0 (no evidence either way). */
  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = sink.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }
}
