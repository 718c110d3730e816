package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd sketch expressions for the dedup family.
  *
  * The higher-order-function formulations (one `aggregate` with a k-wide
  * array accumulator) are correct and single-pass, but allocate a fresh
  * boxed k-element array per input element — ~|tokens| GenericArrayData
  * allocations per row. These expressions run the same math in one
  * primitive `long[]` loop: zero per-element allocation, fully inside
  * whole-stage codegen. At 100 TB (billions of documents) signature
  * construction is the dominant dedup cost; this is the hot path.
  *
  * Hash-family compatibility: values are IDENTICAL to the HOF versions
  * (`xxhash64(h, i)` = XXH64.hashInt(i, XXH64.hashLong(h, 42))), so
  * signatures, banding behavior, and the recall bounds asserted in
  * DedupSpec are unchanged.
  */

/** Single-pass distinct-shingle hashes straight from the text: tokenize →
  * n-gram shingle → xxhash64 (seed 42, identical values to
  * `xxhash64(shingle_string)` on the materialized string column) — no
  * intermediate string arrays, no regex. This is the corpus-bytes →
  * sketch-input edge of the dedup pipeline; on 100 TB it reads every byte,
  * so the 20× over the HOF formulation (regexp_replace + split +
  * transform/slice/concat_ws + array_distinct) is the dominant win.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextTokenize.shingleHashArray(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  /** One helper call per row — keeps the enclosing stage in whole-stage
    * codegen (no CodegenFallback InternalRow round-trip per row).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextTokenize$$.MODULE$$.shingleHashArray($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Single-pass per-token hashes (duplicates KEPT — simhash weights
  * repeated tokens); values identical to `xxhash64(token)` per token.
  */
case class TokenHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_hashes"

  // empty/whitespace-only text → one hash of "" — matches the HOF path
  // (split(normText, " ") of "" yields [""]), keeping blank-document
  // signatures identical between formulations
  override protected def nullSafeEval(input: Any): Any =
    TextTokenize.tokenHashArray(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextTokenize$$.MODULE$$.tokenHashArray($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** k-permutation MinHash signature over an array<long> of element hashes.
  * Empty input → Long.MaxValue-filled signature (matches the HOF fold).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val base = XXH64.hashLong(arr.getLong(j), 42L)
      var i = 0
      while (i < k) {
        val v = XXH64.hashInt(i + 1, base)
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val uad = classOf[UnsafeArrayData].getName
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val v = ctx.freshName("v")
      s"""
         |long[] $out = new long[$k];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |final int $n = $a.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  final long $base = $xxh.hashLong($a.getLong($j), 42L);
         |  for (int $i = 0; $i < $k; $i++) {
         |    final long $v = $xxh.hashInt($i + 1, $base);
         |    if ($v < $out[$i]) $out[$i] = $v;
         |  }
         |}
         |${ev.value} = $uad.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over an array<long> of token hashes, returned as 64
  * 0/1 longs (bit i of the downstream fingerprint). Bit test `(h>>i)&1`
  * is truth-equivalent to the HOF's `shiftright(h,i) % 2 != 0` for all
  * (including negative) longs.
  */
case class SimHashBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_simhash_bits"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cnt = new Array[Long](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < 64) {
        cnt(i) += (if (((h >> i) & 1L) != 0L) 1L else -1L)
        i += 1
      }
      j += 1
    }
    val bits = new Array[Long](64)
    var i = 0
    while (i < 64) {
      bits(i) = if (cnt(i) > 0) 1L else 0L
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val uad = classOf[UnsafeArrayData].getName
      val cnt = ctx.freshName("cnt")
      val bits = ctx.freshName("bits")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      s"""
         |long[] $cnt = new long[64];
         |final int $n = $a.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  final long $h = $a.getLong($j);
         |  for (int $i = 0; $i < 64; $i++) {
         |    $cnt[$i] += ((($h >> $i) & 1L) != 0L) ? 1L : -1L;
         |  }
         |}
         |long[] $bits = new long[64];
         |for (int $i = 0; $i < 64; $i++) {
         |  $bits[$i] = ($cnt[$i] > 0L) ? 1L : 0L;
         |}
         |${ev.value} = $uad.fromPrimitiveArray($bits);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
