package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd Catalyst expressions for embedding math over `array<float>`
  * columns — the engine's custom-expression extension surface (SURVEY.md
  * §2.6 last row, §7.3 planned upgrade).
  *
  * Why not higher-order functions: `aggregate(zip_with(...))` allocates an
  * intermediate array per row and evaluates a boxed lambda per element;
  * these expressions compile to a tight primitive loop inside whole-stage
  * codegen — the difference is ~an order of magnitude on 64-dim vectors
  * and grows with dimension. At 100 TB (billions of vectors) the HOF
  * version is a scale-killer; this is the hot path for ANN/dedup scoring.
  *
  * Numeric contract: accumulate in double, strict sequential fold order
  * (element 0..n-1) — bit-for-bit identical to the HOF left-fold and to
  * DuckDB's `list_sum(list_transform(...))` oracle, so oracle hashes stay
  * exact.
  *
  * Null contract: null array input → null result (standard null-intolerant
  * binary expression); null *elements* are treated as 0.0 (the corpus
  * schema forbids them; documented for safety).
  */
/** dot(a, b) over array<float> in double precision. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<float>), got ($l, $r)")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of an array<float>, in double. */
case class L2Norm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val v = x.getFloat(i).toDouble
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $v = (double) $a.getFloat($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** cosine(a, b) = dot / (||a|| * ||b||) in ONE pass over both arrays.
  *
  * Same fold order as computing the three sums independently, so results
  * are bit-identical to `DotProduct / (L2Norm * L2Norm)` and to the DuckDB
  * oracle's explicit list folds. Division by a zero norm yields NaN —
  * identical on both engines.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<float>), got ($l, $r)")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dp = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dp += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    // norms run over the FULL arrays (the dot truncates to the shared
    // prefix) so dot/(norm*norm) composition holds for unequal lengths
    // too — a truncated-norm cosine would inflate similarity
    while (i < x.numElements()) { val v = x.getFloat(i).toDouble; na += v * v; i += 1 }
    var j = n
    while (j < y.numElements()) { val v = y.getFloat(j).toDouble; nb += v * v; j += 1 }
    dp / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dp = ctx.freshName("dp")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dp = 0.0;
         |double $na = 0.0;
         |double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xv = (double) $a.getFloat($i);
         |  final double $yv = (double) $b.getFloat($i);
         |  $dp += $xv * $yv;
         |  $na += $xv * $xv;
         |  $nb += $yv * $yv;
         |}
         |for (int $i = $n; $i < $a.numElements(); $i++) {
         |  final double $xv = (double) $a.getFloat($i);
         |  $na += $xv * $xv;
         |}
         |for (int $i = $n; $i < $b.numElements(); $i++) {
         |  final double $yv = (double) $b.getFloat($i);
         |  $nb += $yv * $yv;
         |}
         |${ev.value} = $dp / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All-cells cosine scores in ONE pass: `array<double>` of
  * cosine(vec, cell_c) for a flattened centroid matrix shipped as a
  * codegen reference object. Replaces an N-element array of separate
  * [[CosineSimilarity]]-vs-literal trees: the VALUES are bit-identical
  * (same per-accumulator fold order — dot over the shared prefix, norms
  * over the full lengths, dp/(√na·√nb) division), but planning carries
  * one reference instead of N×dim literals and codegen emits one loop
  * instead of N — the per-stage compile cost that dominated small IVF
  * queries disappears.
  */
object CellCosineUtil {

  def scores(
      vec: org.apache.spark.sql.catalyst.util.ArrayData,
      flat: Array[Float],
      nCells: Int,
      dim: Int
  ): UnsafeArrayData = {
    val n = vec.numElements()
    val x = new Array[Double](n)
    var na = 0.0
    var i = 0
    while (i < n) {
      val v = vec.getFloat(i).toDouble
      x(i) = v; na += v * v; i += 1
    }
    val sna = java.lang.Math.sqrt(na)
    val out = new Array[Double](nCells)
    var c = 0
    while (c < nCells) {
      val base = c * dim
      val m = math.min(n, dim)
      var dp = 0.0
      var nb = 0.0
      var k = 0
      while (k < m) {
        val yv = flat(base + k).toDouble
        dp += x(k) * yv; nb += yv * yv; k += 1
      }
      while (k < dim) {
        val yv = flat(base + k).toDouble
        nb += yv * yv; k += 1
      }
      out(c) = dp / (sna * java.lang.Math.sqrt(nb))
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

case class CellCosines(child: Expression, flat: Array[Float], nCells: Int, dim: Int)
    extends UnaryExpression {

  require(nCells >= 1 && dim >= 1 && flat.length == nCells * dim,
    s"bad centroid matrix: ${flat.length} != $nCells x $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_cell_cosines"

  override protected def nullSafeEval(input: Any): Any =
    CellCosineUtil.scores(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], flat, nCells, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("cellCents", flat, "float[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.functions.CellCosineUtil$$.MODULE$$.scores(
         |  $a, $flatRef, $nCells, $dim);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
