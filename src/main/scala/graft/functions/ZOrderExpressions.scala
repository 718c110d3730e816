package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order (Morton) interleave: the multi-dimensional data-layout key.
  *
  * Sorting a table by ONE column makes that column's per-file min/max
  * ranges tight and every other column's ranges full-width — a filter on
  * any non-sort dimension scans the whole table. Interleaving the bits of
  * N dimensions into one sort key bounds the worst case across ALL of
  * them: a range filter on any single dimension touches ~n^((N-1)/N) of
  * the files instead of all of them. At 100 TB this is the difference
  * between a layout that serves one query pattern and one that serves
  * them all (the same trick lake formats expose as OPTIMIZE ZORDER BY).
  * The reference has no storage layout at all (topics are its only
  * organization — callysto/src/kafka/ctopic.rs:36-119); this is
  * batch-lake organization the Spark engine provides natively.
  *
  * Bit j of dimension i lands at position `j*N + i`; each input is first
  * masked to its low `bits` bits, so the key is a pure function of the
  * masked values and any engine can replay it with shift/and/or — see
  * [[ZOrder.oracleSql]] for the DuckDB form. N*bits must fit a signed
  * long (≤ 63).
  */
object ZOrder {

  def interleave(vals: Array[Long], bits: Int): Long = {
    val n = vals.length
    var key = 0L
    var i = 0
    while (i < n) {
      val v = vals(i) & ((1L << bits) - 1L)
      var j = 0
      while (j < bits) {
        key |= ((v >>> j) & 1L) << (j * n + i)
        j += 1
      }
      i += 1
    }
    key
  }

  /** DuckDB replay of [[ZOrderKey]] over SQL expressions `dims` (same
    * order as the Spark columns): OR of one shift term per (dim, bit).
    */
  def oracleSql(dims: Seq[String], bits: Int): String = {
    val n = dims.size
    val terms = for {
      (d, i) <- dims.zipWithIndex
      j <- 0 until bits
    } yield s"((((($d) & ${(1L << bits) - 1L}) >> $j) & 1) << ${j * n + i})"
    terms.mkString("(", " | ", ")")
  }
}

/** `graft_zorder(bits, d1, d2, ...)` → long Morton key (see [[ZOrder]]).
  * Codegen is one inline bit loop per dimension — no allocation, no
  * virtual calls, stays inside whole-stage codegen.
  */
case class ZOrderKey(dims: Seq[Expression], bits: Int) extends Expression {

  require(dims.nonEmpty && bits >= 1 && dims.size * bits <= 63,
    s"zorder needs 1..63 total bits, got ${dims.size} dims x $bits bits")

  override def children: Seq[Expression] = dims
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override def checkInputDataTypes(): TypeCheckResult =
    dims.find(d => d.dataType != LongType && d.dataType != IntegerType) match {
      case Some(bad) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName dims must be int/long, got ${bad.dataType}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = new Array[Long](dims.size)
    var i = 0
    while (i < vals.length) {
      val v = dims(i).eval(input)
      if (v == null) return null
      vals(i) = v match {
        case l: java.lang.Long    => l.longValue()
        case n: java.lang.Integer => n.longValue()
      }
      i += 1
    }
    ZOrder.interleave(vals, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val n = dims.size
    val evals = dims.map(_.genCode(ctx))
    val key = ctx.freshName("zkey")
    val mask = (1L << bits) - 1L
    // When this expression is non-nullable, ev.isNull is the FALSE
    // literal — no declaration, no assignment; the per-child null guards
    // are impossible then and are omitted entirely.
    val nullDecl = if (nullable) s"boolean ${ev.isNull} = false;" else ""
    val perDim = evals.zipWithIndex.map { case (e, i) =>
      val v = ctx.freshName("zv")
      val j = ctx.freshName("zj")
      val body =
        s"""long $v = ((long) ${e.value}) & ${mask}L;
           |for (int $j = 0; $j < $bits; $j++) {
           |  $key |= (($v >>> $j) & 1L) << ($j * $n + $i);
           |}""".stripMargin
      if (nullable)
        s"if (${e.isNull}) { ${ev.isNull} = true; } else {\n$body\n}"
      else body
    }
    val childCode = evals.map(_.code.toString).mkString("\n")
    val full =
      s"""$childCode
         |$nullDecl
         |long $key = 0L;
         |${perDim.mkString("\n")}
         |long ${ev.value} = $key;""".stripMargin
    ev.copy(code = code"$full")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(dims = newChildren)
}
