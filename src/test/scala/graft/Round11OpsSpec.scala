package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, HilbertUtil, LcsUtil}
import graft.operators.Graphs

/** Hand-fixture adversarial specs for the round-11 operators: Hilbert
  * layout keys, LCS alignment, k-truss peeling.
  */
class Round11OpsSpec extends SparkSpec {

  test("HilbertUtil: canonical 4x4 curve, step adjacency, bijectivity") {
    // the published 4x4 curve (order-2 Hilbert), scaled to the 16-bit
    // grid by using only the low coordinates: d must visit grid-adjacent
    // cells in sequence
    val n = 256 // check an 8-bit subgrid exhaustively via low coords? too big; use 16x16
    val side = 16
    val cells = for (x <- 0 until side; y <- 0 until side) yield (x, y)
    // bijectivity on the low-coordinate subgrid is NOT expected (the
    // 16-bit curve visits the full plane), but distinctness of keys is:
    val keys = cells.map { case (x, y) => HilbertUtil.xy2d(x.toLong, y.toLong) }
    assert(keys.distinct.length == cells.length, "hilbert keys collided")
    val _ = n
    // hand-checked order-1 values embedded in the 16-bit walk: the four
    // quadrant corners of the FULL grid preserve the base motif
    val half = 1L << 15
    val full = (1L << 16) - 1
    val q00 = HilbertUtil.xy2d(0, 0)
    val q01 = HilbertUtil.xy2d(0, full)
    val q11 = HilbertUtil.xy2d(full, full)
    val q10 = HilbertUtil.xy2d(full, 0)
    assert(q00 == 0L)
    assert(q10 == (1L << 32) - 1, s"last curve point must be n^2-1, got $q10")
    assert(q01 < q11 && q11 < q10, "quadrant visit order broke the base motif")
    val _ = half
    // step adjacency: consecutive curve positions differ by one grid step.
    // Walk 4096 consecutive d values via inversion-free check: collect
    // (key, x, y) for a 64x64 block and verify every |Δd|=1 pair found
    // within the block is grid-adjacent
    val block = for (x <- 0 until 64; y <- 0 until 64)
      yield (HilbertUtil.xy2d(x.toLong, y.toLong), x, y)
    val byKey = block.map { case (k, x, y) => k -> ((x, y)) }.toMap
    var checked = 0
    block.foreach { case (k, x, y) =>
      byKey.get(k + 1).foreach { case (x2, y2) =>
        assert(math.abs(x - x2) + math.abs(y - y2) == 1,
          s"curve step $k -> ${k + 1} jumped from ($x,$y) to ($x2,$y2)")
        checked += 1
      }
    }
    assert(checked > 3000, s"adjacency check covered too few steps: $checked")
  }

  test("graft_hilbert expression equals HilbertUtil and handles nulls") {
    val s = spark
    import s.implicits._
    val rows = Seq((3L, 5L), (0L, 0L), (65535L, 0L), (70000L, 123L)).toDF("x", "y")
    val got = rows.select(GraftFunctions.hilbert($"x", $"y").as("h")).collect().map(_.getLong(0))
    val want = Seq((3L, 5L), (0L, 0L), (65535L, 0L), (70000L, 123L))
      .map { case (x, y) => HilbertUtil.xy2d(x, y) }
    assert(got.toSeq == want)
    val nullRow = Seq(Tuple1(1L)).toDF("x")
      .select(GraftFunctions.hilbert($"x", lit(null).cast("long")).as("h")).collect()(0)
    assert(nullRow.isNullAt(0))
  }

  test("LcsUtil + graft_lcs: known alignments, reordering penalty, null contract") {
    val s = spark
    import s.implicits._
    def lcsOf(a: Seq[String], b: Seq[String]): Int =
      Seq((a, b)).toDF("x", "y")
        .select(GraftFunctions.lcs($"x", $"y").as("l")).collect()(0).getInt(0)
    assert(lcsOf(Seq("a", "b", "c"), Seq("a", "b", "c")) == 3)
    assert(lcsOf(Seq("a", "b", "c", "d"), Seq("a", "x", "c", "d")) == 3)
    // REORDERED tokens: same vocabulary, short common subsequence — the
    // case shingle-set Jaccard scores as identical
    assert(lcsOf(Seq("a", "b", "c", "d"), Seq("d", "c", "b", "a")) == 1)
    assert(lcsOf(Seq.empty, Seq("a")) == 0)
    assert(lcsOf(Seq("x"), Seq.empty) == 0)
    // expression equals the direct JVM DP
    val a = Seq("t1", "t2", "t3", "t2", "t4")
    val b = Seq("t2", "t3", "t4", "t4")
    import org.apache.spark.unsafe.types.UTF8String
    assert(lcsOf(a, b) ==
      LcsUtil.lcs(a.map(UTF8String.fromString).toArray, b.map(UTF8String.fromString).toArray))
    // null element -> NULL (physical-representation-independent)
    val r = Seq(Tuple1("k")).toDF("k")
      .select(GraftFunctions.lcs(
        array(lit("a"), lit(null).cast("string")), array(lit("a"))).as("l"))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("ktruss: shared-edge triangles survive k=3, pendant edges peel away; cascades converge") {
    val s = spark
    import s.implicits._
    // two triangles sharing edge (1,2), plus a pendant edge (5,6) and a
    // path edge (3,5) that is in no triangle
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), // triangle A
      (1L, 4L), (2L, 4L), // triangle B shares (1,2)
      (3L, 5L), (5L, 6L) // no triangles
    ).toDF("src", "dst")
    val t3 = Graphs.ktruss(edges, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(t3 == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)))
    // k=4: every edge needs 2 triangles — only the shared edge (1,2) has
    // 2, but after its mates drop it cannot stand alone: the CASCADE
    // (not the first pass) must empty the graph
    val t4 = Graphs.ktruss(edges, k = 4).collect()
    assert(t4.isEmpty, s"expected empty 4-truss, got ${t4.mkString(",")}")
    // a 4-clique IS a 4-truss: every edge in exactly 2 triangles
    val clique = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val c4 = Graphs.ktruss(clique, k = 4).count()
    assert(c4 == 6L)
    intercept[IllegalArgumentException](Graphs.ktruss(edges, k = 2))
  }
}
