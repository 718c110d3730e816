package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Joins

/** Property-based check of the custom as-of join exec against an
  * in-memory model: random (key, ts) streams with deliberate key skew,
  * duplicate timestamps, and null timestamps, compared to a direct
  * per-left-row "max right row at or before ts" fold. The sorted-merge in
  * AsofJoinExec holds O(1) state per partition — exactly the kind of
  * cursor logic a property test protects better than examples do.
  */
class AsofPropertySpec extends SparkSpec {
  import spark.implicits._

  // few keys (forced collisions), small ts range (forced equal-ts ties)
  private val rowGen: Gen[(Long, Long)] = for {
    key <- Gen.choose(1L, 6L)
    ts <- Gen.choose(0L, 40L)
  } yield (key, ts)

  private def sample(n: Int, seed: Long): List[(Long, Long)] =
    Gen.listOfN(n, rowGen).apply(Gen.Parameters.default, Seed(seed)).get

  /** Model: for a left row (k, t), the payload is the max id among right
    * rows with the same key and ts <= t; ties on ts resolved toward the
    * max payload (the exec's documented tie rule).
    */
  private def model(
      left: List[(Long, Long)],
      right: List[(Long, Long, Long)]
  ): Set[(Long, Long, Option[Long])] =
    left.map { case (k, t) =>
      val matches = right.filter { case (rk, rt, _) => rk == k && rt <= t }
      val pay = if (matches.isEmpty) None
      else {
        val bestTs = matches.map(_._2).max
        Some(matches.filter(_._2 == bestTs).map(_._3).max)
      }
      (k, t, pay)
    }.toSet

  test("asOfJoinNative matches the per-row model on 8 random skewed streams") {
    for (i <- 0 until 8) {
      val lRows = sample(40, 100L + i)
      val rRows = sample(30, 200L + i).zipWithIndex.map { case ((k, t), idx) =>
        (k, t, idx.toLong)
      }
      val l = lRows.toDF("k", "ts")
      val r = rRows.toDF("k", "ts", "pay")
      val got = Joins
        .asOfJoinNative(l, r, key = "k", tsCol = "ts", payload = Seq("pay"))
        .as[(Long, Long, Option[Long])]
        .collect()
        .toList
      // model is a set; the join returns one row per left row (duplicates
      // in the left input stay duplicated) — compare as multisets via sort
      val expected = lRows.map { case (k, t) =>
        val m = model(List((k, t)), rRows).head
        (k, t, m._3)
      }.sorted(Ordering.by((x: (Long, Long, Option[Long])) => (x._1, x._2, x._3.getOrElse(Long.MinValue))))
      val actual = got.sorted(Ordering.by((x: (Long, Long, Option[Long])) => (x._1, x._2, x._3.getOrElse(Long.MinValue))))
      assert(actual == expected, s"seed $i: as-of exec diverged from model")
    }
  }

  /** Forward model: min-(ts, payload) right row at or after each left ts,
    * optionally within tolerance.
    */
  private def modelForward(
      left: List[(Long, Long)],
      right: List[(Long, Long, Long)],
      tol: Option[Long]
  ): List[(Long, Long, Option[Long])] =
    left.map { case (k, t) =>
      val matches = right.filter { case (rk, rt, _) =>
        rk == k && rt >= t && tol.forall(rt - t <= _)
      }
      val pay = matches.sortBy { case (_, rt, p) => (rt, p) }.headOption.map(_._3)
      (k, t, pay)
    }

  test("forward direction matches the min-at-or-after model on 8 random streams") {
    for (i <- 0 until 8) {
      val lRows = sample(40, 300L + i)
      val rRows = sample(30, 400L + i).zipWithIndex.map { case ((k, t), idx) =>
        (k, t, idx.toLong)
      }
      val got = Joins
        .asOfJoinNative(
          lRows.toDF("k", "ts"), rRows.toDF("k", "ts", "pay"),
          "k", "ts", Seq("pay"), direction = "forward")
        .as[(Long, Long, Option[Long])]
        .collect()
        .toList
        .sorted(Ordering.by((x: (Long, Long, Option[Long])) => (x._1, x._2, x._3.getOrElse(Long.MinValue))))
      val expected = modelForward(lRows, rRows, None)
        .sorted(Ordering.by((x: (Long, Long, Option[Long])) => (x._1, x._2, x._3.getOrElse(Long.MinValue))))
      assert(got == expected, s"seed $i: forward as-of diverged from model")
    }
  }

  test("tolerance bounds matches in both directions (random streams)") {
    for (i <- 0 until 4) {
      val lRows = sample(30, 500L + i)
      val rRows = sample(25, 600L + i).zipWithIndex.map { case ((k, t), idx) =>
        (k, t, idx.toLong)
      }
      val l = lRows.toDF("k", "ts")
      val r = rRows.toDF("k", "ts", "pay")
      val tol = 5L
      val fwd = Joins
        .asOfJoinNative(l, r, "k", "ts", Seq("pay"), direction = "forward", toleranceMicros = Some(tol))
        .as[(Long, Long, Option[Long])].collect().toList
        .sorted(Ordering.by((x: (Long, Long, Option[Long])) => (x._1, x._2, x._3.getOrElse(Long.MinValue))))
      val fwdExp = modelForward(lRows, rRows, Some(tol))
        .sorted(Ordering.by((x: (Long, Long, Option[Long])) => (x._1, x._2, x._3.getOrElse(Long.MinValue))))
      assert(fwd == fwdExp, s"seed $i: forward+tolerance diverged")

      val bwd = Joins
        .asOfJoinNative(l, r, "k", "ts", Seq("pay"), toleranceMicros = Some(tol))
        .as[(Long, Long, Option[Long])].collect().toList
        .sorted(Ordering.by((x: (Long, Long, Option[Long])) => (x._1, x._2, x._3.getOrElse(Long.MinValue))))
      val bwdExp = lRows.map { case (k, t) =>
        val matches = rRows.filter { case (rk, rt, _) => rk == k && rt <= t }
        val pay = if (matches.isEmpty) None
        else {
          val bestTs = matches.map(_._2).max
          if (t - bestTs <= tol) Some(matches.filter(_._2 == bestTs).map(_._3).max) else None
        }
        (k, t, pay)
      }.sorted(Ordering.by((x: (Long, Long, Option[Long])) => (x._1, x._2, x._3.getOrElse(Long.MinValue))))
      assert(bwd == bwdExp, s"seed $i: backward+tolerance diverged")
    }
  }

  test("asOfJoinNative: null timestamps behave as earliest (right) / match-nothing-later (left)") {
    val l = Seq((1L, Some(10L), "a"), (1L, None, "b")).toDF("k", "ts", "tag")
    val r = Seq((1L, Some(5L), 100L), (1L, None, 50L)).toDF("k", "ts", "pay")
    val out = Joins
      .asOfJoinNative(l, r, "k", "ts", Seq("pay"))
      .as[(Long, Option[Long], String, Option[Long])]
      .collect()
      .map(x => (x._3, x._4))
      .toMap
    // left@10 sees right@5 (latest real ts <= 10); left@null sorts first and
    // sees only the null-ts right row (treated as -infinity)
    assert(out("a") == Some(100L))
    assert(out("b") == Some(50L))
  }
}
