package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Accuracy bound for the approximate-quantile sketch (the scale path for
  * percentiles: approx_percentile is a mergeable sketch — one pass,
  * map-side combined — where exact percentile must shuffle-sort each
  * group). The bound asserted is the sketch's contract: with accuracy
  * parameter A, the returned value's RANK is within n/A of the target
  * rank. q_agg_percentiles stays the exact oracle-checked query; this
  * spec covers the sketch against it.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_percentile rank error stays within the sketch's accuracy contract") {
    val ev = Tables(spark, sf).events.select($"value").na.drop()
    val n = ev.count()
    val acc = 100 // rank error <= n/100
    val qs = Seq(0.5, 0.9, 0.99)
    val approx = ev
      .agg(percentile_approx($"value", typedlit(qs), lit(acc)).as("a"))
      .as[Seq[Double]]
      .head()
    val sorted = ev.as[Double].collect().sorted
    for ((q, a) <- qs.zip(approx)) {
      // rank of the approximate answer in the exact sorted data
      val rank = sorted.count(_ <= a)
      val target = q * n
      val tol = n.toDouble / acc + 1
      assert(
        math.abs(rank - target) <= tol,
        s"p$q: approx=$a has rank $rank, target $target, tolerance $tol"
      )
    }
  }
}
