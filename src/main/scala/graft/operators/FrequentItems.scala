package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-pass distributed heavy hitters (approximate-then-exact).
  *
  * Pass 1 reduces the whole column to ONE Misra–Gries summary of capacity
  * k ([[graft.functions.FrequentItemsAgg]]): map-side partial sketches,
  * one tiny merged row at the driver side of the agg — no shuffle keyed on
  * the item. Pass 2 broadcast-semi-joins the ≤ k candidate items back and
  * exact-counts only them. For s·n thresholds with k ≥ ⌈1/s⌉ − 1 the
  * sketch provably retains every true heavy hitter, so the output is the
  * EXACT answer of "items with count ≥ s·n" — at the cost of one extra
  * scan instead of a full-vocabulary shuffle (the difference between a
  * bounded and an unbounded reduce state on a 100 TB corpus with
  * billions of distinct items).
  */
object FrequentItems {

  /** All items of `itemCol` (string) with count ≥ ceil(s · n), counted
    * exactly; n = number of non-null rows. Requires s > 1/(k+1) so the
    * sketch cannot drop a qualifying item.
    *
    * Output: (item, cnt), one row per heavy hitter.
    */
  def heavyHitters(df: DataFrame, itemCol: String, s: Double, k: Int): DataFrame = {
    require(s > 0 && s < 1, s"threshold fraction must be in (0,1), got $s")
    require(
      s > 1.0 / (k + 1),
      s"capacity too small for threshold: need k >= ceil(1/s)-1 = ${math.ceil(1 / s).toLong - 1}, got $k")
    val mg = udaf(new graft.functions.FrequentItemsAgg(k))
    val items = df.select(col(itemCol).cast("string").as("item")).filter(col("item").isNotNull)
    // one row: the merged summary AND the exact row count from the same scan
    val sketch = items.agg(mg(col("item")).as("m"), count(lit(1)).as("n"))
    val cand = sketch.select(explode(map_keys(col("m"))).as("item"), col("n"))
    items
      .join(broadcast(cand), "item")
      .groupBy(col("item"), col("n"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= ceil(lit(s) * col("n")))
      .select(col("item"), col("cnt"))
  }
}
