package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Operational diagnostics for 100 TB runs. */
object Diagnostics {

  /** Key-skew report for a prospective shuffle key: per-key counts reduced
    * to one summary row — row/key totals, the hottest key's count, the
    * median key count, and the skew ratio (max / mean). The number that
    * decides whether a groupBy/join on this key needs salting
    * ([[Joins.saltedJoin]]) or AQE skew handling BEFORE burning a cluster
    * run on it: ratio ≈ 1 is uniform, ratios in the hundreds mean one
    * reducer owns the job's tail latency.
    *
    * Two partial-aggregate passes (key counts, then their moments) — runs
    * on the full corpus, no sampling surprises, nothing driver-side.
    */
  def skewReport(df: DataFrame, keyCols: String*): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
    counts.agg(
      sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("cnt")).as("max_cnt"),
      percentile(col("cnt"), lit(0.5)).as("p50_cnt"),
      (max(col("cnt")).cast("double") /
        (sum(col("cnt")).cast("double") / count(lit(1)))).as("skew_ratio"))
  }
}
