package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Attach named in-flight metrics to a frame (`Dataset.observe`): the
    * metrics are aggregated DURING the job that consumes the frame — a
    * data-quality gate with ZERO extra passes, where a separate
    * `df.agg(...)` audit would re-scan 100 TB. Batch reads them from
    * `Observation`/`QueryExecutionListener`, streaming from every
    * micro-batch's `StreamingQueryProgress.observedMetrics` — the C12
    * instrumentation surface of the reference (consumer statistics,
    * callysto/src/kafka/contexts.rs:12-56) upgraded to arbitrary
    * aggregate expressions over the data itself.
    */
  def observed(df: DataFrame, name: String, metrics: Column*): DataFrame = {
    require(metrics.nonEmpty, "need at least one metric expression")
    df.observe(name, metrics.head, metrics.tail: _*)
  }

  /** Stock quality metrics for [[observed]]: row count plus a null count
    * per listed column — the minimal completeness gate.
    */
  def qualityMetrics(cols: Seq[String]): Seq[Column] =
    count(lit(1)).as("n_rows") +:
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
}
