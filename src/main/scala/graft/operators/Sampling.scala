package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampling operators for training-data pipelines.
  *
  * Both are hash-based rather than RNG-stream-based: the keep decision is
  * a pure function of (row key, seed), so results are identical across
  * partitionings, retries, and cluster sizes — the property that matters
  * when a 100 TB sample must be reproducible and resumable. (Spark's
  * built-in `sample`/`sampleBy` draw from per-partition RNG streams, which
  * reshuffle under repartitioning.)
  */
object Sampling {

  /** Deterministic Bernoulli sample: keep a row iff
    * xxhash64(key, seed) mod 1e6 < fraction * 1e6.
    */
  def bernoulli(df: DataFrame, keyCol: String, fraction: Double, seed: Int): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    val bucket = pmod(xxhash64(col(keyCol), lit(seed)), lit(1000000L))
    df.filter(bucket < (fraction * 1e6).toLong)
  }

  /** Deterministic stratified sample: per-stratum fractions, same
    * hash-gate mechanism. Strata absent from the map are dropped.
    */
  def stratified(
      df: DataFrame,
      strataCol: String,
      fractions: Map[String, Double],
      keyCol: String,
      seed: Int
  ): DataFrame = {
    val bucket = pmod(xxhash64(col(keyCol), lit(seed)), lit(1000000L))
    val gate = fractions.foldLeft(lit(false)) { case (acc, (stratum, f)) =>
      acc || (col(strataCol) === stratum && bucket < (f * 1e6).toLong)
    }
    df.filter(gate)
  }
}
