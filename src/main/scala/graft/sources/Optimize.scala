package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** OPTIMIZE-style table rewrite: the maintenance pass that turns an
  * arbitrarily-laid-out table into the layout every later scan wants —
  *
  *   1. rows MULTI-DIMENSIONALLY clustered via a Z-order key
  *      ([[graft.functions.ZOrder]]) and range-partitioned on it, so each
  *      output file covers a tight hyper-rectangle and min/max row-group
  *      stats prune range filters on ANY clustered dimension;
  *   2. a CONTROLLED file count (the small-file repair of
  *      [[Partitioned.compact]], but with an intentional global order
  *      instead of concatenation);
  *   3. bloom filters ([[BloomWrite]]) on point-lookup keys whose values
  *      the clustering does NOT order (the id-probe case min/max can't
  *      help with).
  *
  * One shuffle (the range partitioner's sample + exchange), one sort per
  * output file, one write — the standard nightly-compaction cost paid
  * once to make every subsequent scan cheaper. The reference has no
  * storage layout at all (Kafka byte streams); this composes the
  * engine's three layout primitives into the operator a lakehouse user
  * actually runs.
  */
object Optimize {

  /** Rewrite `df` at `path` clustered by `zorderCols`.
    *
    * @param zorderCols dimensions to cluster (int/long-valued; see
    *                   [[graft.functions.ZOrder]] for bit budget)
    * @param bits       z-order bits per dimension
    * @param nFiles     target output file count (≈ table bytes / desired
    *                   file size; a driver-side `df.count` estimate or a
    *                   profiling pass supplies it)
    * @param bloomCols  point-lookup columns to bloom-filter
    * @param bloomNdv   expected distinct values per bloom column
    */
  def rewrite(
      df: DataFrame,
      path: String,
      zorderCols: Seq[String],
      bits: Int,
      nFiles: Int,
      bloomCols: Seq[String] = Nil,
      bloomNdv: Long = 1000000L
  ): Unit = {
    require(nFiles >= 1, "nFiles must be >= 1")
    val keyed = df.withColumn("__zkey", GraftFunctions.zorder(bits, zorderCols.map(col): _*))
    val clustered = keyed
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
    val writer = bloomCols.foldLeft(clustered.write.mode("overwrite")) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", bloomNdv.toString)
    }
    writer.parquet(path)
  }
}
