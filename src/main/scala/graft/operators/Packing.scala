package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign each document to
  * the fixed-token-budget training bin where its text STARTS under
  * concat-and-chunk packing (documents are concatenated in a deterministic
  * order and the stream is cut every `binTokens` tokens — the standard way
  * LLM training sequences are formed from a document corpus).
  *
  * Scale shape: packing is inherently sequential, so a single global order
  * would serialize the corpus through one task. Instead documents are
  * sharded by a deterministic hash of their id and packed independently
  * within each shard — the window runs partition-parallel (one shuffle by
  * shard), and shard count scales with the cluster while every rerun
  * produces the identical packing. The reference has no notion of this
  * (payloads are opaque bytes); it is part of the LLM-pipeline layer
  * (SURVEY.md §2.6 LLM-pipeline row).
  */
object Packing {

  /** Deterministic portable shard of an integral id column: pmod(id, n).
    * Modulo (not an engine hash) so any engine replays the assignment —
    * ids are effectively uniform mod n, and packing only needs SOME
    * deterministic partition, not an adversary-proof one.
    */
  def shard(idCol: Column, nShards: Int): Column =
    pmod(idCol, lit(nShards.toLong))

  /** Pack documents into `binTokens`-sized bins within `nShards` hash
    * shards, ordering by id inside each shard. Output adds:
    *   - `shard`   — the deterministic shard id;
    *   - `bin`     — bin index within the shard where this doc starts;
    *   - `bin_offset` — token offset of the doc's start inside its bin.
    *
    * `tokenCountCol` must be a non-null integral token count per row.
    */
  def packBins(
      df: DataFrame,
      idCol: String,
      tokenCountCol: String,
      binTokens: Int,
      nShards: Int
  ): DataFrame = {
    require(binTokens > 0 && nShards > 0)
    val w = Window
      .partitionBy(col("shard"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", shard(col(idCol), nShards))
      .withColumn("__cum_before", coalesce(sum(col(tokenCountCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("__cum_before") / binTokens))
      .withColumn("bin_offset", col("__cum_before") % binTokens)
      .drop("__cum_before")
  }
}
