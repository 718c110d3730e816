package graft.operators

import graft.engine.PlanOnly.syntax._

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

  /** Padding-minimizing PAIR packing: unlike [[packBins]] (concat-and-
    * chunk, which splits documents across bin boundaries), this keeps
    * every document whole and pairs long docs with short ones to shrink
    * the padding a fixed `budget`-token training sequence wastes.
    *
    * First-fit-decreasing — the textbook heuristic — is inherently
    * sequential (each placement depends on all previous bins), so it
    * cannot fan out. The scalable surrogate is FOLDED pairing: rank all
    * docs by token count descending (contiguous global index via the
    * two-pass [[Sampling.globalIndexBy]] recipe — no single-task window),
    * then pair rank `b` with rank `n+1-b`, i.e. longest with shortest.
    * A pair that still overflows the budget degrades to two singleton
    * bins (never truncates). Everything downstream of the one range-sort
    * shuffle is a hash aggregate on the bin key — linear at any scale.
    *
    * @return one row per FINAL bin: `final_bin` ("p<rank>" pair /
    *         "s<rank>" overflow singleton), `n_docs`, `doc_ids`
    *         (comma-joined, ascending), `fill` (token sum), `padding`
    *         (`max(budget - fill, 0)`).
    */
  def pairPack(df: DataFrame, idCol: String, tokenCol: String, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val indexed = Sampling
      .globalIndexBy(df.select(col(idCol), col(tokenCol)),
        Seq(col(tokenCol).desc, col(idCol)))
      .ckptLazy()
    val n = indexed.count()
    val binned = indexed.withColumn(
      "bin", least(col("global_idx"), lit(n + 1) - col("global_idx")))
    val agg = binned.groupBy(col("bin")).agg(
      count(lit(1)).as("n_docs"),
      sum(col(tokenCol)).as("fill"),
      min(col(idCol)).as("id1"),
      max(col(idCol)).as("id2"))
    val pairs = agg
      .where(col("n_docs") === 1 || col("fill") <= budget)
      .select(
        concat(lit("p"), col("bin").cast("string")).as("final_bin"),
        col("n_docs"),
        when(col("n_docs") === 1, col("id1").cast("string"))
          .otherwise(concat(col("id1").cast("string"), lit(","), col("id2").cast("string")))
          .as("doc_ids"),
        col("fill"),
        greatest(lit(budget.toLong) - col("fill"), lit(0L)).as("padding"))
    val splits = binned
      .join(agg.where(col("n_docs") === 2 && col("fill") > budget).select(col("bin")), "bin")
      .select(
        concat(lit("s"), col("global_idx").cast("string")).as("final_bin"),
        lit(1L).as("n_docs"),
        col(idCol).cast("string").as("doc_ids"),
        col(tokenCol).cast("long").as("fill"),
        greatest(lit(budget.toLong) - col(tokenCol), lit(0L)).as("padding"))
    pairs.union(splits)
  }
}
