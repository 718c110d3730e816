package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.Joins

/** Materialized KV snapshot maintenance: a `foreachBatch` writer that
  * folds each micro-batch of changelog rows onto a queryable parquet
  * snapshot (collapse to latest-per-key → MERGE with tombstones → atomic
  * directory swap).
  *
  * This closes the CTable visibility gap (SURVEY.md §7.4.1): callysto
  * tables are readable from any agent at any time, while Spark keyed
  * state is only visible inside its own stateful operator — so the
  * changelog is materialized as a plain parquet table ANY batch query
  * (or another agent's stream-static join) can read, exactly how the
  * reference's compacted changelog topic serves late consumers
  * (callysto/src/types/table.rs:59-62).
  *
  * Replay safety: foreachBatch re-delivers the last uncommitted batch
  * after a crash; re-merging the same collapsed updates is idempotent
  * (same keys replaced with the same rows, same tombstones dropped), so
  * at-least-once delivery yields an exactly-once snapshot. The directory
  * swap itself is crash-recoverable via [[graft.sources.Swap]] — a death
  * between unpublish and publish leaves a `__backup` that the next batch
  * restores before merging, so the fresh-snapshot branch below can never
  * be entered because a swap LOST the table mid-flight. At scale, swap
  * per partition directory (see [[graft.sources.Partitioned]]) and
  * bucket the snapshot by key so the anti-join in the merge stays
  * shuffle-free.
  */
object Materialize {

  /** Writer for `GraftSink.ForeachBatch`: maintain `path` as the
    * latest-state snapshot of a changelog whose schema is
    * `keys ++ payload ++ seqCol ++ deleteCol`.
    */
  def snapshotWriter(
      path: String,
      keys: Seq[String],
      seqCol: String,
      deleteCol: String
  )(df: DataFrame, batchId: Long): Unit = {
    val spark = df.sparkSession
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val tmpPath = new org.apache.hadoop.fs.Path(path + "__merging")
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sources.Swap.recover(fs, fsPath, tmpPath)
    val collapsed = Joins.collapseChangelog(df, keys, seqCol)
    if (collapsed.isEmpty) return
    val merged =
      if (!fs.exists(fsPath)) collapsed.filter(!col(deleteCol)).drop(deleteCol)
      else Joins.mergeUpsert(spark.read.parquet(path), collapsed, keys, deleteCol)
    merged.write.mode("overwrite").parquet(tmpPath.toString)
    graft.sources.Swap.publish(fs, fsPath, tmpPath)
  }

  /** Writer for `GraftSink.ForeachBatch`: maintain `path` as an SCD2
    * VERSION HISTORY of a keyed attribute changelog — the incremental form
    * of [[graft.operators.TimeSeries.scd2]]. Where [[snapshotWriter]]
    * keeps only each key's latest state, this keeps every state the key
    * ever held with its `[valid_from, valid_to)` interval, maintained
    * batch by batch:
    *
    *   1. the batch compresses to its own version candidates (scd2);
    *   2. candidates at or before the key's OPEN version's start are
    *      dropped — this absorbs foreachBatch's at-least-once replays
    *      (re-merging a delivered batch is a no-op) and ignores
    *      out-of-order stragglers older than the open version (the
    *      watermark analog; feed watermarked input for bounded disorder);
    *   3. a first candidate equal to the open version's state collapses
    *      into it (runs never split across batch boundaries);
    *   4. surviving candidates close the open version at their earliest
    *      `valid_from` and append, the last one open.
    *
    * All joins are keyed on `keyCol` against the history's OPEN slice
    * only — at 100 TB that slice is |live keys|, not |history|, and the
    * closed slice is rewritten untouched (partition the history by
    * `is_current` to skip even that rewrite; kept single-directory here
    * for the atomic swap).
    */
  def scd2Writer(
      path: String,
      keyCol: String,
      attrCol: String,
      seqCols: Seq[String]
  )(df: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val tmpPath = new org.apache.hadoop.fs.Path(path + "__merging")
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sources.Swap.recover(fs, fsPath, tmpPath)
    if (df.isEmpty) return
    val cand = graft.operators.TimeSeries.scd2(df, keyCol, attrCol, seqCols)
    if (!fs.exists(fsPath)) {
      cand.write.mode("overwrite").parquet(tmpPath.toString)
      graft.sources.Swap.publish(fs, fsPath, tmpPath)
      return
    }
    val hist = spark.read.parquet(path).localCheckpoint()
    val open = hist.filter(col("is_current"))
      .select(col(keyCol), col("state").as("__open_state"), col("valid_from").as("__open_from"))
    val fresh = cand
      .join(open, Seq(keyCol), "left_outer")
      .filter(col("__open_from").isNull || col("valid_from") > col("__open_from"))
      .localCheckpoint() // consumed 3x below (first-per-key, keep, closeAt)
    val first = fresh.groupBy(col(keyCol)).agg(min(col("valid_from")).as("__f0"))
    // a first candidate continuing the open state collapses into it
    val keep = fresh
      .join(first, Seq(keyCol))
      .filter(!(col("__open_from").isNotNull &&
        col("valid_from") === col("__f0") && col("__open_state") <=> col("state")))
      .localCheckpoint()
    val closeAt = keep.groupBy(col(keyCol)).agg(min(col("valid_from")).as("__close"))
    val openUpdated = hist.filter(col("is_current"))
      .join(closeAt, Seq(keyCol), "left_outer")
      .select(
        col(keyCol),
        col("state"),
        col("valid_from"),
        coalesce(col("__close"), col("valid_to")).as("valid_to"),
        col("__close").isNull.as("is_current"))
    val merged = hist.filter(!col("is_current"))
      .unionByName(openUpdated)
      .unionByName(keep.select(col(keyCol), col("state"), col("valid_from"),
        col("valid_to"), col("is_current")))
    merged.write.mode("overwrite").parquet(tmpPath.toString)
    graft.sources.Swap.publish(fs, fsPath, tmpPath)
  }
}
