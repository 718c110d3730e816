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
}
