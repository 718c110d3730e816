package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time streaming operators: tumbling/sliding/session windows,
  * watermark-gated late-data handling, streaming deduplication.
  *
  * The reference has NONE of these (SURVEY.md §2.5 — callysto only has
  * Kafka ingest time and user closures); they are the north-star additions
  * the Spark engine gets from Structured Streaming. All of them work
  * identically on batch DataFrames (same `window`/`session_window`
  * expressions), which is how the DuckDB oracle checks their semantics.
  *
  * Scale notes: windowed aggregation shuffles on (window, keys) — at
  * 100 TB the watermark bounds state size (late rows are dropped instead
  * of accumulating); session windows merge per key server-side. The
  * `events.ts` column arrives as ns-since-epoch (parquet TIMESTAMP(NANOS)
  * read with nanosAsLong); [[tsCol]] converts to a µs TimestampType with
  * integer arithmetic — `ts div 1000` — because a double roundtrip loses
  * sub-second precision above 2^53.
  */
object StreamOps {

  /** ns-since-epoch long → TimestampType (µs, truncating).
    *
    * The division MUST stay integral: `Column./` is double division, and
    * 2025-era ns epochs (~1.7e18) exceed double's 2^53 exact range — ~1 in
    * 16 exact-microsecond values would round off by 1 µs, silently moving
    * events across window/session/interval boundaries. Decimal division is
    * exact; the cast to long truncates toward zero (positive epochs ⇒
    * floor), matching DuckDB's ns→µs CAST.
    */
  def tsFromNanos(c: Column): Column =
    timestamp_micros(
      (c.cast(org.apache.spark.sql.types.DecimalType(20, 0)) / 1000).cast("long"))

  /** Tumbling event-time window aggregation. */
  def tumbling(df: DataFrame, ts: Column, width: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(ts, width) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** Sliding event-time window aggregation (width > slide ⇒ overlap). */
  def sliding(
      df: DataFrame,
      ts: Column,
      width: String,
      slide: String,
      keys: Seq[Column],
      aggs: Seq[Column]
  ): DataFrame =
    df.groupBy(window(ts, width, slide) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** Session window (gap-based) aggregation per key. */
  def session(df: DataFrame, ts: Column, gap: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(ts, gap) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** Watermarked stream: rows older than `delay` behind the max observed
    * event time are late and dropped by downstream stateful operators.
    */
  def watermarked(df: DataFrame, tsCol: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)

  /** Streaming exact dedup on key columns; with a watermark set upstream,
    * per-key dedup state is dropped once the key can no longer recur
    * within the watermark (bounded state — the 100 TB requirement).
    */
  def dedup(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Streaming dedup where duplicates only need suppressing within the
    * watermark delay of each other (Spark 3.5+ semantics; state expires
    * by event time rather than growing forever).
    */
  def dedupWithinWatermark(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicatesWithinWatermark(cols)

  /** Stream-stream join. Both sides MUST be watermarked and `cond` must
    * include an event-time bound (equi-key AND time range) — that is what
    * lets Spark evict join state: a buffered row is dropped once the other
    * side's watermark passes its time bound. Without the range the state
    * grows without bound at 100 TB/day ingest. Outer sides emit their
    * null-padded rows when the watermark closes the bound.
    */
  def streamJoin(left: DataFrame, right: DataFrame, cond: Column, joinType: String = "inner"): DataFrame =
    left.join(right, cond, joinType)
}
