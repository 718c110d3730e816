package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: regularize an event stream onto a fixed-width
  * bucket grid per key, with forward fill across gaps — the shaping step
  * between raw events and windowed feature pipelines (rates, EWMAs,
  * training-frame joins all want a dense regular grid).
  *
  * Reference analog: callysto leaves this to user closures over the
  * message stream + a CTable holding "last seen value" per key (the
  * imperative forward fill); declaratively the fill is one running
  * `last(_, ignoreNulls)` window.
  *
  * Scale shape: one groupBy to bucket-aggregate (map-side combined), one
  * tiny per-key bounds aggregate, `sequence`+`explode` to generate each
  * key's grid WITHOUT a driver loop or a global calendar cross join, a
  * co-keyed left join, and one window pass. Grid size is bounded by
  * (range/width) per key, never by event count.
  */
object TimeSeries {

  /** Hourly-style gap fill.
    *
    * @param df       input events
    * @param keyCol   series key
    * @param tsCol    event-time timestamp column
    * @param valueAgg aggregate over the value column within a bucket (e.g. dsum)
    * @param width    bucket width as a Spark interval literal, e.g. "1 HOUR"
    * @param truncUnit `date_trunc` unit matching `width`, e.g. "hour"
    * @param valueCol the column `valueAgg` aggregates
    * @return (key, bucket_ts, value [forward-filled], was_gap)
    */
  def gapFill(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueAgg: Column => Column,
      width: String,
      truncUnit: String,
      valueCol: String = "value"
  ): DataFrame = {
    val agg = df
      .groupBy(col(keyCol), date_trunc(truncUnit, col(tsCol)).as("__h"))
      .agg(valueAgg(col(valueCol)).as("__v"))
    val grid = agg
      .groupBy(col(keyCol))
      .agg(min(col("__h")).as("__mn"), max(col("__h")).as("__mx"))
      .select(
        col(keyCol),
        explode(sequence(col("__mn"), col("__mx"), expr(s"INTERVAL $width"))).as("__h")
      )
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col("__h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(agg, Seq(keyCol, "__h"), "left_outer")
      .select(
        col(keyCol),
        col("__h").as("bucket_ts"),
        last(col("__v"), ignoreNulls = true).over(w).as("value"),
        col("__v").isNull.as("was_gap")
      )
  }

  /** SCD2 (slowly-changing-dimension type 2) interval build from a keyed
    * attribute changelog: compress consecutive identical attribute values
    * per key, then emit one row per surviving version with its validity
    * interval `[valid_from, valid_to)` — `valid_to` NULL (and `is_current`
    * true) for the open latest version.
    *
    * This is the batch materialization of "attribute history" that a CTable
    * keyed upsert (reference: callysto/src/table/table.rs:93-98) throws
    * away: the upsert keeps only the latest value; SCD2 keeps every value
    * with the time range it was current.
    *
    * Scale shape: two window passes over the SAME (key, order) partitioning
    * — Catalyst plans ONE shuffle + sort and runs both windows on it. No
    * self-join, no state; linear in the changelog.
    *
    * @param df      the changelog
    * @param keyCol  entity key
    * @param attrCol tracked attribute (null-safe change detection)
    * @param seqCols total version order within a key (first column is the
    *                version timestamp used for interval bounds; remaining
    *                columns only break ties)
    */
  def scd2(df: DataFrame, keyCol: String, attrCol: String, seqCols: Seq[String]): DataFrame = {
    val ord = seqCols.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    df
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      // row 1 always opens a version; later rows only when the attribute
      // actually changed (null-safe: NULL -> x and x -> NULL are changes)
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
      .withColumn("valid_to", lead(col(seqCols.head), 1).over(w))
      .select(
        col(keyCol),
        col(attrCol).as("state"),
        col(seqCols.head).as("valid_from"),
        col("valid_to"),
        col("valid_to").isNull.as("is_current")
      )
  }
}
