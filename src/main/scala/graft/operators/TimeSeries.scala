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

  /** [[gapFill]] with linear interpolation instead of carry-forward: a gap
    * bucket between observations at (t_p, v_p) and (t_n, v_n) receives
    * v_p + (v_n − v_p)·(t − t_p)/(t_n − t_p). Same single-shuffle shape —
    * the prev/next lookups are two IGNORE-NULLS windows over the one
    * (key, bucket) sort, no self-join. The grid is bounded by each key's
    * own min/max observation, so every gap has both neighbors; the
    * interpolation chain is fixed IEEE double arithmetic an external
    * oracle replays exactly.
    */
  def interpolate(
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
    val wPrev = Window
      .partitionBy(col(keyCol)).orderBy(col("__h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window
      .partitionBy(col(keyCol)).orderBy(col("__h"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsTs = when(col("__v").isNotNull, col("__h"))
    val pv    = last(col("__v"), ignoreNulls = true).over(wPrev)
    val pt    = last(obsTs, ignoreNulls = true).over(wPrev)
    val nv    = first(col("__v"), ignoreNulls = true).over(wNext)
    val nt    = first(obsTs, ignoreNulls = true).over(wNext)
    val frac = (unix_micros(col("__h")) - unix_micros(pt)).cast("double") /
      (unix_micros(nt) - unix_micros(pt)).cast("double")
    grid
      .join(agg, Seq(keyCol, "__h"), "left_outer")
      .select(
        col(keyCol),
        col("__h").as("bucket_ts"),
        when(col("__v").isNotNull, col("__v"))
          .otherwise(pv + (nv - pv) * frac)
          .as("value"),
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

  /** Batch sessionization with PER-EVENT session assignment: a new session
    * opens at each key's first event and wherever the gap from the
    * previous event exceeds `gapUs`; the session index is the running
    * count of such openings. This is the row-level complement of the
    * `session_window` AGGREGATE (q_window_session collapses each session
    * to one row; here every event keeps its session id — the shape
    * feature pipelines and funnel-within-session analyses need).
    *
    * Reference analog: callysto would hold "last seen ts" in a CTable and
    * emit a counter bump per message (timer.rs idle-close is the
    * streaming twin — graft has BOTH, [[graft.streaming.Timers]] for
    * streams and this for backfill). One sort per key partition, two
    * window passes on the same sort (Catalyst reuses the exchange+sort),
    * all integer µs arithmetic.
    *
    * @return one row per (key, session_idx): event count, µs bounds/span.
    */
  def sessionize(
      df: DataFrame,
      keyCol: String,
      tsUsCol: String,
      tieCol: String,
      gapUs: Long
  ): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol), col(tieCol))
    df
      .withColumn("__prev", lag(col(tsUsCol), 1).over(w))
      .withColumn(
        "__new",
        when(col("__prev").isNull || col(tsUsCol) - col("__prev") > gapUs, 1).otherwise(0))
      .withColumn(
        "session_idx",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsUsCol)).as("start_us"),
        max(col(tsUsCol)).as("end_us"),
        (max(col(tsUsCol)) - min(col(tsUsCol))).as("duration_us")
      )
  }

  /** Halving-weight decayed moving average (the batch twin of
    * [[graft.streaming.DecayCounter]]'s exponential decay): over each
    * key's last `depth` events, newest weighted 1, each step back halved.
    * Computed as a Horner chain over lagged values — `acc·0.5 + x` from
    * oldest to newest — so every multiply is an EXACT power-of-two scale
    * and the additions happen in one fixed order: the result is
    * bit-reproducible on any IEEE engine, no decimal detour needed.
    * Missing leading lags coalesce to 0.0, which the chain preserves
    * exactly, so short histories need no special case; the normalizer
    * 2 − 2^−(n−1) uses the actual window population n.
    *
    * One window sort serves all `depth` lags and the population count.
    */
  def decayAvg(
      df: DataFrame,
      keyCol: String,
      tsUsCol: String,
      tieCol: String,
      valueCol: String,
      depth: Int = 8
  ): DataFrame = {
    require(depth >= 1 && depth <= 32, s"depth $depth out of (1,32]")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol), col(tieCol))
    val horner = (depth - 1 to 1 by -1).foldLeft(lit(0.0)) { (acc, k) =>
      acc * 0.5 + coalesce(lag(col(valueCol), k).over(w), lit(0.0))
    }
    val n = least(row_number().over(w), lit(depth))
    df.select(
      col(keyCol),
      col(tieCol),
      col(tsUsCol),
      col(valueCol),
      ((horner * 0.5 + col(valueCol)) /
        (lit(2.0) - pow(lit(0.5), (n - 1).cast("double")))).as("decay_avg")
    )
  }

  /** Rolling z-score anomaly screen: each event judged against the mean /
    * variance of its key's PRIOR `lookback` values (frame excludes the
    * current row — an outlier must not mask itself). Sums run through
    * exact DECIMAL(38,6) so mean/variance are order-insensitive; the
    * variance subtraction and the squared-deviation comparison are then
    * single IEEE operations, identical cross-engine (comparing squared
    * deviation to `sigmas²·var` avoids sqrt on a rounding-negative
    * variance). Events with fewer than `minPrior` antecedents are never
    * flagged — a z-score against two points is noise.
    */
  def rollingAnomaly(
      df: DataFrame,
      keyCol: String,
      tsUsCol: String,
      tieCol: String,
      valueCol: String,
      lookback: Int = 10,
      minPrior: Int = 5,
      sigmas: Double = 2.0
  ): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(38, 6)
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsUsCol), col(tieCol))
      .rowsBetween(-lookback, -1)
    val nPrior = count(col(valueCol)).over(w)
    val mean = sum(col(valueCol).cast(D)).over(w).cast("double") / nPrior.cast("double")
    val m2 = sum((col(valueCol) * col(valueCol)).cast(D)).over(w).cast("double") /
      nPrior.cast("double")
    val dev = col(valueCol) - mean
    df.select(
      col(keyCol),
      col(tieCol),
      col(tsUsCol),
      col(valueCol),
      nPrior.as("n_prior"),
      mean.as("mean_prior"),
      (nPrior >= minPrior &&
        dev * dev > lit(sigmas * sigmas) * greatest(m2 - mean * mean, lit(0.0)))
        .as("is_anomaly")
    )
  }
}
