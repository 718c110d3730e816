package graft.operators

import graft.engine.PlanOnly.syntax._

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

  /** Declarative data-quality EXPECTATIONS (the dbt-test / Deequ shape):
    * each row-level rule is a boolean expression counted in ONE shared
    * aggregation pass over the table; uniqueness rules (not row-local —
    * they need a groupBy) each add one bounded aggregate pass. Output is
    * a violations report: `(rule, violations, total, pass)`, one row per
    * rule — the artifact a pipeline gates a publish step on.
    *
    * Scale shape: N row-rules cost ONE scan regardless of N (conditional
    * sums in a single partial-aggregated pass, exactly like
    * [[qualityMetrics]] but reported as a table, not stream metrics);
    * each uniqueness rule is a distinct-count pass on its key columns.
    *
    * @param rowRules    name → boolean Column that must hold per row
    * @param uniqueRules name → key columns that must identify rows uniquely
    */
  def expectations(
      df: DataFrame,
      rowRules: Seq[(String, Column)],
      uniqueRules: Seq[(String, Seq[String])] = Nil
  ): DataFrame = {
    require(rowRules.nonEmpty || uniqueRules.nonEmpty, "no rules given")
    val rowReport: Option[DataFrame] =
      if (rowRules.isEmpty) None
      else {
        val aggs = rowRules.flatMap { case (name, rule) =>
          Seq(
            coalesce(sum(when(!coalesce(rule, lit(false)), 1L).otherwise(0L)), lit(0L))
              .as(s"__v_$name"),
            count(lit(1)).as(s"__t_$name"))
        }
        // one row; checkpointed so the per-rule selects below don't each
        // re-run the shared aggregation scan
        val wide = df.agg(aggs.head, aggs.tail: _*).ckptLazy()
        Some(rowRules.map { case (name, _) =>
          wide.select(
            lit(name).as("rule"),
            col(s"__v_$name").as("violations"),
            col(s"__t_$name").as("total"),
            (col(s"__v_$name") === 0L).as("pass"))
        }.reduce(_.unionByName(_)))
      }
    val uniqReports = uniqueRules.map { case (name, keys) =>
      df.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__c"))
        .agg(
          sum(when(col("__c") > 1L, col("__c")).otherwise(0L)).as("violations"),
          sum(col("__c")).as("total"),
          (max(col("__c")) <= 1L).as("pass"))
        .select(lit(name).as("rule"), col("violations"), col("total"), col("pass"))
    }
    (rowReport.toSeq ++ uniqReports).reduce(_.unionByName(_))
  }

  /** Keyed dataset DIFF — the data-CI primitive for corpus versioning:
    * given two versions of a table and a key, report per row-fate counts
    * (added / removed / changed / unchanged) plus, for each compared
    * column, how many surviving keys changed in THAT column — the
    * "what did this pipeline change" artifact reviewed before promoting
    * a new corpus snapshot.
    *
    * One full-outer join on the key, everything else conditional
    * aggregation on the joined row — a single shuffle regardless of how
    * many columns are compared. Null-safe equality (`<=>`) so null→value
    * and value→null both count as changes.
    *
    * @return one row: (n_added, n_removed, n_changed, n_unchanged,
    *         chg_<col>... for each compared column)
    */
  def diff(
      before: DataFrame,
      after: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]
  ): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty, "need keys and compare columns")
    val b = before.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__b", lit(1))
    val a = after.select((keyCols ++ compareCols).map(c => col(c).as(s"${c}__a")): _*)
      .withColumn("__a", lit(1))
    val joined = b.join(
      a, keyCols.map(k => col(k) <=> col(s"${k}__a")).reduce(_ && _), "full_outer")
    val inBoth = col("__b").isNotNull && col("__a").isNotNull
    val anyChange = compareCols
      .map(c => !(col(c) <=> col(s"${c}__a")))
      .reduce(_ || _)
    val perCol = compareCols.map(c =>
      sum(when(inBoth && !(col(c) <=> col(s"${c}__a")), 1L).otherwise(0L)).as(s"chg_$c"))
    joined.agg(
      sum(when(col("__b").isNull, 1L).otherwise(0L)).as("n_added"),
      (sum(when(col("__a").isNull, 1L).otherwise(0L)).as("n_removed") +:
        sum(when(inBoth && anyChange, 1L).otherwise(0L)).as("n_changed") +:
        sum(when(inBoth && !anyChange, 1L).otherwise(0L)).as("n_unchanged") +:
        perCol): _*)
  }

  /** k-anonymity suppression over quasi-identifier columns: any row whose
    * quasi-identifier combination occurs fewer than k times in the dataset
    * gets those columns replaced by `mask` — the release then satisfies
    * k-anonymity on exactly those columns. One window count over the
    * quasi-id key (a single hash shuffle on the same key an aggregate
    * would use; group cardinality, not row count, bounds the state), no
    * second pass over payload columns. Privacy screening for training-data
    * export; the reference leaves any such policy to user closures.
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Int, mask: String = "*"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w   = Window.partitionBy(quasiCols.map(col): _*)
    val cnt = count(lit(1)).over(w)
    val out = quasiCols.foldLeft(df.withColumn("__qn", cnt)) { (d, c) =>
      d.withColumn(c, when(col("__qn") < k, lit(mask)).otherwise(col(c).cast("string")))
    }
    out.withColumn("anon_suppressed", col("__qn") < k).drop("__qn")
  }

  /** l-diversity suppression — the follow-on to [[kAnonymize]]: a
    * quasi-identifier group can be large (k-anonymous) yet still leak if
    * everyone in it shares the SAME sensitive value, so any group with
    * fewer than `l` DISTINCT sensitive values gets its quasi columns
    * masked. Distinct-per-group can't be a window count, so this is a
    * groupBy distinct-aggregate joined back on the quasi key — two
    * shuffles on the same key, state bounded by group cardinality.
    * String quasi columns mask to `mask`; numeric ones to -1 (callers
    * needing a different numeric sentinel can cast to string first).
    */
  def lDiversity(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      l: Int,
      mask: String = "*"
  ): DataFrame = {
    import org.apache.spark.sql.types.StringType
    require(l >= 1, "l must be >= 1")
    val ndiv = df.groupBy(quasiCols.map(col): _*)
      .agg(countDistinct(col(sensitiveCol)).as("__ndiv"))
    val joined = df.join(ndiv, quasiCols)
    val out = quasiCols.foldLeft(joined) { (d, c) =>
      val masked =
        if (d.schema(c).dataType == StringType) lit(mask) else lit(-1).cast(d.schema(c).dataType)
      d.withColumn(c, when(col("__ndiv") < l, masked).otherwise(col(c)))
    }
    out.withColumn("ldiv_suppressed", col("__ndiv") < l).drop("__ndiv")
  }
}
