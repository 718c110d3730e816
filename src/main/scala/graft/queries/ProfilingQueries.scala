package graft.queries

import graft.engine.PlanOnly.syntax._

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Common._

/** Dataset profiling + feature normalization — the "look before you train"
  * layer of a corpus pipeline: one-pass column profiles, value-distribution
  * histograms, and per-group feature scaling. The reference leaves all of
  * this to user closures over opaque bytes (callysto/src/types/agent.rs:86-91);
  * here each is a first-class, oracle-checked relational operator.
  *
  * Scale notes: every query is a single scan + one narrow aggregation —
  * the profile is ONE wide agg (not one job per column, which at 100 TB
  * would read the table five times), the histogram groups on a derived
  * bounded key (≤ nb+1 groups), and z-score is the canonical two-pass
  * broadcast-back pattern (tiny stats table joined back map-side).
  */
object ProfilingQueries extends QuerySet {

  /** Column profile of `orders` — null count, exact distinct count, min/max
    * per column, unpivoted to long form with `stack`. The non-distinct
    * stats come from ONE wide aggregate pass; the five exact distinct
    * counts are SPLIT into per-column partial-distinct aggregates
    * cross-joined back (five single-column scans) rather than fused into
    * the wide aggregate — fused, Spark plans a row-multiplying Expand
    * (one projection per distinct column: 6× the scan feeding the
    * shuffle), the same plan defect q_agg_approx_distinct's fix removed.
    * Five narrow columnar scans shuffle only distinct values; at 100 TB
    * you'd swap exact distinct for approx_count_distinct and fall back to
    * one pass.
    */
  val qProfile: GQuery = GQuery(
    "q_profile_columns",
    Some("""
      WITH w AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CASE WHEN o_orderkey    IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_nulls,
               COUNT(DISTINCT o_orderkey)    AS k_nd,
               CAST(MIN(o_orderkey) AS DOUBLE)    AS k_min,  CAST(MAX(o_orderkey) AS DOUBLE)    AS k_max,
               CAST(SUM(CASE WHEN o_custkey     IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_nulls,
               COUNT(DISTINCT o_custkey)     AS c_nd,
               CAST(MIN(o_custkey) AS DOUBLE)     AS c_min,  CAST(MAX(o_custkey) AS DOUBLE)     AS c_max,
               CAST(SUM(CASE WHEN o_totalprice  IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_nulls,
               COUNT(DISTINCT o_totalprice)  AS p_nd,
               MIN(o_totalprice)                  AS p_min,  MAX(o_totalprice)                  AS p_max,
               CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS s_nulls,
               COUNT(DISTINCT o_orderstatus) AS s_nd,
               MIN(o_orderstatus) AS s_min, MAX(o_orderstatus) AS s_max,
               CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS r_nulls,
               COUNT(DISTINCT o_orderpriority) AS r_nd,
               MIN(o_orderpriority) AS r_min, MAX(o_orderpriority) AS r_max
        FROM orders)
      SELECT * FROM (
        SELECT 'o_orderkey' AS col_name, n, k_nulls AS n_null, k_nd AS n_distinct,
               k_min AS min_num, k_max AS max_num,
               CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM w
        UNION ALL
        SELECT 'o_custkey', n, c_nulls, c_nd, c_min, c_max, NULL, NULL FROM w
        UNION ALL
        SELECT 'o_totalprice', n, p_nulls, p_nd, p_min, p_max, NULL, NULL FROM w
        UNION ALL
        SELECT 'o_orderstatus', n, s_nulls, s_nd,
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), s_min, s_max FROM w
        UNION ALL
        SELECT 'o_orderpriority', n, r_nulls, r_nd,
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), r_min, r_max FROM w)
      ORDER BY col_name""")
  ) { (spark, dir) =>
    import spark.implicits._
    val o = t(spark, dir).orders
    val numCols = Seq("o_orderkey", "o_custkey", "o_totalprice")
    val strCols = Seq("o_orderstatus", "o_orderpriority")
    def nulls(c: String) =
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls")
    val aggs: Seq[org.apache.spark.sql.Column] =
      Seq(count(lit(1)).as("n")) ++
        (numCols ++ strCols).map(c => nulls(c)) ++
        numCols.flatMap(c =>
          Seq(min(col(c)).cast("double").as(s"${c}__min"),
              max(col(c)).cast("double").as(s"${c}__max"))) ++
        strCols.flatMap(c =>
          Seq(min(col(c)).as(s"${c}__smin"), max(col(c)).as(s"${c}__smax")))
    val wide = (numCols ++ strCols)
      .map(c => o.agg(countDistinct(col(c)).as(s"${c}__nd")))
      .foldLeft(o.agg(aggs.head, aggs.tail: _*))(_ crossJoin _)
    val numRows = numCols.map(c =>
      s"'$c', ${c}__nulls, ${c}__nd, ${c}__min, ${c}__max, CAST(NULL AS STRING), CAST(NULL AS STRING)")
    val strRows = strCols.map(c =>
      s"'$c', ${c}__nulls, ${c}__nd, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), ${c}__smin, ${c}__smax")
    val stackExpr =
      s"stack(${numCols.size + strCols.size}, ${(numRows ++ strRows).mkString(", ")}) " +
        "AS (col_name, n_null, n_distinct, min_num, max_num, min_str, max_str)"
    wide.selectExpr("n", stackExpr)
      .select($"col_name", $"n", $"n_null", $"n_distinct",
        $"min_num", $"max_num", $"min_str", $"max_str")
      .orderBy($"col_name")
  }

  /** Fixed-width value histogram of lineitem extended price: `width_bucket`
    * into 21 × 5000 bins (+ overflow), count and exact decimal mass per bin.
    * Grouping key is derived and bounded, so the shuffle is ≤ 22 groups no
    * matter the input size — the distribution-profiling primitive.
    * Oracle expresses width_bucket with the portable floor/clamp formula
    * (same parity as q_agg_percentiles' bucket_mass).
    */
  val qHistogram: GQuery = GQuery(
    "q_agg_histogram",
    Some(s"""
      SELECT CAST(least(greatest(floor(l_extendedprice / 5000.0) + 1, 0), 22) AS BIGINT) AS bucket,
             COUNT(*) AS n_rows,
             ${sqlSum("l_extendedprice")} AS mass
      FROM lineitem
      GROUP BY 1
      ORDER BY bucket""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).lineitem
      .select(
        width_bucket($"l_extendedprice", lit(0.0), lit(105000.0), lit(21)).as("bucket"),
        $"l_extendedprice")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_rows"), dsum($"l_extendedprice").as("mass"))
      .orderBy($"bucket")
  }

  /** Per-group feature scaling: z-score (exact decimal moments, population
    * stddev) and min-max scaling of `events.value` within each event_type.
    * Two-pass broadcast-back: the per-group stats table (≤ #groups rows)
    * is broadcast-joined back onto the events scan — no second shuffle of
    * the big side. Moments go through DECIMAL(38,6) so mean/std combine
    * bit-identically cross-engine (see Common); z and mm are RAW IEEE
    * doubles (round-10) — sub/div/sqrt are all exactly rounded per
    * IEEE-754, so the bits match any engine, while `round(x, 9)` carries
    * the cross-build round-impl lottery (PARITY.md "Rounding
    * portability").
    */
  val qZscore: GQuery = GQuery(
    "q_norm_zscore",
    Some(s"""
      WITH m AS (
        SELECT event_type,
               COUNT(*) AS n,
               ${sqlSum("value")} AS sv,
               ${sqlSum("value * value")} AS svv,
               MIN(value) AS mn,
               MAX(value) AS mx
        FROM events GROUP BY event_type)
      SELECT e.event_id, e.event_type,
             (e.value - m.sv / m.n) / sqrt((m.svv - m.sv * m.sv / m.n) / m.n) AS z,
             (e.value - m.mn) / (m.mx - m.mn) AS mm
      FROM events e JOIN m USING (event_type)
      ORDER BY e.event_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val e = t(spark, dir).events
    val n = count(lit(1)).cast("double")
    val sv = dsum($"value")
    val svv = dsum($"value" * $"value")
    val stats = e
      .groupBy($"event_type")
      .agg(n.as("n"), sv.as("sv"), svv.as("svv"),
        min($"value").as("mn"), max($"value").as("mx"))
    e.join(broadcast(stats), "event_type")
      .select(
        $"event_id", $"event_type",
        (($"value" - $"sv" / $"n") / sqrt(($"svv" - $"sv" * $"sv" / $"n") / $"n")).as("z"),
        (($"value" - $"mn") / ($"mx" - $"mn")).as("mm"))
      .orderBy($"event_id")
  }

  /** Distribution drift between two slices (here: even vs odd users) —
    * the train/serve-skew and shard-health check run before blending
    * corpus slices. Chi-square-style statistic over histogram buckets,
    * deliberately ln-free (PSI's log terms differ in the last ulp between
    * libm and the JVM; squares and ratios are bit-identical), summed
    * through DECIMAL so partition order cannot wobble the total. One
    * scan → bounded bucket×slice groupBy → one-row broadcast of totals.
    */
  val qDrift: GQuery = GQuery(
    "q_profile_drift",
    Some("""
      WITH b AS (SELECT CAST(least(greatest(floor(value / 100.0) + 1, 0), 11) AS BIGINT) AS bucket,
                        CAST(user_id % 2 AS BIGINT) AS grp
                 FROM events),
      c AS (SELECT bucket,
                   CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
                   CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
            FROM b GROUP BY bucket),
      t AS (SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb FROM c),
      terms AS (SELECT c.bucket,
                       CAST(c.na AS DOUBLE) / t.ta AS pa,
                       CAST(c.nb AS DOUBLE) / t.tb AS pb
                FROM c, t)
      SELECT COUNT(*) AS n_bins,
             CAST(SUM(CAST(((pa - pb) * (pa - pb)) / (pa + pb) AS DECIMAL(38,18))) AS DOUBLE)
               AS chi2,
             MAX(abs(pa - pb)) AS max_share_delta
      FROM terms""")
  ) { (spark, dir) =>
    import spark.implicits._
    val b = t(spark, dir).events.select(
      width_bucket($"value", lit(0.0), lit(1000.0), lit(10)).as("bucket"),
      ($"user_id" % 2).as("grp"))
    val c = b.groupBy($"bucket").agg(
      sum(when($"grp" === 0, 1L).otherwise(0L)).as("na"),
      sum(when($"grp" === 1, 1L).otherwise(0L)).as("nb"))
    val tot = c.agg(sum($"na").as("ta"), sum($"nb").as("tb"))
    val terms = c.crossJoin(broadcast(tot)).select(
      ($"na".cast("double") / $"ta").as("pa"),
      ($"nb".cast("double") / $"tb").as("pb"))
    terms.agg(
      count(lit(1)).as("n_bins"),
      sum((($"pa" - $"pb") * ($"pa" - $"pb") / ($"pa" + $"pb"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 18))).cast("double").as("chi2"),
      max(abs($"pa" - $"pb")).as("max_share_delta"))
  }

  /** Declarative data-quality expectations ([[graft.operators.Diagnostics
    * .expectations]]): dbt-test-shaped rules over lineitem — row-level
    * domain/null/consistency rules (ONE shared scan for all of them) plus
    * a composite-key uniqueness rule (one distinct-count pass) — reported
    * as the (rule, violations, total, pass) table a pipeline gates its
    * publish step on. Rules are chosen so both outcomes appear: the data
    * satisfies most, and the deliberately-too-tight discount cap fails
    * with a nonzero violation count the oracle reproduces exactly.
    */
  val qExpectations: GQuery = GQuery(
    "q_diag_expectations",
    Some("""
      SELECT * FROM (
        SELECT 'quantity_in_domain' AS rule,
               CAST(SUM(CASE WHEN NOT (l_quantity >= 1 AND l_quantity <= 50) THEN 1 ELSE 0 END) AS BIGINT) AS violations,
               COUNT(*) AS total,
               SUM(CASE WHEN NOT (l_quantity >= 1 AND l_quantity <= 50) THEN 1 ELSE 0 END) = 0 AS pass
        FROM lineitem
        UNION ALL
        SELECT 'orderkey_not_null',
               CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(*),
               SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) = 0
        FROM lineitem
        UNION ALL
        SELECT 'discount_under_8pct',
               CAST(SUM(CASE WHEN NOT (l_discount < 0.08) THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(*),
               SUM(CASE WHEN NOT (l_discount < 0.08) THEN 1 ELSE 0 END) = 0
        FROM lineitem
        UNION ALL
        SELECT 'charge_consistent',
               CAST(SUM(CASE WHEN NOT (l_extendedprice * (1 - l_discount) >= 0) THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(*),
               SUM(CASE WHEN NOT (l_extendedprice * (1 - l_discount) >= 0) THEN 1 ELSE 0 END) = 0
        FROM lineitem
        UNION ALL
        SELECT 'order_line_unique',
               CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c ELSE 0 END), 0) AS BIGINT),
               CAST(SUM(c) AS BIGINT),
               MAX(c) <= 1
        FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber))
      ORDER BY rule""")
  ) { (spark, dir) =>
    import spark.implicits._
    graft.operators.Diagnostics
      .expectations(
        t(spark, dir).lineitem,
        rowRules = Seq(
          "quantity_in_domain" -> ($"l_quantity" >= 1 && $"l_quantity" <= 50),
          "orderkey_not_null" -> $"l_orderkey".isNotNull,
          "discount_under_8pct" -> ($"l_discount" < 0.08),
          "charge_consistent" -> ($"l_extendedprice" * (lit(1) - $"l_discount") >= 0)),
        uniqueRules = Seq(
          "order_line_unique" -> Seq("l_orderkey", "l_linenumber")))
      .orderBy($"rule")
  }

  /** Keyed dataset diff ([[graft.operators.Diagnostics.diff]]) between the
    * documents table and a deterministically perturbed "next version":
    * every doc_id % 11 == 0 is dropped (removed), % 7 == 0 gets its lang
    * rewritten (changed), % 5 == 0 gets n_chars bumped (changed), and a
    * shifted-id copy of the first 30 docs is appended (added). The oracle
    * recomputes every fate count from the same perturbation rules — one
    * full-outer join + conditional aggregation on the engine side.
    */
  val qDiff: GQuery = GQuery(
    "q_diag_diff",
    Some("""
      WITH aft AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END AS lang,
               CASE WHEN doc_id % 5 = 0 THEN n_chars + 1 ELSE n_chars END AS n_chars
        FROM documents WHERE doc_id % 11 <> 0
        UNION ALL
        SELECT doc_id + 1000000, lang, n_chars FROM documents WHERE doc_id < 30),
      j AS (SELECT b.doc_id AS bk, a.doc_id AS ak,
                   b.lang AS bl, a.lang AS al,
                   b.n_chars AS bn, a.n_chars AS an
            FROM documents b FULL OUTER JOIN aft a ON b.doc_id = a.doc_id)
      SELECT CAST(SUM(CASE WHEN bk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
             CAST(SUM(CASE WHEN ak IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
             CAST(SUM(CASE WHEN bk IS NOT NULL AND ak IS NOT NULL
                            AND (bl IS DISTINCT FROM al OR bn IS DISTINCT FROM an)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
             CAST(SUM(CASE WHEN bk IS NOT NULL AND ak IS NOT NULL
                            AND bl IS NOT DISTINCT FROM al AND bn IS NOT DISTINCT FROM an
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
             CAST(SUM(CASE WHEN bk IS NOT NULL AND ak IS NOT NULL
                            AND bl IS DISTINCT FROM al THEN 1 ELSE 0 END) AS BIGINT) AS chg_lang,
             CAST(SUM(CASE WHEN bk IS NOT NULL AND ak IS NOT NULL
                            AND bn IS DISTINCT FROM an THEN 1 ELSE 0 END) AS BIGINT) AS chg_n_chars
      FROM j""")
  ) { (spark, dir) =>
    import spark.implicits._
    val docs = t(spark, dir).documents
    val after = docs
      .filter($"doc_id" % 11 =!= 0)
      .select(
        $"doc_id",
        when($"doc_id" % 7 === 0, lit("xx")).otherwise($"lang").as("lang"),
        when($"doc_id" % 5 === 0, $"n_chars" + 1).otherwise($"n_chars").as("n_chars"))
      .unionByName(docs.filter($"doc_id" < 30)
        .select(($"doc_id" + 1000000L).as("doc_id"), $"lang", $"n_chars"))
    graft.operators.Diagnostics
      .diff(docs, after, keyCols = Seq("doc_id"), compareCols = Seq("lang", "n_chars"))
  }

  /** Two-sample proportion z-test (experiment readout): users split into
    * variants by a deterministic hash of their id, conversion = a
    * high-value purchase event; the z statistic compares conversion rates under the
    * pooled standard error. Everything derives from four exact integers
    * (per-variant users and converters), so the rates, pooled proportion,
    * and z are each a fixed chain of IEEE ops the oracle replays
    * identically — the engine ships the statistic, not a p-value table
    * (the caller compares |z| to their chosen critical value).
    */
  val qAbTest: GQuery = GQuery(
    "q_stat_ab_test",
    Some("""
      WITH u AS (SELECT user_id, user_id % 2 AS variant,
                        MAX(CASE WHEN event_type = 'purchase' AND value > 90.0 THEN 1 ELSE 0 END) AS converted
                 FROM events GROUP BY user_id),
      v AS (SELECT variant, COUNT(*) AS n_users,
                   CAST(SUM(converted) AS BIGINT) AS n_converted
            FROM u GROUP BY variant),
      w AS (SELECT
              MAX(CASE WHEN variant = 0 THEN n_users END) AS n0,
              MAX(CASE WHEN variant = 0 THEN n_converted END) AS c0,
              MAX(CASE WHEN variant = 1 THEN n_users END) AS n1,
              MAX(CASE WHEN variant = 1 THEN n_converted END) AS c1
            FROM v)
      SELECT n0, c0, n1, c1,
             CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS rate0,
             CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS rate1,
             (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)
               - CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
             / sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                    * (CAST(1.0 AS DOUBLE)
                       - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                    * (CAST(1.0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                       + CAST(1.0 AS DOUBLE) / CAST(n1 AS DOUBLE))) AS z
      FROM w""")
  ) { (spark, dir) =>
    import spark.implicits._
    val u = t(spark, dir).events
      .groupBy($"user_id")
      .agg(max(when($"event_type" === "purchase" && $"value" > 90.0, 1).otherwise(0)).as("converted"))
      .withColumn("variant", $"user_id" % 2)
    val v = u.groupBy($"variant")
      .agg(count(lit(1)).as("n_users"), sum($"converted").as("n_converted"))
    val w = v.agg(
      max(when($"variant" === 0, $"n_users")).as("n0"),
      max(when($"variant" === 0, $"n_converted")).as("c0"),
      max(when($"variant" === 1, $"n_users")).as("n1"),
      max(when($"variant" === 1, $"n_converted")).as("c1"))
    val rate0 = $"c0".cast("double") / $"n0".cast("double")
    val rate1 = $"c1".cast("double") / $"n1".cast("double")
    val pooled = ($"c0" + $"c1").cast("double") / ($"n0" + $"n1").cast("double")
    w.select(
      $"n0", $"c0", $"n1", $"c1",
      rate0.as("rate0"),
      rate1.as("rate1"),
      ((rate0 - rate1) /
        sqrt(pooled * (lit(1.0) - pooled) *
          (lit(1.0) / $"n0".cast("double") + lit(1.0) / $"n1".cast("double")))).as("z"))
  }

  /** Distribution-shape profile per source: Shannon entropy (bits) and
    * Gini impurity of the language mix — the "is this source diverse or
    * monoculture" signal a corpus curator reads before weighting it into
    * a training mix. Counts are exact BIGINTs; each p·log₂p / p² term is
    * one IEEE expression on an exact ratio; the term sums go through
    * DECIMAL(38,6) (order-insensitive, and the 1e-6 rounding absorbs any
    * last-ulp log2 divergence between libm and the JVM). One groupBy +
    * one broadcast-joined total per source — two exchanges at any scale.
    */
  val qEntropy: GQuery = GQuery(
    "q_profile_entropy",
    Some("""
      WITH c AS (SELECT source, lang, COUNT(*) AS cnt FROM documents GROUP BY 1, 2),
      t AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS tot FROM c GROUP BY 1),
      p AS (SELECT c.source, CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE) AS p
            FROM c JOIN t ON c.source = t.source)
      SELECT source,
             -CAST(SUM(CAST(p * log2(p) AS DECIMAL(38,6))) AS DOUBLE) AS entropy_bits,
             1.0 - CAST(SUM(CAST(p * p AS DECIMAL(38,6))) AS DOUBLE) AS gini_impurity,
             COUNT(*) AS n_values
      FROM p
      GROUP BY source
      ORDER BY source""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.queries.Common.D
    val c = t(spark, dir).documents
      .groupBy($"source", $"lang")
      .agg(count(lit(1)).as("cnt"))
    val tot = c.groupBy($"source").agg(sum($"cnt").cast("long").as("tot"))
    val p = c
      .join(broadcast(tot), "source")
      .select($"source", ($"cnt".cast("double") / $"tot".cast("double")).as("p"))
    p.groupBy($"source")
      .agg(
        (-sum(($"p" * log2($"p")).cast(D)).cast("double")).as("entropy_bits"),
        (lit(1.0) - sum(($"p" * $"p").cast(D)).cast("double")).as("gini_impurity"),
        count(lit(1)).as("n_values"))
      .orderBy($"source")
  }

  /** Winsorized (p05/p95-clipped) and robust (median/IQR) feature scaling
    * per group — the outlier-resistant siblings of q_norm_zscore. Exact
    * group percentiles (same interpolation convention both engines, see
    * q_agg_percentiles) broadcast back over one narrow stats join; the
    * per-row clip/scale chain is fixed IEEE arithmetic rounded at 6
    * decimals on both sides.
    */
  val qWinsorize: GQuery = GQuery(
    "q_norm_winsorize",
    Some("""
      WITH m AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS p05,
               quantile_cont(value, 0.25) AS p25,
               quantile_cont(value, 0.50) AS p50,
               quantile_cont(value, 0.75) AS p75,
               quantile_cont(value, 0.95) AS p95
        FROM events GROUP BY event_type)
      SELECT e.event_id, e.event_type,
             round(least(greatest(e.value, m.p05), m.p95), 6) AS winsorized,
             round(CASE WHEN m.p75 = m.p25 THEN NULL
                        ELSE (e.value - m.p50) / (m.p75 - m.p25) END, 6) AS robust_scaled,
             e.value < m.p05 OR e.value > m.p95 AS clipped
      FROM events e JOIN m USING (event_type)
      ORDER BY e.event_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val e = t(spark, dir).events
    val stats = e.groupBy($"event_type").agg(
      percentile($"value", lit(0.05)).as("p05"),
      percentile($"value", lit(0.25)).as("p25"),
      percentile($"value", lit(0.50)).as("p50"),
      percentile($"value", lit(0.75)).as("p75"),
      percentile($"value", lit(0.95)).as("p95"))
    e.join(broadcast(stats), "event_type")
      .select(
        $"event_id", $"event_type",
        round(least(greatest($"value", $"p05"), $"p95"), 6).as("winsorized"),
        // degenerate IQR guarded identically on both sides: Spark's
        // non-ANSI x/0 is NULL, DuckDB's IEEE division is ±Inf
        round(when($"p75" === $"p25", lit(null))
          .otherwise(($"value" - $"p50") / ($"p75" - $"p25")), 6).as("robust_scaled"),
        ($"value" < $"p05" || $"value" > $"p95").as("clipped"))
      .orderBy($"event_id")
  }

  /** Chi-square test of independence between two categorical columns
    * (lang × source over documents) — the workhorse drift/association
    * screen for corpus metadata. Contingency cells, margins and N are
    * exact integer counts; each cell's contribution
    * (obs·N − r·c)² / (r·c·N) is ONE fixed IEEE chain replayed identically
    * by the oracle, and the statistic sums contributions through
    * DECIMAL(38,6) (order-insensitive, [[Common.dsum]]). Cramér's V then
    * derives from the already-pinned χ² in double. Plan: one groupBy for
    * cells, two tiny margin aggregates broadcast back — a single shuffle
    * of ≤|langs|·|sources| rows regardless of corpus size.
    */
  val qChi2: GQuery = GQuery(
    "q_stat_chi2",
    Some("""
      WITH c AS (SELECT lang, source, COUNT(*) AS obs FROM documents GROUP BY 1, 2),
      r AS (SELECT lang, CAST(SUM(obs) AS BIGINT) AS rt FROM c GROUP BY 1),
      s AS (SELECT source, CAST(SUM(obs) AS BIGINT) AS ct FROM c GROUP BY 1),
      n AS (SELECT CAST(SUM(obs) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT lang) AS BIGINT) AS nr,
                   CAST(COUNT(DISTINCT source) AS BIGINT) AS nc
            FROM c),
      cells AS (
        SELECT CAST(c.obs * n.n - r.rt * s.ct AS DOUBLE)
                 * CAST(c.obs * n.n - r.rt * s.ct AS DOUBLE)
                 / (CAST(r.rt AS DOUBLE) * CAST(s.ct AS DOUBLE) * CAST(n.n AS DOUBLE))
                 AS contrib,
               n.n AS n, n.nr AS nr, n.nc AS nc
        FROM c JOIN r ON c.lang = r.lang JOIN s ON c.source = s.source, n)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
             MAX(n) AS n,
             (MAX(nr) - 1) * (MAX(nc) - 1) AS dof,
             CAST(SUM(CAST(contrib AS DECIMAL(38,6))) AS DOUBLE) AS chi2,
             sqrt(CAST(SUM(CAST(contrib AS DECIMAL(38,6))) AS DOUBLE)
                  / (CAST(MAX(n) AS DOUBLE)
                     * CAST(least(MAX(nr) - 1, MAX(nc) - 1) AS DOUBLE))) AS cramers_v
      FROM cells""")
  ) { (spark, dir) =>
    import spark.implicits._
    val docs  = t(spark, dir).documents
    val cells = docs.groupBy($"lang", $"source").agg(count(lit(1)).as("obs"))
    val r     = cells.groupBy($"lang").agg(sum($"obs").as("rt"))
    val s     = cells.groupBy($"source").agg(sum($"obs").as("ct"))
    val n = cells.agg(
      sum($"obs").as("n"),
      countDistinct($"lang").as("nr"),
      countDistinct($"source").as("nc"))
    val diff    = $"obs" * $"n" - $"rt" * $"ct"
    val contrib = (diff.cast("double") * diff.cast("double")) /
      ($"rt".cast("double") * $"ct".cast("double") * $"n".cast("double"))
    val chi2 = sum($"contrib".cast(Common.D)).cast("double")
    cells
      .join(broadcast(r), "lang")
      .join(broadcast(s), "source")
      .crossJoin(broadcast(n))
      .withColumn("contrib", contrib)
      .agg(
        count(lit(1)).as("n_cells"),
        max($"n").as("n"),
        ((max($"nr") - 1) * (max($"nc") - 1)).as("dof"),
        chi2.as("chi2"),
        sqrt(chi2 / (max($"n").cast("double") *
          least(max($"nr") - 1, max($"nc") - 1).cast("double"))).as("cramers_v"))
  }

  /** k-anonymity release ([[graft.operators.Diagnostics.kAnonymize]],
    * k = 20 on quasi-identifiers lang × source): rare metadata
    * combinations are masked so no released row is identifiable to fewer
    * than 20 peers. Every row ships with its suppression flag; the oracle
    * replays the window-count policy exactly.
    */
  val qKanon: GQuery = GQuery(
    "q_privacy_kanon",
    Some("""
      WITH g AS (SELECT doc_id, lang, source,
                        COUNT(*) OVER (PARTITION BY lang, source) AS qn
                 FROM documents)
      SELECT CAST(doc_id AS BIGINT) AS doc_id,
             CASE WHEN qn < 20 THEN '*' ELSE lang   END AS lang,
             CASE WHEN qn < 20 THEN '*' ELSE source END AS source,
             qn < 20 AS anon_suppressed
      FROM g ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    graft.operators.Diagnostics
      .kAnonymize(t(spark, dir).documents.select($"doc_id", $"lang", $"source"),
        Seq("lang", "source"), 20)
      .select($"doc_id".cast("long").as("doc_id"), $"lang", $"source", $"anon_suppressed")
      .orderBy($"doc_id")
  }

  /** Right-to-be-forgotten erasure over a versioned table: subjects on the
    * delete list (here user_id ≡ 0 mod 97) are scrubbed by committing a
    * filtered snapshot and VACUUMING history so no manifest references
    * their rows — erasure must kill time travel to the erased data, which
    * is exactly what ref-counted vacuum proves here (the spec side:
    * reading v1 afterwards fails). Output shows the audit a DPO wants:
    * before/after row and subject-row counts.
    */
  val qErasure: GQuery = GQuery(
    "q_privacy_erasure",
    Some("""
      SELECT * FROM (
        SELECT 'before' AS phase, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_subject_rows
        FROM events
        UNION ALL
        SELECT 'after', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        FROM events WHERE user_id % 97 != 0)
      ORDER BY phase DESC""")
  ) { (spark, dir) =>
    val ev  = t(spark, dir).events.select(col("event_id"), col("user_id"), col("value"))
    val scratch = Scratch.dir("graft_erasure")
    val out = scratch.resolve("events").toString
    graft.sources.Versioned.publish(ev, out)
    val isSubject = col("user_id") % 97 === 0
    def audit(phase: String) = {
      graft.sources.Versioned.read(spark, out)
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(isSubject, 1L).otherwise(0L)).as("n_subject_rows"))
        .select(lit(phase).as("phase"), col("n_rows"), col("n_subject_rows"))
    }
    val before = audit("before").ckpt()
    graft.sources.Versioned.publish(
      graft.sources.Versioned.read(spark, out).filter(!isSubject), out)
    graft.sources.Versioned.vacuum(spark, out, keepLast = 1) // history must die too
    val after = audit("after").ckpt()
    Scratch.purge(scratch) // both audits are materialized; nothing reads the files again
    before.unionAll(after).orderBy(col("phase").desc)
  }

  /** Equi-depth decile binning per group (ntile over a TOTAL order —
    * (value, event_id) — so bin assignment is deterministic and
    * engine-portable): the quantile-bucketing feature transform. One
    * window shuffle on the group key.
    */
  val qQuantileBins: GQuery = GQuery(
    "q_norm_quantile_bins",
    Some("""
      SELECT event_id, event_type,
             CAST(ntile(10) OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS INT) AS decile
      FROM events
      ORDER BY event_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
    t(spark, dir).events
      .select($"event_id", $"event_type", ntile(10).over(w).as("decile"))
      .orderBy($"event_id")
  }

  /** Leave-one-out target encoding: each row's category feature is the
    * mean target of its category EXCLUDING the row itself —
    * (S_c − x) / (n_c − 1) — the standard leakage-guard for categorical
    * features feeding a model. Group sums go through DECIMAL(38,6)
    * ([[Common.dsum]]) so S_c is identical cross-engine; the per-row
    * chain is fixed IEEE arithmetic, emitted as a RAW double (round-10 —
    * `round(x, 9)` was the only cross-build-sensitive step; PARITY.md
    * "Rounding portability"). Singleton categories fall back to
    * the global LOO mean. Broadcast-back two-pass, same shape as
    * q_norm_zscore.
    */
  val qTargetEncode: GQuery = GQuery(
    "q_norm_target_encode",
    Some(s"""
      WITH g AS (SELECT event_type, COUNT(*) AS n, ${sqlSum("value")} AS s
                 FROM events GROUP BY event_type),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS tn, ${sqlSum("value")} AS ts_sum FROM events)
      SELECT e.event_id, e.event_type,
             CASE WHEN g.n > 1
                  THEN (g.s - e.value) / (CAST(g.n AS DOUBLE) - 1.0)
                  ELSE (tot.ts_sum - e.value) / (CAST(tot.tn AS DOUBLE) - 1.0)
             END AS te
      FROM events e JOIN g USING (event_type), tot
      ORDER BY e.event_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val e = t(spark, dir).events
    val g = e.groupBy($"event_type").agg(count(lit(1)).as("n"), dsum($"value").as("s"))
    val tot = e.agg(count(lit(1)).as("tn"), dsum($"value").as("ts_sum"))
    e.join(broadcast(g), "event_type")
      .crossJoin(broadcast(tot))
      .select(
        $"event_id", $"event_type",
        when($"n" > 1, ($"s" - $"value") / ($"n".cast("double") - 1.0))
          .otherwise(($"ts_sum" - $"value") / ($"tn".cast("double") - 1.0)).as("te"))
      .orderBy($"event_id")
  }

  /** l-diversity release ([[graft.operators.Diagnostics.lDiversity]],
    * l = 3, quasi-identifiers lang × 25-char length bucket, sensitive
    * attribute source): a quasi group that is large enough to be
    * k-anonymous still leaks when (almost) everyone in it came from one
    * source — homogeneity attack — so groups with < 3 distinct sources
    * are masked. The oracle replays the distinct-count policy exactly.
    */
  val qLdiversity: GQuery = GQuery(
    "q_privacy_ldiversity",
    Some("""
      WITH b AS (SELECT doc_id, lang, CAST(n_chars // 25 AS BIGINT) AS len_bucket, source
                 FROM documents),
      g AS (SELECT lang, len_bucket, COUNT(DISTINCT source) AS ndiv
            FROM b GROUP BY lang, len_bucket)
      SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
             CASE WHEN g.ndiv < 3 THEN '*' ELSE b.lang END AS lang,
             CASE WHEN g.ndiv < 3 THEN CAST(-1 AS BIGINT) ELSE b.len_bucket END AS len_bucket,
             b.source,
             g.ndiv < 3 AS ldiv_suppressed
      FROM b JOIN g ON b.lang = g.lang AND b.len_bucket = g.len_bucket
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val b = t(spark, dir).documents.select(
      $"doc_id".cast("long").as("doc_id"),
      $"lang",
      floor($"n_chars" / 25).cast("long").as("len_bucket"),
      $"source")
    graft.operators.Diagnostics
      .lDiversity(b, Seq("lang", "len_bucket"), "source", l = 3)
      .select($"doc_id", $"lang", $"len_bucket", $"source", $"ldiv_suppressed")
      .orderBy($"doc_id")
  }

  /** Two-sample Kolmogorov–Smirnov test (click vs purchase event values) —
    * the standard nonparametric drift detector for CONTINUOUS metrics,
    * complementing [[qChi2]]'s categorical screen. Exact formulation:
    * per-distinct-value counts for both samples (one shuffle), cumulative
    * counts via [[graft.operators.Sampling.prefixSumsBy]] — the
    * range-partitioned two-pass parallel scan, NOT a single-partition
    * `Window.orderBy` (events.value is a DOUBLE, so distinct values ≈ row
    * count; an unpartitioned window would funnel ~n rows through one
    * task) — then D = max |F1 − F2|. Every per-row division is one fixed
    * IEEE chain on identical integer counts, so the max — and the derived
    * scaled statistic √(n1·n2/(n1+n2))·D — replays exactly in the oracle.
    */
  val qKsTest: GQuery = GQuery(
    "q_stat_ks",
    Some("""
      WITH f AS (
        SELECT value,
               CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2
        FROM events WHERE event_type IN ('click', 'purchase') GROUP BY value),
      c AS (
        SELECT CAST(SUM(c1) OVER (ORDER BY value) AS BIGINT) AS cum1,
               CAST(SUM(c2) OVER (ORDER BY value) AS BIGINT) AS cum2
        FROM f),
      tot AS (SELECT MAX(cum1) AS n1, MAX(cum2) AS n2 FROM c),
      d AS (
        SELECT round(MAX(abs(CAST(cum1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                           - CAST(cum2 AS DOUBLE) / CAST(n2 AS DOUBLE))), 6) AS ks_d
        FROM c, tot)
      SELECT tot.n1, tot.n2, d.ks_d,
             round(sqrt(CAST(tot.n1 * tot.n2 AS DOUBLE)
                        / CAST(tot.n1 + tot.n2 AS DOUBLE)) * d.ks_d, 6) AS ks_stat
      FROM tot, d""")
  ) { (spark, dir) =>
    import spark.implicits._
    val e = t(spark, dir).events
      .filter($"event_type".isin("click", "purchase"))
    val f = e.groupBy($"value").agg(
      sum(when($"event_type" === "click", 1L).otherwise(0L)).as("c1"),
      sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("c2"))
    // distributed two-pass prefix sum over the value order (values are
    // distinct post-groupBy → total order, no tie-break needed)
    val c = graft.operators.Sampling
      .prefixSumsBy(f, Seq($"value"), Seq("c1", "c2"))
      .select($"cum_c1".as("cum1"), $"cum_c2".as("cum2"))
    val tot = c.agg(max($"cum1").as("n1"), max($"cum2").as("n2"))
    c.crossJoin(broadcast(tot))
      .agg(
        max($"n1").as("n1"),
        max($"n2").as("n2"),
        round(max(abs($"cum1".cast("double") / $"n1".cast("double")
                    - $"cum2".cast("double") / $"n2".cast("double"))), 6).as("ks_d"))
      .select($"n1", $"n2", $"ks_d",
        round(sqrt(($"n1" * $"n2").cast("double") / ($"n1" + $"n2").cast("double"))
          * $"ks_d", 6).as("ks_stat"))
  }

  /** Mann–Whitney U rank-sum test (click vs purchase values) — the
    * median-shift companion to [[qKsTest]]'s shape test. Average ranks
    * come from per-distinct-value cumulative counts (rank sums are exact:
    * every term is a multiple of 0.5, so the double sum has no rounding
    * and is order-insensitive without a decimal detour); the tie-corrected
    * normal approximation z = (U1 − n1n2/2)/σ is one fixed IEEE chain on
    * those exact sums. Same scale shape as KS: one value-keyed shuffle,
    * then the range-partitioned two-pass prefix scan
    * ([[graft.operators.Sampling.prefixSumsBy]]) — never a
    * single-partition window (distinct DOUBLE values ≈ row count).
    */
  val qMannWhitney: GQuery = GQuery(
    "q_stat_mannwhitney",
    Some("""
      WITH f AS (
        SELECT value,
               CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2
        FROM events WHERE event_type IN ('click', 'purchase') GROUP BY value),
      c AS (
        SELECT c1, c2, c1 + c2 AS cnt,
               CAST(COALESCE(SUM(c1 + c2) OVER (ORDER BY value
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cumb
        FROM f),
      tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM f),
      r AS (
        SELECT CAST(SUM(CAST(c1 AS DOUBLE)
                       * (CAST(cumb AS DOUBLE) + (CAST(cnt AS DOUBLE) + 1) / 2)) AS DOUBLE) AS r1,
               CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS tie
        FROM c)
      SELECT tot.n1, tot.n2,
             round(r.r1 - CAST(tot.n1 AS DOUBLE) * (CAST(tot.n1 AS DOUBLE) + 1) / 2, 6) AS u1,
             round(CAST(tot.n1 AS DOUBLE) * CAST(tot.n2 AS DOUBLE)
                   - (r.r1 - CAST(tot.n1 AS DOUBLE) * (CAST(tot.n1 AS DOUBLE) + 1) / 2), 6) AS u2,
             round(((r.r1 - CAST(tot.n1 AS DOUBLE) * (CAST(tot.n1 AS DOUBLE) + 1) / 2)
                    - CAST(tot.n1 AS DOUBLE) * CAST(tot.n2 AS DOUBLE) / 2)
                   / sqrt(CAST(tot.n1 AS DOUBLE) * CAST(tot.n2 AS DOUBLE) / 12
                          * ((CAST(tot.n1 + tot.n2 AS DOUBLE) + 1)
                             - CAST(r.tie AS DOUBLE)
                               / (CAST(tot.n1 + tot.n2 AS DOUBLE)
                                  * (CAST(tot.n1 + tot.n2 AS DOUBLE) - 1)))), 6) AS z
      FROM tot, r""")
  ) { (spark, dir) =>
    import spark.implicits._
    val f = t(spark, dir).events
      .filter($"event_type".isin("click", "purchase"))
      .groupBy($"value").agg(
        sum(when($"event_type" === "click", 1L).otherwise(0L)).as("c1"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("c2"))
    // exclusive prefix of (c1+c2) = inclusive two-pass scan minus self
    val c = graft.operators.Sampling
      .prefixSumsBy(f.withColumn("cnt", $"c1" + $"c2"), Seq($"value"), Seq("cnt"))
      .select($"c1", $"c2", $"cnt", ($"cum_cnt" - $"cnt").as("cumb"))
    val tot = f.agg(sum($"c1").as("n1"), sum($"c2").as("n2"))
    val r = c.agg(
      sum($"c1".cast("double")
        * ($"cumb".cast("double") + ($"cnt".cast("double") + 1) / 2)).as("r1"),
      sum($"cnt" * $"cnt" * $"cnt" - $"cnt").as("tie"))
    val n1d = $"n1".cast("double")
    val n2d = $"n2".cast("double")
    val nd  = ($"n1" + $"n2").cast("double")
    val u1  = $"r1" - n1d * (n1d + 1) / 2
    tot.crossJoin(r)
      .select($"n1", $"n2",
        round(u1, 6).as("u1"),
        round(n1d * n2d - u1, 6).as("u2"),
        round((u1 - n1d * n2d / 2)
          / sqrt(n1d * n2d / 12
            * ((nd + 1) - $"tie".cast("double") / (nd * (nd - 1)))), 6).as("z"))
  }

  /** Poisson bootstrap of the mean click value (B = 32 replicates) — the
    * bootstrap in its only 100 TB-viable form: instead of resampling by
    * index (a join per replicate), each row contributes to replicate b
    * with a weight drawn Poisson(1) — row-LOCAL, one pass, B-bounded
    * blowup, the way large-scale CI estimation actually runs. The draw is
    * the portable md5 16-bit uniform pushed through the exact Poisson(1)
    * inverse CDF (fixed 16-bit thresholds), so every replicate is a pure
    * function of (event_id, b) and the oracle replays all 32 weighted
    * DECIMAL-pinned means plus the exact order-statistic CI bounds
    * (2nd/31st of 32 sorted means ≈ the 5%/95% band).
    */
  val qBootstrap: GQuery = {
    // P(X<=k) for Poisson(1), scaled to 16-bit: floor(cdf * 65536)
    val th = Seq(24109, 48217, 60271, 64289, 65294, 65495) // k = 0..5
    val caseSql = th.zipWithIndex
      .map { case (t, k) => s"WHEN u < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 6 END")
    GQuery(
      "q_stat_bootstrap",
      Some(s"""
      WITH e AS (
        SELECT event_id, value FROM events WHERE event_type = 'click'),
      d AS (
        SELECT e.value, b.b,
               ('0x' || substr(md5(CAST(e.event_id AS VARCHAR) || ':' || CAST(b.b AS VARCHAR) || ':23'), 1, 4))::BIGINT AS u
        FROM e, LATERAL (SELECT unnest(generate_series(0, 31)) AS b) b),
      w AS (SELECT b, value, $caseSql AS wt FROM d),
      reps AS (
        SELECT b,
               CAST(SUM(CAST(value * wt AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(SUM(wt) AS DOUBLE) AS mean
        FROM w GROUP BY b),
      ranked AS (
        SELECT b, round(mean, 6) AS mean,
               CAST(ROW_NUMBER() OVER (ORDER BY round(mean, 6), b) AS BIGINT) AS rk
        FROM reps),
      ci AS (
        SELECT MAX(CASE WHEN rk = 2  THEN mean END) AS lo,
               MAX(CASE WHEN rk = 31 THEN mean END) AS hi
        FROM ranked)
      SELECT CAST(ranked.b AS BIGINT) AS b, ranked.mean, ci.lo AS ci_lo, ci.hi AS ci_hi
      FROM ranked, ci
      ORDER BY ranked.b""")
    ) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir).events
        .filter($"event_type" === "click")
        .select($"event_id", $"value")
      val d = e
        .select($"event_id", $"value", explode(sequence(lit(0), lit(31))).as("b"))
        .withColumn("u",
          conv(substring(md5(concat($"event_id".cast("string"), lit(":"),
            $"b".cast("string"), lit(":23"))), 1, 4), 16, 10).cast("long"))
      val wt = th.zipWithIndex
        .foldRight(lit(6): org.apache.spark.sql.Column) { case ((t, k), acc) =>
          when($"u" < t, lit(k)).otherwise(acc)
        }
      val reps = d.withColumn("wt", wt)
        .groupBy($"b")
        .agg((sum(($"value" * $"wt").cast(Common.D)).cast("double")
          / sum($"wt").cast("double")).as("mean"))
      val ranked = reps
        .select($"b", round($"mean", 6).as("mean"))
        .withColumn("rk",
          row_number().over(Window.orderBy($"mean", $"b")).cast("long"))
      val ci = ranked.agg(
        max(when($"rk" === 2, $"mean")).as("ci_lo"),
        max(when($"rk" === 31, $"mean")).as("ci_hi"))
      ranked.crossJoin(broadcast(ci))
        .select($"b".cast("long").as("b"), $"mean", $"ci_lo", $"ci_hi")
        .orderBy($"b")
    }
  }

  /** Keyed pseudonymization release (completing the privacy suite next
    * to [[qKanon]]/[[qLdiversity]]/erasure): raw user ids are replaced by
    * a salted one-way token md5(salt:id) — consistent across tables and
    * reruns (joins still work), irreversible without the salt, and the
    * released aggregate carries NO raw identifier column at all. Pure
    * row-local hashing plus one keyed aggregate.
    */
  val qPseudonym: GQuery = GQuery(
    "q_privacy_pseudonym",
    Some("""
      SELECT substr(md5('pepper:' || CAST(user_id AS VARCHAR)), 1, 16) AS pseudonym,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY pseudonym
      ORDER BY pseudonym""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).events
      .select(
        substring(md5(concat(lit("pepper:"), $"user_id".cast("string"))), 1, 16)
          .as("pseudonym"),
        $"event_type", $"value")
      .groupBy($"pseudonym")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct($"event_type").as("n_types"),
        dsum($"value").as("total_value"))
      .orderBy($"pseudonym")
  }

  /** Robust scaling via median/MAD (the outlier-immune z-score): per
    * language, the exact median of document length, the median absolute
    * deviation around it, and the count of modified-z outliers
    * (0.6745·|x − med|/MAD > 3.5, Iglewicz–Hoaglin) — the robust
    * companion to [[qZscore]]'s moment-based scaling, which a single
    * 10 GB document would drag arbitrarily. Two grouped exact-percentile
    * passes (both engines interpolate quantile 0.5 identically) + one
    * broadcast join back; the outlier comparison rounds at 6dp on both
    * sides (the IQR-fence convention).
    *
    * Scale contract: Spark's EXACT `percentile` buffers per-group VALUE
    * COUNTS, so its state is the group's value SUPPORT, not its row
    * count — safe here because n_chars is integer-valued (pass 1) and
    * |int − med| lands on a half-integer grid (pass 2), both bounded
    * supports. For continuous columns the same query shape must switch
    * to `percentile_approx` (mergeable sketch, the q_agg_approx_quantile
    * path) — an exact percentile over corpus-sized distinct doubles is
    * per-group state ∝ rows, the aggregation-buffer version of the
    * round-7 invertedIndex finding.
    */
  val qMad: GQuery = GQuery(
    "q_norm_mad",
    Some("""
      WITH med AS (
        SELECT lang, CAST(quantile_cont(n_chars, 0.5) AS DOUBLE) AS med
        FROM documents GROUP BY lang),
      dev AS (
        SELECT d.lang,
               CAST(quantile_cont(abs(CAST(d.n_chars AS DOUBLE) - m.med), 0.5) AS DOUBLE) AS mad
        FROM documents d JOIN med m USING (lang)
        GROUP BY d.lang),
      z AS (
        SELECT d.lang, m.med, v.mad,
               CASE WHEN v.mad > 0
                    THEN round(0.6745 * abs(CAST(d.n_chars AS DOUBLE) - m.med) / v.mad, 6)
                    ELSE 0.0 END AS mz
        FROM documents d JOIN med m USING (lang) JOIN dev v USING (lang))
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             round(MAX(med), 6) AS median_chars,
             round(MAX(mad), 6) AS mad_chars,
             round(MAX(mz), 6) AS max_z,
             CAST(SUM(CASE WHEN mz > 3.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM z
      GROUP BY lang
      ORDER BY lang""")
  ) { (spark, dir) =>
    import spark.implicits._
    val docs = t(spark, dir).documents.select($"lang", $"n_chars")
    val med = docs.groupBy($"lang").agg(percentile($"n_chars", lit(0.5)).as("med"))
    val dev = docs.join(broadcast(med), "lang")
      .groupBy($"lang")
      .agg(percentile(abs($"n_chars".cast("double") - $"med"), lit(0.5)).as("mad"))
    docs.join(broadcast(med), "lang").join(broadcast(dev), "lang")
      .select($"lang", $"med", $"mad",
        when($"mad" > 0,
          round(lit(0.6745) * abs($"n_chars".cast("double") - $"med") / $"mad", 6))
          .otherwise(lit(0.0)).as("mz"))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(max($"med"), 6).as("median_chars"),
        round(max($"mad"), 6).as("mad_chars"),
        round(max($"mz"), 6).as("max_z"),
        sum(when($"mz" > 3.5, 1L).otherwise(0L)).as("n_outliers"))
      .orderBy($"lang")
  }

  /** The three deterministic "raters" behind the agreement audits: each
    * grades a document 0/1/2 from a different row-local quality signal
    * (mean token length, type-token ratio, stopword ratio). Thresholds
    * sit at the sf0.01 signal terciles so the contingency table is
    * non-degenerate. Entirely row-local — one corpus scan, no shuffle
    * until the final 1-row aggregate; every ratio is exact-integer /
    * exact-integer, so the grades replay bit-identically in any engine.
    */
  private def raters(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    import spark.implicits._
    val toks = filter(graft.operators.TextOps.tokens($"text"), x => length(x) > 0)
    val stop = Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "that")
    t(spark, dir).documents
      .select($"doc_id", toks.as("ts"))
      .filter(size($"ts") > 0)
      .select(
        $"doc_id",
        (aggregate($"ts", lit(0), (a, x) => a + length(x)).cast("double")
          / size($"ts").cast("double")).as("atl"),
        (size(array_distinct($"ts")).cast("double")
          / size($"ts").cast("double")).as("ttr"),
        (size(filter($"ts", x => x.isin(stop: _*))).cast("double")
          / size($"ts").cast("double")).as("swr"))
      .select(
        $"doc_id",
        when($"atl" < 4.4, 0L).when($"atl" < 4.6, 1L).otherwise(2L).as("ra"),
        when($"ttr" < 0.40, 0L).when($"ttr" < 0.55, 1L).otherwise(2L).as("rb"),
        when($"swr" < 0.03, 0L).when($"swr" < 0.07, 1L).otherwise(2L).as("rc"))
  }

  /** SQL twin of [[raters]] — identical token pipeline, CASE chains, and
    * integer-ratio arithmetic. */
  private val ratersSql = """
      tk AS (
        SELECT doc_id,
               list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                           t -> length(t) > 0) AS ts
        FROM documents),
      sig AS (
        SELECT doc_id,
               CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE)
                 / CAST(len(ts) AS DOUBLE) AS atl,
               CAST(len(list_distinct(ts)) AS DOUBLE)
                 / CAST(len(ts) AS DOUBLE) AS ttr,
               CAST(len(list_filter(ts, t -> t IN
                 ('the','a','an','of','to','and','in','is','it','that'))) AS DOUBLE)
                 / CAST(len(ts) AS DOUBLE) AS swr
        FROM tk WHERE len(ts) > 0),
      rt AS (
        SELECT doc_id,
               CASE WHEN atl < 4.4 THEN 0 WHEN atl < 4.6 THEN 1 ELSE 2 END AS ra,
               CASE WHEN ttr < 0.40 THEN 0 WHEN ttr < 0.55 THEN 1 ELSE 2 END AS rb,
               CASE WHEN swr < 0.03 THEN 0 WHEN swr < 0.07 THEN 1 ELSE 2 END AS rc
        FROM sig)"""

  /** Cohen's kappa between two deterministic quality raters — the
    * label-quality audit run before trusting any annotation source
    * (human or heuristic): chance-corrected agreement from the 3×3
    * contingency's exact integer counts, po = observed agreement,
    * pe = Σ marginal products / n². One corpus scan into a single 1-row
    * aggregate; every division is IEEE on integer-derived operands, so
    * kappa hash-matches.
    */
  val qCohenKappa: GQuery = GQuery(
    "q_stat_cohen_kappa",
    Some(s"""
      WITH $ratersSql,
      agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN ra = rb THEN 1 ELSE 0 END) AS BIGINT) AS agree,
               CAST(SUM(CASE WHEN ra = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a0,
               CAST(SUM(CASE WHEN ra = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a1,
               CAST(SUM(CASE WHEN ra = 2 THEN 1 ELSE 0 END) AS BIGINT) AS a2,
               CAST(SUM(CASE WHEN rb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b0,
               CAST(SUM(CASE WHEN rb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
               CAST(SUM(CASE WHEN rb = 2 THEN 1 ELSE 0 END) AS BIGINT) AS b2
        FROM rt)
      SELECT n, agree,
             round(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
             round(CAST(a0*b0 + a1*b1 + a2*b2 AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS pe,
             round((CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)
                    - CAST(a0*b0 + a1*b1 + a2*b2 AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                   / (CAST(1 AS DOUBLE)
                      - CAST(a0*b0 + a1*b1 + a2*b2 AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6) AS kappa
      FROM agg""")
  ) { (spark, dir) =>
    import spark.implicits._
    val agg = raters(spark, dir).agg(
      count(lit(1)).as("n"),
      sum(when($"ra" === $"rb", 1L).otherwise(0L)).as("agree"),
      sum(when($"ra" === 0, 1L).otherwise(0L)).as("a0"),
      sum(when($"ra" === 1, 1L).otherwise(0L)).as("a1"),
      sum(when($"ra" === 2, 1L).otherwise(0L)).as("a2"),
      sum(when($"rb" === 0, 1L).otherwise(0L)).as("b0"),
      sum(when($"rb" === 1, 1L).otherwise(0L)).as("b1"),
      sum(when($"rb" === 2, 1L).otherwise(0L)).as("b2"))
    val nd = $"n".cast("double")
    val po = $"agree".cast("double") / nd
    val pe = ($"a0" * $"b0" + $"a1" * $"b1" + $"a2" * $"b2").cast("double") / (nd * nd)
    agg.select(
      $"n", $"agree",
      round(po, 6).as("po"),
      round(pe, 6).as("pe"),
      round((po - pe) / (lit(1.0) - pe), 6).as("kappa"))
  }

  /** Fleiss' kappa across all three raters — the multi-annotator
    * agreement number (m = 3 raters, 3 categories): per-item category
    * counts n_ij, P_i = (Σ n_ij² − m)/(m(m−1)), chance agreement from
    * squared category shares. P_i is a small rational (denominator 6),
    * NOT exact in binary — so the per-item NUMERATORS (Σ n_ij² − 3,
    * exact integers) are summed and divided ONCE, never a float sum of
    * thirds (the order-dependence trap). Still one scan, one 1-row agg.
    */
  val qFleissKappa: GQuery = GQuery(
    "q_stat_fleiss_kappa",
    Some(s"""
      WITH $ratersSql,
      cnt AS (
        SELECT doc_id,
               CAST((CASE WHEN ra=0 THEN 1 ELSE 0 END) + (CASE WHEN rb=0 THEN 1 ELSE 0 END)
                    + (CASE WHEN rc=0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST((CASE WHEN ra=1 THEN 1 ELSE 0 END) + (CASE WHEN rb=1 THEN 1 ELSE 0 END)
                    + (CASE WHEN rc=1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST((CASE WHEN ra=2 THEN 1 ELSE 0 END) + (CASE WHEN rb=2 THEN 1 ELSE 0 END)
                    + (CASE WHEN rc=2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        FROM rt),
      agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n0*n0 + n1*n1 + n2*n2 - 3) AS BIGINT) AS num,
               CAST(SUM(n0) AS BIGINT) AS c0,
               CAST(SUM(n1) AS BIGINT) AS c1,
               CAST(SUM(n2) AS BIGINT) AS c2
        FROM cnt)
      SELECT n_docs, c0, c1, c2,
             round(CAST(num AS DOUBLE) / (CAST(n_docs AS DOUBLE) * CAST(6 AS DOUBLE)), 6) AS p_bar,
             round((CAST(c0 AS DOUBLE) / (CAST(3 AS DOUBLE) * CAST(n_docs AS DOUBLE)))
                   * (CAST(c0 AS DOUBLE) / (CAST(3 AS DOUBLE) * CAST(n_docs AS DOUBLE)))
                   + (CAST(c1 AS DOUBLE) / (CAST(3 AS DOUBLE) * CAST(n_docs AS DOUBLE)))
                   * (CAST(c1 AS DOUBLE) / (CAST(3 AS DOUBLE) * CAST(n_docs AS DOUBLE)))
                   + (CAST(c2 AS DOUBLE) / (CAST(3 AS DOUBLE) * CAST(n_docs AS DOUBLE)))
                   * (CAST(c2 AS DOUBLE) / (CAST(3 AS DOUBLE) * CAST(n_docs AS DOUBLE))), 6) AS p_e,
             round((CAST(num AS DOUBLE) / (CAST(n_docs AS DOUBLE) * CAST(6 AS DOUBLE))
                    - ((CAST(c0 AS DOUBLE) / (CAST(3 AS DOUBLE) * CAST(n_docs AS DOUBLE)))
                       * (CAST(c0 AS DOUBLE) / (CAST(3 AS DOUBLE) * CAST(n_docs AS DOUBLE)))
                       + (CAST(c1 AS DOUBLE) / (CAST(3 AS DOUBLE) * CAST(n_docs AS DOUBLE)))
                       * (CAST(c1 AS DOUBLE) / (CAST(3 AS DOUBLE) * CAST(n_docs AS DOUBLE)))
                       + (CAST(c2 AS DOUBLE) / (CAST(3 AS DOUBLE) * CAST(n_docs AS DOUBLE)))
                       * (CAST(c2 AS DOUBLE) / (CAST(3 AS DOUBLE) * CAST(n_docs AS DOUBLE)))))
                   / (CAST(1 AS DOUBLE)
                      - ((CAST(c0 AS DOUBLE) / (CAST(3 AS DOUBLE) * CAST(n_docs AS DOUBLE)))
                         * (CAST(c0 AS DOUBLE) / (CAST(3 AS DOUBLE) * CAST(n_docs AS DOUBLE)))
                         + (CAST(c1 AS DOUBLE) / (CAST(3 AS DOUBLE) * CAST(n_docs AS DOUBLE)))
                         * (CAST(c1 AS DOUBLE) / (CAST(3 AS DOUBLE) * CAST(n_docs AS DOUBLE)))
                         + (CAST(c2 AS DOUBLE) / (CAST(3 AS DOUBLE) * CAST(n_docs AS DOUBLE)))
                         * (CAST(c2 AS DOUBLE) / (CAST(3 AS DOUBLE) * CAST(n_docs AS DOUBLE))))), 6) AS kappa
      FROM agg""")
  ) { (spark, dir) =>
    import spark.implicits._
    def ind(c: org.apache.spark.sql.Column, v: Int) = when(c === v, 1L).otherwise(0L)
    val cnt = raters(spark, dir).select(
      (ind($"ra", 0) + ind($"rb", 0) + ind($"rc", 0)).as("n0"),
      (ind($"ra", 1) + ind($"rb", 1) + ind($"rc", 1)).as("n1"),
      (ind($"ra", 2) + ind($"rb", 2) + ind($"rc", 2)).as("n2"))
    val agg = cnt.agg(
      count(lit(1)).as("n_docs"),
      sum($"n0" * $"n0" + $"n1" * $"n1" + $"n2" * $"n2" - 3L).as("num"),
      sum($"n0").as("c0"),
      sum($"n1").as("c1"),
      sum($"n2").as("c2"))
    val nd = $"n_docs".cast("double")
    val pBar = $"num".cast("double") / (nd * lit(3.0 * 2.0))
    def share(c: org.apache.spark.sql.Column) = c.cast("double") / (lit(3.0) * nd)
    val pE = share($"c0") * share($"c0") + share($"c1") * share($"c1") +
      share($"c2") * share($"c2")
    agg.select(
      $"n_docs", $"c0", $"c1", $"c2",
      round(pBar, 6).as("p_bar"),
      round(pE, 6).as("p_e"),
      round((pBar - pE) / (lit(1.0) - pE), 6).as("kappa"))
  }

  /** Spearman rank correlation between two per-doc quality signals
    * (mean token length vs type-token ratio) — the signal-agreement
    * audit run before trusting any single quality score for filtering:
    * if two cheap signals rank the corpus differently (ρ near 0), a
    * one-signal gate is making arbitrary keep decisions. Ties get the
    * standard AVERAGE rank, carried as 2·rank (exact integers: r2 =
    * 2·cnt_less + cnt_eq + 1) so no half-rank double ever enters a sum.
    *
    * Scale shape: per-value rank tables come from a count aggregate +
    * the distributed prefix scan ([[graft.operators.Sampling.prefixSumsBy]]
    * — never `sum().over(Window.orderBy)`, the single-partition trap);
    * ranks join back by value (two keyed shuffles); the moment sums are
    * DECIMAL(38,0) products (a BIGINT Σ rx2·ry2 overflows past ~10⁶
    * rows). The final ρ is one fixed IEEE chain on exact-integer-derived
    * doubles.
    */
  val qSpearman: GQuery = GQuery(
    "q_stat_spearman",
    Some("""
      WITH tk AS (
        SELECT doc_id,
               list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                           t -> length(t) > 0) AS ts
        FROM documents),
      sig AS (
        SELECT doc_id,
               CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE)
                 / CAST(len(ts) AS DOUBLE) AS x,
               CAST(len(list_distinct(ts)) AS DOUBLE)
                 / CAST(len(ts) AS DOUBLE) AS y
        FROM tk WHERE len(ts) > 0),
      xd AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt FROM sig GROUP BY x),
      xr AS (SELECT x, 2 * (SUM(cnt) OVER (ORDER BY x) - cnt) + cnt + 1 AS rx2 FROM xd),
      yd AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS cnt FROM sig GROUP BY y),
      yr AS (SELECT y, 2 * (SUM(cnt) OVER (ORDER BY y) - cnt) + cnt + 1 AS ry2 FROM yd),
      j AS (SELECT s.doc_id, xr.rx2, yr.ry2
            FROM sig s JOIN xr ON xr.x = s.x JOIN yr ON yr.y = s.y),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(rx2 AS DECIMAL(38,0))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(ry2 AS DECIMAL(38,0))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(rx2 AS DECIMAL(38,0)) * CAST(rx2 AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(ry2 AS DECIMAL(38,0)) * CAST(ry2 AS DECIMAL(38,0))) AS DOUBLE) AS syy,
                   CAST(SUM(CAST(rx2 AS DECIMAL(38,0)) * CAST(ry2 AS DECIMAL(38,0))) AS DOUBLE) AS sxy
            FROM j)
      SELECT n AS n_docs,
             round((CAST(n AS DOUBLE) * sxy - sx * sy)
                   / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                          * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS spearman_rho
      FROM m""")
  ) { (spark, dir) =>
    import spark.implicits._
    val D0 = org.apache.spark.sql.types.DecimalType(38, 0)
    val toks = filter(graft.operators.TextOps.tokens($"text"), x => length(x) > 0)
    val sig = t(spark, dir).documents
      .select($"doc_id", toks.as("ts"))
      .filter(size($"ts") > 0)
      .select(
        $"doc_id",
        (aggregate($"ts", lit(0), (a, x) => a + length(x)).cast("double")
          / size($"ts").cast("double")).as("x"),
        (size(array_distinct($"ts")).cast("double")
          / size($"ts").cast("double")).as("y"))
      .ckptLazy()
    def rank2(c: String, out: String): org.apache.spark.sql.DataFrame = {
      val d = sig.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      graft.operators.Sampling
        .prefixSumsBy(d, Seq(col(c)), Seq("cnt"))
        .select(col(c),
          (lit(2) * (col("cum_cnt") - col("cnt")) + col("cnt") + 1).as(out))
    }
    val j = sig
      .join(rank2("x", "rx2"), "x")
      .join(rank2("y", "ry2"), "y")
    val m = j.agg(
      count(lit(1)).as("n"),
      sum($"rx2".cast(D0)).cast("double").as("sx"),
      sum($"ry2".cast(D0)).cast("double").as("sy"),
      sum($"rx2".cast(D0) * $"rx2".cast(D0)).cast("double").as("sxx"),
      sum($"ry2".cast(D0) * $"ry2".cast(D0)).cast("double").as("syy"),
      sum($"rx2".cast(D0) * $"ry2".cast(D0)).cast("double").as("sxy"))
    val nd = $"n".cast("double")
    m.select(
      $"n".as("n_docs"),
      round((nd * $"sxy" - $"sx" * $"sy")
        / sqrt((nd * $"sxx" - $"sx" * $"sx") * (nd * $"syy" - $"sy" * $"sy")), 6)
        .as("spearman_rho"))
  }

  /** Randomization (permutation) test for the difference of mean doc
    * length between `lang = 'en'` and the rest — the distribution-free
    * companion to [[qAbTest]]/[[qBootstrap]]: under the null, group
    * labels are exchangeable, so the observed mean gap is compared
    * against 32 md5-deterministic label re-assignments. A p-value near
    * the bottom says the English slice genuinely differs in length —
    * the kind of slice-vs-corpus check run before per-language length
    * gates.
    *
    * Scale shape: the 32-way replicate fan-out is row-local (the
    * qBootstrap recipe); each replicate's means are one keyed aggregate
    * of exact BIGINT char sums, one IEEE division each. Both |diff|
    * values round to 6 decimals BEFORE the exceed comparison so a
    * boundary near-tie can never flip between engines.
    */
  val qPermutation: GQuery = GQuery(
    "q_stat_permutation",
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS v, (lang = 'en') AS grp
        FROM documents),
      obs AS (
        SELECT CAST(SUM(CASE WHEN grp THEN v END) AS DOUBLE)
                 / CAST(COUNT(*) FILTER (WHERE grp) AS DOUBLE)
               - CAST(SUM(CASE WHEN NOT grp THEN v END) AS DOUBLE)
                 / CAST(COUNT(*) FILTER (WHERE NOT grp) AS DOUBLE) AS diff_obs,
               CAST(COUNT(*) FILTER (WHERE grp) AS BIGINT) AS n_a,
               CAST(COUNT(*) FILTER (WHERE NOT grp) AS BIGINT) AS n_b
        FROM d),
      reps AS (
        SELECT b,
               CAST(SUM(CASE WHEN pg THEN v END) AS DOUBLE)
                 / CAST(COUNT(*) FILTER (WHERE pg) AS DOUBLE)
               - CAST(SUM(CASE WHEN NOT pg THEN v END) AS DOUBLE)
                 / CAST(COUNT(*) FILTER (WHERE NOT pg) AS DOUBLE) AS diff_b
        FROM (
          SELECT d.v, b.b,
                 (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':'
                                   || CAST(b.b AS VARCHAR) || ':29'), 1, 8))::UBIGINT
                  % 2 = 0) AS pg
          FROM d, LATERAL (SELECT unnest(generate_series(0, 31)) AS b) b)
        GROUP BY b),
      ex AS (
        SELECT CAST(SUM(CASE WHEN round(abs(r.diff_b), 6) >= round(abs(o.diff_obs), 6)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_exceed
        FROM reps r CROSS JOIN obs o)
      SELECT o.n_a, o.n_b,
             round(o.diff_obs, 6) AS diff_obs,
             ex.n_exceed,
             round(CAST(ex.n_exceed AS DOUBLE) / CAST(32 AS DOUBLE), 6) AS p_value
      FROM obs o CROSS JOIN ex""")
  ) { (spark, dir) =>
    import spark.implicits._
    val d = t(spark, dir).documents
      .select($"doc_id", $"n_chars".cast("long").as("v"), ($"lang" === "en").as("grp"))
      .ckptLazy()
    def meanDiff(g: org.apache.spark.sql.Column) =
      sum(when(g, $"v")).cast("double") / count(when(g, 1)).cast("double") -
        sum(when(!g, $"v")).cast("double") / count(when(!g, 1)).cast("double")
    val obs = d.agg(
      meanDiff($"grp").as("diff_obs"),
      count(when($"grp", 1)).as("n_a"),
      count(when(!$"grp", 1)).as("n_b"))
    val reps = d
      .select($"doc_id", $"v", explode(sequence(lit(0), lit(31))).as("b"))
      .withColumn("pg",
        conv(substring(md5(concat($"doc_id".cast("string"), lit(":"),
          $"b".cast("string"), lit(":29"))), 1, 8), 16, 10).cast("long") % 2 === 0)
      .groupBy($"b")
      .agg(meanDiff($"pg").as("diff_b"))
    val ex = reps.crossJoin(broadcast(obs))
      .agg(sum(when(round(abs($"diff_b"), 6) >= round(abs($"diff_obs"), 6), 1L)
        .otherwise(0L)).as("n_exceed"))
    obs.crossJoin(broadcast(ex))
      .select($"n_a", $"n_b",
        round($"diff_obs", 6).as("diff_obs"),
        $"n_exceed",
        round($"n_exceed".cast("double") / lit(32).cast("double"), 6).as("p_value"))
  }

  /** Cramér's V effect size for the language × quality-tercile
    * contingency — the magnitude companion to [[qChi2]]'s significance:
    * at corpus scale EVERYTHING is "significant", and V =
    * sqrt(χ²/(n·min(r−1,c−1))) ∈ [0,1] is the number that says whether
    * the association is worth acting on (per-language quality gates) or
    * noise. Quality tercile is the deterministic atl rater from the
    * kappa audits.
    *
    * Scale shape: one row-local scan into a (langs × 3)-cell count
    * table; expected counts, χ² terms (6-dp rounded, DECIMAL-summed
    * over the bounded cells), and V are bounded-cardinality math.
    */
  val qCramersV: GQuery = GQuery(
    "q_stat_cramers_v",
    Some(s"""
      WITH $ratersSql,
      ct AS (
        SELECT d.lang, rt.ra, CAST(COUNT(*) AS BIGINT) AS o
        FROM rt JOIN documents d ON d.doc_id = rt.doc_id
        GROUP BY 1, 2),
      rowt AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rtot FROM ct GROUP BY 1),
      colt AS (SELECT ra, CAST(SUM(o) AS BIGINT) AS ctot FROM ct GROUP BY 1),
      nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_rows,
                    CAST(COUNT(DISTINCT ra) AS BIGINT) AS n_cols
             FROM ct),
      terms AS (
        SELECT round((CAST(ct.o AS DOUBLE)
                      - CAST(r.rtot AS DOUBLE) * CAST(c.ctot AS DOUBLE) / CAST(nn.n AS DOUBLE))
                     * (CAST(ct.o AS DOUBLE)
                        - CAST(r.rtot AS DOUBLE) * CAST(c.ctot AS DOUBLE) / CAST(nn.n AS DOUBLE))
                     / (CAST(r.rtot AS DOUBLE) * CAST(c.ctot AS DOUBLE) / CAST(nn.n AS DOUBLE)),
                     6) AS t
        FROM ct JOIN rowt r ON r.lang = ct.lang
        JOIN colt c ON c.ra = ct.ra
        CROSS JOIN nn),
      chi AS (SELECT CAST(SUM(CAST(t AS DECIMAL(38,6))) AS DOUBLE) AS chi2 FROM terms)
      SELECT nn.n AS n_docs, nn.n_rows, nn.n_cols,
             round(chi.chi2, 6) AS chi2,
             round(sqrt(chi.chi2
                        / (CAST(nn.n AS DOUBLE)
                           * CAST(LEAST(nn.n_rows - 1, nn.n_cols - 1) AS DOUBLE))), 6)
               AS cramers_v
      FROM nn CROSS JOIN chi""")
  ) { (spark, dir) =>
    import spark.implicits._
    val docs = t(spark, dir).documents
    val ct = raters(spark, dir)
      .join(docs.select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang", $"ra")
      .agg(count(lit(1)).as("o"))
      .ckptLazy()
    val rowt = ct.groupBy($"lang").agg(sum($"o").as("rtot"))
    val colt = ct.groupBy($"ra").agg(sum($"o").as("ctot"))
    val nn = ct.agg(
      sum($"o").as("n"),
      countDistinct($"lang").as("n_rows"),
      countDistinct($"ra").as("n_cols"))
    val e = $"rtot".cast("double") * $"ctot".cast("double") / $"n".cast("double")
    val terms = ct
      .join(broadcast(rowt), "lang")
      .join(broadcast(colt), "ra")
      .crossJoin(broadcast(nn))
      .select(round(($"o".cast("double") - e) * ($"o".cast("double") - e) / e, 6).as("t"))
    val chi = terms.agg(sum($"t".cast(Common.D)).cast("double").as("chi2"))
    nn.crossJoin(broadcast(chi))
      .select(
        $"n".as("n_docs"), $"n_rows", $"n_cols",
        round($"chi2", 6).as("chi2"),
        round(sqrt($"chi2" / ($"n".cast("double")
          * least($"n_rows" - 1, $"n_cols" - 1).cast("double"))), 6).as("cramers_v"))
  }

  /** McNemar's test (continuity-corrected) for PAIRED classifier
    * comparison — the right test when two quality filters score the SAME
    * documents (the independent-samples chi² of q_stat_chi2 is wrong
    * there): only the discordant counts b (A right, B wrong) and c
    * (A wrong, B right) carry signal, χ² = (max(|b−c|−1, 0))²/(b+c).
    * Here A = byte-length gate, B = token-count gate, truth = lang='en'.
    *
    * Scale shape: one scan, row-local predicates, one 4-cell aggregate —
    * nothing grows with the corpus. χ² is an exact integer ratio and the
    * significance flag compares identical doubles to a literal, so every
    * cell is hash-portable.
    */
  val qMcnemar: GQuery = GQuery(
    "q_stat_mcnemar",
    Some("""
      WITH d AS (SELECT doc_id,
                        (lang = 'en') AS truth,
                        (n_chars > 300) AS pred_a,
                        (len(string_split(text, ' ')) > 45) AS pred_b
                 FROM documents),
      cells AS (SELECT
                  CAST(SUM(CASE WHEN (pred_a = truth) AND (pred_b = truth) THEN 1 ELSE 0 END) AS BIGINT) AS both_right,
                  CAST(SUM(CASE WHEN (pred_a = truth) AND (pred_b <> truth) THEN 1 ELSE 0 END) AS BIGINT) AS a_only,
                  CAST(SUM(CASE WHEN (pred_a <> truth) AND (pred_b = truth) THEN 1 ELSE 0 END) AS BIGINT) AS b_only,
                  CAST(SUM(CASE WHEN (pred_a <> truth) AND (pred_b <> truth) THEN 1 ELSE 0 END) AS BIGINT) AS both_wrong
                FROM d),
      s AS (SELECT both_right, a_only, b_only, both_wrong,
                   CASE WHEN a_only + b_only = 0 THEN 0.0
                        ELSE CAST(greatest(abs(a_only - b_only) - 1, 0)
                                  * greatest(abs(a_only - b_only) - 1, 0) AS DOUBLE)
                             / CAST(a_only + b_only AS DOUBLE) END AS chi2
            FROM cells)
      SELECT both_right, a_only, b_only, both_wrong, chi2,
             (chi2 > 3.841458820694124) AS significant
      FROM s""")
  ) { (spark, dir) =>
    import spark.implicits._
    val d = t(spark, dir).documents.select(
      ($"lang" === "en").as("truth"),
      ($"n_chars" > 300).as("pred_a"),
      (size(split($"text", " ")) > 45).as("pred_b"))
    val cells = d.agg(
      sum(when($"pred_a" === $"truth" && $"pred_b" === $"truth", 1L).otherwise(0L)).as("both_right"),
      sum(when($"pred_a" === $"truth" && $"pred_b" =!= $"truth", 1L).otherwise(0L)).as("a_only"),
      sum(when($"pred_a" =!= $"truth" && $"pred_b" === $"truth", 1L).otherwise(0L)).as("b_only"),
      sum(when($"pred_a" =!= $"truth" && $"pred_b" =!= $"truth", 1L).otherwise(0L)).as("both_wrong"))
    val s = cells.select($"both_right", $"a_only", $"b_only", $"both_wrong",
      when($"a_only" + $"b_only" === 0, 0.0)
        .otherwise((greatest(abs($"a_only" - $"b_only") - 1, lit(0L))
          * greatest(abs($"a_only" - $"b_only") - 1, lit(0L))).cast("double")
          / ($"a_only" + $"b_only").cast("double")).as("chi2"))
    s.select($"both_right", $"a_only", $"b_only", $"both_wrong", $"chi2",
      ($"chi2" > 3.841458820694124).as("significant"))
  }

  /** Benjamini–Hochberg FDR over a family of permutation tests: each
    * non-control event_type is tested against the 'view' control (mean
    * value shift, 32 md5-derived permutation replicates — the
    * q_stat_permutation recipe), then the m p-values pass the BH step-up
    * at q = 0.05 — the multiple-testing correction any segment-sweep
    * ("which cohorts moved?") needs before acting on per-test p's. The
    * plant-and-detect calibration (HotCliqueStress philosophy): the
    * purchase group carries a deterministic +15 shift, so the pipeline
    * must reject exactly the planted effect while the null groups ride
    * the uniform p grid.
    *
    * Portability: p-values are exact rationals (n_exceed/32) and the BH
    * gate is the INTEGER cross-multiplication n_exceed·m·20 ≤ 32·rank
    * (q = 1/20) — no p-value division is ever compared. Scale shape: the
    * replicate fan-out is 32× row-local (bootstrap class); each test's
    * rows are its group + the shared control (the control replicates m×,
    * m = |groups| − 1, a schema constant); the BH ranking runs on the
    * m-row p-value table (bounded window, see PlanSpec allowlist).
    */
  val qFdrBh: GQuery = GQuery(
    "q_stat_fdr_bh",
    Some("""
      WITH d AS (SELECT event_id, event_type AS g,
                        value + CASE WHEN event_type = 'purchase' THEN 15.0 ELSE 0.0 END AS v
                 FROM events),
      ctrl AS (SELECT event_id, v FROM d WHERE g = 'view'),
      nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS nc FROM ctrl),
      grps AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng FROM d WHERE g <> 'view' GROUP BY 1),
      mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM grps),
      pool AS (
        SELECT g, ng, event_id, v, TRUE AS in_g
        FROM d JOIN grps USING (g)
        UNION ALL
        SELECT s.g, s.ng, c.event_id, c.v, FALSE
        FROM ctrl c CROSS JOIN grps s),
      fan AS (
        SELECT p.g, p.ng, p.event_id, p.v, p.in_g, b.b,
               ((('0x' || substr(md5(CAST(p.event_id AS VARCHAR) || ':' || p.g || ':'
                                || CAST(b.b AS VARCHAR) || ':37'), 1, 8))::UBIGINT
                 % (p.ng + nc.nc)) < p.ng) AS pg
        FROM pool p CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) b CROSS JOIN nc),
      obs AS (
        SELECT g,
               CAST(SUM(CAST(CASE WHEN in_g THEN v END AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(SUM(CASE WHEN in_g THEN 1 ELSE 0 END) AS DOUBLE)
             - CAST(SUM(CAST(CASE WHEN NOT in_g THEN v END AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(SUM(CASE WHEN NOT in_g THEN 1 ELSE 0 END) AS DOUBLE) AS diff_obs
        FROM fan WHERE b = 0 GROUP BY g),
      reps AS (
        SELECT g, b,
               CAST(SUM(CAST(CASE WHEN pg THEN v END AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(SUM(CASE WHEN pg THEN 1 ELSE 0 END) AS DOUBLE)
             - CAST(SUM(CAST(CASE WHEN NOT pg THEN v END AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(SUM(CASE WHEN NOT pg THEN 1 ELSE 0 END) AS DOUBLE) AS diff_b
        FROM fan GROUP BY g, b),
      pv AS (
        SELECT o.g, CAST(SUM(CASE WHEN round(abs(r.diff_b), 6) >= round(abs(o.diff_obs), 6)
                                  THEN 1 ELSE 0 END) AS BIGINT) AS n_exceed
        FROM obs o JOIN reps r ON o.g = r.g GROUP BY o.g),
      rk AS (
        SELECT pv.g, pv.n_exceed,
               CAST(row_number() OVER (ORDER BY pv.n_exceed, pv.g) AS BIGINT) AS rank
        FROM pv),
      thr AS (
        SELECT COALESCE(MAX(rk.rank), 0) AS kstar
        FROM rk CROSS JOIN mm WHERE rk.n_exceed * mm.m * 20 <= rk.rank * 32)
      SELECT rk.g AS grp, rk.n_exceed,
             CAST(rk.n_exceed AS DOUBLE) / 32.0 AS p_value, rk.rank,
             (rk.rank <= thr.kstar) AS rejected
      FROM rk CROSS JOIN thr ORDER BY rank, grp""")
  ) { (spark, dir) =>
    import spark.implicits._
    val D6 = Common.D
    val d = t(spark, dir).events.select(
      $"event_id", $"event_type".as("g"),
      ($"value" + when($"event_type" === "purchase", 15.0).otherwise(0.0)).as("v"))
    val ctrl = d.filter($"g" === "view").select($"event_id", $"v").ckptLazy()
    val nc = ctrl.count()
    val grps = d.filter($"g" =!= "view").groupBy($"g").agg(count(lit(1)).as("ng"))
    val pool = d.filter($"g" =!= "view").join(broadcast(grps), "g")
      .select($"g", $"ng", $"event_id", $"v", lit(true).as("in_g"))
      .unionByName(ctrl.crossJoin(broadcast(grps))
        .select($"g", $"ng", $"event_id", $"v", lit(false).as("in_g")))
    val fan = pool
      .select($"g", $"ng", $"event_id", $"v", $"in_g",
        explode(sequence(lit(0), lit(31))).as("b"))
      .withColumn("pg",
        conv(substring(md5(concat($"event_id".cast("string"), lit(":"), $"g", lit(":"),
          $"b".cast("string"), lit(":37"))), 1, 8), 16, 10).cast("long")
          % ($"ng" + nc) < $"ng")
    def mdiff(flag: Column) =
      sum(when(flag, $"v").cast(D6)).cast("double") /
        sum(when(flag, 1L).otherwise(0L)).cast("double") -
        sum(when(!flag, $"v").cast(D6)).cast("double") /
          sum(when(!flag, 1L).otherwise(0L)).cast("double")
    // obs ≡ fan WHERE b = 0 grouped on in_g: the replicate index b never
    // feeds the observed diff (only pg uses it), so aggregate the
    // UN-exploded pool directly — same rows, same flags, same sums, one
    // fewer 32× explode pass over (pool + m×control) (guide §1.2: don't
    // compute things you throw away). The oracle keeps the WHERE b = 0
    // formulation; the hash gate proves the equivalence.
    val obs = pool.groupBy($"g").agg(mdiff($"in_g").as("diff_obs"))
    val reps = fan.groupBy($"g", $"b").agg(mdiff($"pg").as("diff_b"))
    val pv = obs.join(reps, "g")
      .groupBy($"g")
      .agg(sum(when(round(abs($"diff_b"), 6) >= round(abs($"diff_obs"), 6), 1L).otherwise(0L))
        .as("n_exceed"))
    val m = grps.count()
    val wRank = Window.orderBy($"n_exceed", $"g") // bounded: m = |groups|-1 tests
    val rk = pv.withColumn("rank", row_number().over(wRank).cast("long"))
    val kstar = rk.filter($"n_exceed" * m * 20 <= $"rank" * 32)
      .agg(coalesce(max($"rank"), lit(0L)).as("kstar"))
    rk.crossJoin(broadcast(kstar))
      .select($"g".as("grp"), $"n_exceed",
        ($"n_exceed".cast("double") / 32.0).as("p_value"), $"rank",
        ($"rank" <= $"kstar").as("rejected"))
      .orderBy($"rank", $"grp")
  }

  /** Benford first-significant-digit audit of o_totalprice — the
    * classic fabricated/synthetic-data screen: organically-grown
    * magnitudes follow P(d) = log10(1 + 1/d); generator artifacts and
    * fraud concentrate digits. One scan into nine groups, left-joined to
    * the full 1–9 digit spine so missing digits report honest zeros.
    *
    * Portability: the first digit comes from the INTEGER part's string
    * (floor → BIGINT → VARCHAR → first char — never double→string, whose
    * shortest-round-trip formatting is engine-specific); the log10
    * expectations are computed ONCE in the driver JVM and fed to both
    * engines as literals (TextOps.ndcgWeights convention, `e0`-suffixed
    * on the DuckDB side so a 16-digit literal can't parse as DECIMAL).
    * Each chi term is one fixed `+ − × ÷` IEEE chain over exact integers
    * and those shared literals — emitted RAW (PARITY rounding
    * convention); the chi-square TOTAL is summed as floor(1e6·x + 0.5)
    * micro-units, the integer-quantization pattern that makes an
    * unordered sum of arbitrary doubles exact.
    */
  val qBenford: GQuery = {
    val probs = (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))
    val valuesSql = probs
      .map { case (d, p) => s"($d, ${p}e0)" }
      .mkString(", ")
    GQuery(
      "q_stat_benford",
      Some(s"""
      WITH d AS (SELECT * FROM (VALUES $valuesSql) AS t(digit, p_expected)),
      o AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                        AS INT) AS digit
            FROM orders),
      c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM o GROUP BY 1),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM o),
      f AS (SELECT d.digit, COALESCE(c.n_obs, 0) AS n_obs, d.p_expected,
                   CAST(nn.n AS DOUBLE) * d.p_expected AS expected
            FROM d LEFT JOIN c USING (digit), nn),
      g AS (SELECT digit, n_obs, p_expected, expected,
                   (CAST(n_obs AS DOUBLE) - expected) * (CAST(n_obs AS DOUBLE) - expected)
                     / expected AS chi_term
            FROM f),
      h AS (SELECT *, CAST(floor(chi_term * 1e6 + 0.5) AS BIGINT) AS chi_term_micro FROM g),
      tot AS (SELECT CAST(SUM(chi_term_micro) AS BIGINT) AS chi2_total_micro FROM h)
      SELECT digit, n_obs, p_expected, expected, chi_term, chi_term_micro,
             tot.chi2_total_micro
      FROM h, tot ORDER BY digit""")
    ) { (spark, dir) =>
      import spark.implicits._
      val spine = probs.toDF("digit", "p_expected")
      val o = t(spark, dir).orders
        .select(substring(floor($"o_totalprice").cast("string"), 1, 1)
          .cast("int").as("digit"))
      val c = o.groupBy($"digit").agg(count(lit(1)).as("n_obs"))
      val nn = o.agg(count(lit(1)).as("n"))
      val g = broadcast(spine)
        .join(c, Seq("digit"), "left")
        .na.fill(0L, Seq("n_obs"))
        .crossJoin(broadcast(nn))
        .select($"digit", $"n_obs", $"p_expected",
          ($"n".cast("double") * $"p_expected").as("expected"))
        .select($"digit", $"n_obs", $"p_expected", $"expected",
          (($"n_obs".cast("double") - $"expected")
            * ($"n_obs".cast("double") - $"expected") / $"expected").as("chi_term"))
        .withColumn("chi_term_micro",
          floor($"chi_term" * 1e6 + 0.5).cast("long"))
      val tot = g.agg(sum($"chi_term_micro").as("chi2_total_micro"))
      g.crossJoin(broadcast(tot)).orderBy($"digit")
    }
  }

  /** Mutual-information feature ranking — I(X; status) in nats for three
    * candidate features of orders (priority, order month, 50k price
    * band), the model-free feature-selection screen that [[qCramersV]]'s
    * effect size complements. One union-shaped scan builds the generic
    * (feature, x, y) table; each feature's MI is Σ (n_xy/n)·
    * ln(n·n_xy/(n_x·n_y)) over its contingency cells.
    *
    * Portability: every count is an exact BIGINT; each cell term is one
    * fixed `×÷` IEEE chain into `ln`, and the ONLY cross-row float sum is
    * DECIMAL(38,6)-pinned (order-insensitive) — the q_profile_entropy
    * convention, boundary-audited by tools/round_boundary_audit.py.
    * Scale shape: one fact-table shuffle per feature to the contingency
    * cells (map-side partial agg); marginals and MI run on cell counts,
    * so cost is O(distinct cells), not rows.
    */
  val qMutualInfo: GQuery = GQuery(
    "q_stat_mutual_info",
    Some("""
      WITH f AS (
        SELECT 'priority' AS feature, o_orderpriority AS x, o_orderstatus AS y FROM orders
        UNION ALL
        SELECT 'month', CAST(month(o_orderdate) AS VARCHAR), o_orderstatus FROM orders
        UNION ALL
        SELECT 'price_band', CAST(CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS VARCHAR),
               o_orderstatus FROM orders),
      xy AS (SELECT feature, x, y, CAST(COUNT(*) AS BIGINT) AS n_xy FROM f GROUP BY 1, 2, 3),
      mx AS (SELECT feature, x, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM xy GROUP BY 1, 2),
      my AS (SELECT feature, y, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM xy GROUP BY 1, 2),
      nn AS (SELECT feature, CAST(SUM(n_xy) AS BIGINT) AS n FROM xy GROUP BY 1),
      terms AS (
        SELECT xy.feature,
               (CAST(xy.n_xy AS DOUBLE) / CAST(nn.n AS DOUBLE))
                 * ln(CAST(xy.n_xy AS DOUBLE) * CAST(nn.n AS DOUBLE)
                      / (CAST(mx.n_x AS DOUBLE) * CAST(my.n_y AS DOUBLE))) AS term
        FROM xy
        JOIN mx ON mx.feature = xy.feature AND mx.x = xy.x
        JOIN my ON my.feature = xy.feature AND my.y = xy.y
        JOIN nn ON nn.feature = xy.feature)
      SELECT t.feature,
             CAST(COUNT(*) AS BIGINT) AS n_cells,
             ANY_VALUE(nn.n) AS n_rows,
             CAST(SUM(CAST(t.term AS DECIMAL(38,6))) AS DOUBLE) AS mi_nats
      FROM terms t JOIN nn ON nn.feature = t.feature
      GROUP BY t.feature ORDER BY t.feature""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.queries.Common.D
    val o = t(spark, dir).orders
    val f = o.select(lit("priority").as("feature"), $"o_orderpriority".as("x"),
        $"o_orderstatus".as("y"))
      .unionAll(o.select(lit("month").as("feature"),
        month($"o_orderdate").cast("string").as("x"), $"o_orderstatus".as("y")))
      .unionAll(o.select(lit("price_band").as("feature"),
        floor($"o_totalprice" / 50000.0).cast("long").cast("string").as("x"),
        $"o_orderstatus".as("y")))
    val xy = f.groupBy($"feature", $"x", $"y").agg(count(lit(1)).as("n_xy"))
      .ckptLazy() // feeds marginals + terms
    val mx = xy.groupBy($"feature", $"x").agg(sum($"n_xy").as("n_x"))
    val my = xy.groupBy($"feature", $"y").agg(sum($"n_xy").as("n_y"))
    val nn = xy.groupBy($"feature").agg(sum($"n_xy").as("n"))
    xy.join(mx, Seq("feature", "x"))
      .join(my, Seq("feature", "y"))
      .join(broadcast(nn), Seq("feature"))
      .select($"feature", $"n",
        (($"n_xy".cast("double") / $"n".cast("double"))
          * log($"n_xy".cast("double") * $"n".cast("double")
            / ($"n_x".cast("double") * $"n_y".cast("double")))).as("term"))
      .groupBy($"feature")
      .agg(count(lit(1)).as("n_cells"), first($"n").as("n_rows"),
        sum($"term".cast(D)).cast("double").as("mi_nats"))
      .orderBy($"feature")
  }

  /** Stratified treatment-effect estimate (IPTW-lite): the order-month
    * strata adjust the URGENT-priority "treatment" effect on totalprice —
    * ATT = Σ_s w_s·(mean_T,s − mean_C,s) with w_s = treated-count share,
    * the confounder-adjusted contrast a naive global mean difference
    * gets wrong when treatment assignment correlates with the stratum
    * (the observational-data replacement for [[qAbTest]]'s randomized
    * contrast). Strata lacking either arm are excluded and REPORTED
    * (n_excluded_strata), not silently dropped into the estimate.
    *
    * Portability: per-stratum means are DECIMAL(38,6)-pinned sums over
    * short-decimal prices divided once (exact, order-insensitive); each
    * stratum's weighted effect is a fixed IEEE chain on those identical
    * doubles, micro-quantized (floor(1e6·x + 0.5) of engine-identical
    * inputs) so the cross-stratum sum is an exact integer. Scale shape:
    * one fact shuffle to (stratum, arm) cells; everything after runs on
    * ≤ 12·2 rows.
    */
  val qStratifiedEffect: GQuery = GQuery(
    "q_stat_stratified_effect",
    Some("""
      WITH o AS (
        SELECT month(o_orderdate) AS stratum,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS treated,
               o_totalprice AS y
        FROM orders),
      cell AS (
        SELECT stratum, treated, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_y
        FROM o GROUP BY 1, 2),
      s AS (
        SELECT t.stratum, t.n AS n_treated, c.n AS n_control,
               t.mean_y - c.mean_y AS effect
        FROM cell t JOIN cell c ON c.stratum = t.stratum
        WHERE t.treated = 1 AND c.treated = 0),
      tt AS (SELECT CAST(SUM(n_treated) AS BIGINT) AS total_treated FROM s),
      q AS (
        SELECT s.stratum, s.n_treated, s.n_control, s.effect,
               CAST(floor(s.effect * (CAST(s.n_treated AS DOUBLE) / CAST(tt.total_treated AS DOUBLE))
                          * 1e6 + 0.5) AS BIGINT) AS w_effect_micro
        FROM s, tt),
      excl AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_excluded_strata
        FROM (SELECT stratum FROM cell GROUP BY 1 HAVING COUNT(*) < 2)),
      att AS (SELECT CAST(SUM(w_effect_micro) AS BIGINT) AS att_micro FROM q)
      SELECT q.stratum, q.n_treated, q.n_control, q.effect, q.w_effect_micro,
             att.att_micro, excl.n_excluded_strata
      FROM q, att, excl
      ORDER BY q.stratum""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.queries.Common.D
    val o = t(spark, dir).orders
      .select(month($"o_orderdate").as("stratum"),
        when($"o_orderpriority" === "1-URGENT", 1).otherwise(0).as("treated"),
        $"o_totalprice".as("y"))
    val cell = o.groupBy($"stratum", $"treated")
      .agg(count(lit(1)).as("n"),
        (sum($"y".cast(D)).cast("double") / count(lit(1)).cast("double")).as("mean_y"))
      .ckptLazy() // feeds the arm join + the exclusion census
    val s = cell.filter($"treated" === 1)
      .select($"stratum", $"n".as("n_treated"), $"mean_y".as("mt"))
      .join(cell.filter($"treated" === 0)
        .select($"stratum", $"n".as("n_control"), $"mean_y".as("mc")), Seq("stratum"))
      .select($"stratum", $"n_treated", $"n_control", ($"mt" - $"mc").as("effect"))
    val tt = s.agg(sum($"n_treated").as("total_treated"))
    val q = s.crossJoin(broadcast(tt))
      .select($"stratum", $"n_treated", $"n_control", $"effect",
        floor($"effect" * ($"n_treated".cast("double") / $"total_treated".cast("double"))
          * 1e6 + 0.5).cast("long").as("w_effect_micro"))
    val excl = cell.groupBy($"stratum").agg(count(lit(1)).as("n_arms"))
      .agg(coalesce(sum(when($"n_arms" < 2, 1L).otherwise(0L)), lit(0L))
        .as("n_excluded_strata"))
    val att = q.agg(sum($"w_effect_micro").as("att_micro"))
    q.crossJoin(broadcast(att)).crossJoin(broadcast(excl))
      .orderBy($"stratum")
  }

  /** Quantile normalization of event values onto the POOLED reference
    * distribution — every group's rank-r value maps to the pooled order
    * statistic at the matching relative position k = ((2r−1)·N) div
    * (2·n_g) + 1 (the midpoint rule; all-`div` integer rank math), the
    * cross-group distribution equalizer behind batch-effect removal —
    * [[qWinsorize]] rescales moments, this replaces the SHAPE. Exact by
    * construction: every normalized value IS a pooled data value (no
    * float interpolation at all), so the per-type roll-up (DECIMAL-
    * pinned sums of original vs normalized mass, min/max, distinct
    * support) hash-matches bit-for-bit.
    *
    * Scale shape: BOTH rank tables come from the range-partitioned
    * two-pass prefix scan (per-type ranks via the composite (type,
    * value) order + contiguous-group offsets, pooled ranks via the
    * value order) — never a per-type `Window.orderBy` funnel; the
    * rank→value mapping explodes each distinct value's count range
    * once (linear) and resolves through ONE integer-keyed equi-join.
    * The oracle replays ranks as partitioned windows (its replay scale
    * is the test SF).
    */
  val qQuantileNorm: GQuery = GQuery(
    "q_norm_quantile",
    Some("""
      WITH ev AS (SELECT event_type AS typ, value AS v FROM events),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM ev),
      gv AS MATERIALIZED (
        SELECT typ, v, CAST(COUNT(*) AS BIGINT) AS cnt FROM ev GROUP BY 1, 2),
      sc AS MATERIALIZED (
        SELECT typ, v, cnt,
               CAST(SUM(cnt) OVER (PARTITION BY typ ORDER BY v) AS BIGINT) AS cum
        FROM gv),
      tt AS (SELECT typ, CAST(SUM(cnt) AS BIGINT) AS n_g FROM gv GROUP BY 1),
      ranks AS MATERIALIZED (
        SELECT sc.typ, sc.v, ((2 * g.r - 1) * tot.nn) // (2 * tt.n_g) + 1 AS k
        FROM sc JOIN tt ON tt.typ = sc.typ, tot,
             LATERAL (SELECT unnest(generate_series(sc.cum - sc.cnt + 1, sc.cum)) AS r) g),
      pv AS MATERIALIZED (
        SELECT v AS pvv, CAST(COUNT(*) AS BIGINT) AS gcnt FROM ev GROUP BY 1),
      psc AS MATERIALIZED (
        SELECT pvv, gcnt, CAST(SUM(gcnt) OVER (ORDER BY pvv) AS BIGINT) AS gcum FROM pv),
      pooled AS MATERIALIZED (
        SELECT pvv AS norm_v, g.k
        FROM psc, LATERAL (SELECT unnest(generate_series(gcum - gcnt + 1, gcum)) AS k) g),
      j AS (SELECT r.typ, r.v, p.norm_v FROM ranks r JOIN pooled p ON p.k = r.k)
      SELECT typ AS event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
             CAST(SUM(CAST(norm_v AS DECIMAL(38,6))) AS DOUBLE) AS sum_norm,
             MIN(norm_v) AS min_norm, MAX(norm_v) AS max_norm,
             CAST(COUNT(DISTINCT norm_v) AS BIGINT) AS n_distinct_norm
      FROM j GROUP BY 1 ORDER BY event_type""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.queries.Common.dsum
    val ev = t(spark, dir).events.select($"event_type".as("typ"), $"value".as("v"))
    val tot = ev.agg(count(lit(1)).as("nn"))
    val gv = ev.groupBy($"typ", $"v").agg(count(lit(1)).as("cnt"))
    val sc = graft.operators.Sampling
      .prefixSumsBy(gv, Seq(col("typ"), col("v")), Seq("cnt"))
    // groups are contiguous in the composite scan: per-type offset =
    // group-end cumulative minus the group's own total (no window)
    val tt = sc.groupBy($"typ")
      .agg(sum($"cnt").as("n_g"), max($"cum_cnt").as("grp_end"))
      .select($"typ", $"n_g", ($"grp_end" - $"n_g").as("off"))
    val ranks = sc.join(broadcast(tt), Seq("typ"))
      .select($"typ", $"v", $"n_g",
        explode(sequence($"cum_cnt" - $"off" - $"cnt" + 1, $"cum_cnt" - $"off")).as("r"))
      .crossJoin(broadcast(tot))
      .select($"typ", $"v", expr("((2 * r - 1) * nn) div (2 * n_g) + 1").as("k"))
    val pv = ev.groupBy($"v".as("pvv")).agg(count(lit(1)).as("gcnt"))
    val pooled = graft.operators.Sampling
      .prefixSumsBy(pv, Seq(col("pvv")), Seq("gcnt"))
      .select($"pvv".as("norm_v"),
        explode(sequence($"cum_gcnt" - $"gcnt" + 1, $"cum_gcnt")).as("k"))
    ranks.join(pooled, Seq("k"))
      .groupBy($"typ".as("event_type"))
      .agg(count(lit(1)).as("n"),
        dsum($"v").as("sum_value"),
        dsum($"norm_v").as("sum_norm"),
        min($"norm_v").as("min_norm"), max($"norm_v").as("max_norm"),
        countDistinct($"norm_v").as("n_distinct_norm"))
      .orderBy($"event_type")
  }

  /** Brown–Forsythe test for equality of variances across event types
    * (Levene's W with MEDIAN centers — the robust default): z = |value −
    * group median|, W = ((N−k)/(k−1))·SSB(z)/SSW(z). The
    * heteroscedasticity gate that [[qAbTest]]-style mean contrasts and
    * pooled-variance tests silently assume away.
    *
    * Portability: group medians use the shared percentile convention
    * (qMad); z quantizes ONCE to deci-units (floor of engine-identical
    * doubles), making n/S=Σz/Q=Σz² exact BIGINTs (|z| ≤ 1e4 deci keeps
    * S² < 2^63 up to ~1e9 rows/group; larger corpora coarsen the
    * quantum); each group's SSB/SSW double terms are floor-quantized to
    * integers before the cross-group sum (5 terms — unordered double
    * sums are not portable), and W is one closing chain over exact
    * integers. Scale shape: one fact shuffle for medians, one for the
    * (type) moments; everything after runs on k rows.
    */
  val qLevene: GQuery = GQuery(
    "q_stat_levene",
    Some("""
      WITH med AS (
        SELECT event_type AS typ, CAST(quantile_cont(value, 0.5) AS DOUBLE) AS med
        FROM events GROUP BY 1),
      z AS (
        SELECT e.event_type AS typ,
               CAST(floor(abs(e.value - m.med) * 10 + 0.5) AS BIGINT) AS zq
        FROM events e JOIN med m ON m.typ = e.event_type),
      g AS (
        SELECT typ, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(zq) AS BIGINT) AS s, CAST(SUM(zq * zq) AS BIGINT) AS q
        FROM z GROUP BY 1),
      tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(s) AS BIGINT) AS st
        FROM g),
      terms AS (
        SELECT g.typ, g.n, g.s, g.q,
               CAST(floor(CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)
                          / CAST(g.n AS DOUBLE) + 0.5) AS BIGINT) AS bterm,
               CAST(floor(CAST(g.q AS DOUBLE)
                          - CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)
                            / CAST(g.n AS DOUBLE) + 0.5) AS BIGINT) AS wterm
        FROM g),
      w AS (
        SELECT CAST(SUM(bterm) AS BIGINT) AS sb_raw,
               CAST(SUM(wterm) AS BIGINT) AS ssw
        FROM terms)
      SELECT t.typ AS event_type, t.n, t.s AS sum_z_deci, t.q AS sum_z2_deci,
             CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE) AS mean_z_deci,
             (CAST(w.sb_raw AS DOUBLE)
              - CAST(tot.st AS DOUBLE) * CAST(tot.st AS DOUBLE) / CAST(tot.nn AS DOUBLE))
               * CAST(tot.nn - tot.k AS DOUBLE)
               / (CAST(tot.k - 1 AS DOUBLE) * CAST(w.ssw AS DOUBLE)) AS w_stat,
             tot.k - 1 AS df1, tot.nn - tot.k AS df2
      FROM terms t, tot, w
      ORDER BY event_type""")
  ) { (spark, dir) =>
    import spark.implicits._
    val ev = t(spark, dir).events.select($"event_type".as("typ"), $"value")
    val med = ev.groupBy($"typ").agg(percentile($"value", lit(0.5)).as("med"))
    val z = ev.join(broadcast(med), Seq("typ"))
      .select($"typ", floor(abs($"value" - $"med") * 10 + 0.5).cast("long").as("zq"))
    val g = z.groupBy($"typ")
      .agg(count(lit(1)).as("n"), sum($"zq").as("s"), sum($"zq" * $"zq").as("q"))
      .ckptLazy() // feeds totals, terms and the output join
    val tot = g.agg(sum($"n").as("nn"), count(lit(1)).as("k"), sum($"s").as("st"))
    val terms = g.select($"typ", $"n", $"s", $"q",
      floor($"s".cast("double") * $"s".cast("double") / $"n".cast("double") + 0.5)
        .cast("long").as("bterm"),
      floor($"q".cast("double")
        - $"s".cast("double") * $"s".cast("double") / $"n".cast("double") + 0.5)
        .cast("long").as("wterm"))
    val w = terms.agg(sum($"bterm").as("sb_raw"), sum($"wterm").as("ssw"))
    terms.crossJoin(broadcast(tot)).crossJoin(broadcast(w))
      .select($"typ".as("event_type"), $"n", $"s".as("sum_z_deci"),
        $"q".as("sum_z2_deci"),
        ($"s".cast("double") / $"n".cast("double")).as("mean_z_deci"),
        (($"sb_raw".cast("double")
          - $"st".cast("double") * $"st".cast("double") / $"nn".cast("double"))
          * ($"nn" - $"k").cast("double")
          / (($"k" - 1).cast("double") * $"ssw".cast("double"))).as("w_stat"),
        ($"k" - 1).as("df1"), ($"nn" - $"k").as("df2"))
      .orderBy($"event_type")
  }

  /** Functional-dependency discovery over the orders schema — the
    * data-profiling pass (TANE/FDEP tier 1) that finds which columns
    * DETERMINE which: A→B holds iff |distinct A| = |distinct (A,B)|.
    * All 20 ordered column pairs of 5 columns are checked and reported
    * with their violation headroom (n_pairs − n_lhs = how many extra
    * (A,B) combinations break determination) — the schema-inference
    * signal a lake catalog runs before declaring candidate keys.
    *
    * Scale shape: one distinct-pair aggregation per column pair over a
    * SCHEMA-bounded pair set (20, a constant) — each is a map-side
    * combinable groupBy, corpus-linear, unioned after aggregation (the
    * union carries 20 one-row inputs, not corpus rows). Multi-column
    * COUNT DISTINCT is computed per-pair as count over a distinct
    * subplan — never the row-multiplying Expand of a multi-distinct
    * aggregate (CLAUDE.md). All-integer output: exact.
    */
  val qFd: GQuery = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate")
    val pairs = for { a <- cols; b <- cols if a != b } yield (a, b)
    GQuery(
      "q_profile_fd",
      Some(pairs.map { case (a, b) =>
        s"""SELECT '$a' AS lhs, '$b' AS rhs,
               CAST(COUNT(DISTINCT $a) AS BIGINT) AS n_lhs,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               COUNT(DISTINCT $a) = COUNT(*) AS fd_holds
            FROM (SELECT DISTINCT $a, $b FROM orders)"""
      }.mkString("", " UNION ALL ", " ORDER BY lhs, rhs"))
    ) { (spark, dir) =>
      import spark.implicits._
      val orders = t(spark, dir).orders
      // Examined round 13 and deliberately KEPT the 20-subtree union: a
      // single-pass rewrite (one scan exploding 20 value-pair probes per
      // row → one distinct → one grouped countDistinct) measured 1.7×
      // SLOWER at sf0.1 (4.5 → 7.7 s, StageProf) because the exploding
      // scan stage ran as ONE task (one input split) writing 55 MB of
      // shuffle, while the 20 independent subtrees scan in parallel
      // across idle cores — and at 100 TB the rewrite trades 20
      // column-pruned storage-local scans for a full-width network
      // shuffle of 20× the row count, the wrong direction (guide §2.3).
      pairs.map { case (a, b) =>
        orders.select(col(a).as("lv"), col(b).as("rv")).distinct()
          .agg(countDistinct($"lv").as("n_lhs"), count(lit(1)).as("n_pairs"))
          .select(lit(a).as("lhs"), lit(b).as("rhs"), $"n_lhs", $"n_pairs",
            ($"n_lhs" === $"n_pairs").as("fd_holds"))
      }.reduce(_ unionAll _).orderBy($"lhs", $"rhs")
    }
  }

  /** Krippendorff's alpha (nominal, 3 raters) over the shared
    * deterministic quality-rater fixture — the IAA measure that
    * generalizes [[qCohenKappa]]/[[qFleissKappa]]: chance correction
    * from the OBSERVED category marginals (not per-rater), so it stays
    * comparable under missing data and rater count changes (the reason
    * annotation-ops standardized on it). α = 1 − D_o/D_e with
    * D_o = Σ_u Σ_c n_uc(m−n_uc) / (N·m·(m−1)) and
    * D_e = Σ_c n_c(n_tot−n_c) / (n_tot(n_tot−1)).
    *
    * Portability: every numerator/denominator is an exact BIGINT off
    * the same integer rating counts the kappa queries use; α is one
    * fixed ÷− chain of their DOUBLE casts — RAW, no rounding.
    */
  val qKrippendorff: GQuery = GQuery(
    "q_stat_krippendorff",
    Some(s"""
      WITH $ratersSql,
      cnt AS (
        SELECT doc_id,
               CAST((CASE WHEN ra=0 THEN 1 ELSE 0 END) + (CASE WHEN rb=0 THEN 1 ELSE 0 END)
                    + (CASE WHEN rc=0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST((CASE WHEN ra=1 THEN 1 ELSE 0 END) + (CASE WHEN rb=1 THEN 1 ELSE 0 END)
                    + (CASE WHEN rc=1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST((CASE WHEN ra=2 THEN 1 ELSE 0 END) + (CASE WHEN rb=2 THEN 1 ELSE 0 END)
                    + (CASE WHEN rc=2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        FROM rt),
      agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n0*(3-n0) + n1*(3-n1) + n2*(3-n2)) AS BIGINT) AS do_num,
               CAST(SUM(n0) AS BIGINT) AS c0, CAST(SUM(n1) AS BIGINT) AS c1,
               CAST(SUM(n2) AS BIGINT) AS c2
        FROM cnt)
      SELECT n_docs, do_num,
             c0*(3*n_docs - c0) + c1*(3*n_docs - c1) + c2*(3*n_docs - c2) AS de_num,
             CAST(do_num AS DOUBLE) / CAST(n_docs * 6 AS DOUBLE) AS d_o,
             CAST(c0*(3*n_docs - c0) + c1*(3*n_docs - c1) + c2*(3*n_docs - c2) AS DOUBLE)
               / CAST(3*n_docs*(3*n_docs - 1) AS DOUBLE) AS d_e,
             1e0 - (CAST(do_num AS DOUBLE) / CAST(n_docs * 6 AS DOUBLE))
                   / (CAST(c0*(3*n_docs - c0) + c1*(3*n_docs - c1) + c2*(3*n_docs - c2) AS DOUBLE)
                      / CAST(3*n_docs*(3*n_docs - 1) AS DOUBLE)) AS alpha
      FROM agg""")
  ) { (spark, dir) =>
    import spark.implicits._
    def ind(c: org.apache.spark.sql.Column, v: Int) = when(c === v, 1L).otherwise(0L)
    val cnt = raters(spark, dir).select(
      (ind($"ra", 0) + ind($"rb", 0) + ind($"rc", 0)).as("n0"),
      (ind($"ra", 1) + ind($"rb", 1) + ind($"rc", 1)).as("n1"),
      (ind($"ra", 2) + ind($"rb", 2) + ind($"rc", 2)).as("n2"))
    val agg = cnt.agg(
      count(lit(1)).as("n_docs"),
      sum($"n0" * (lit(3L) - $"n0") + $"n1" * (lit(3L) - $"n1")
        + $"n2" * (lit(3L) - $"n2")).as("do_num"),
      sum($"n0").as("c0"), sum($"n1").as("c1"), sum($"n2").as("c2"))
    val deNum = $"c0" * (lit(3L) * $"n_docs" - $"c0") +
      $"c1" * (lit(3L) * $"n_docs" - $"c1") +
      $"c2" * (lit(3L) * $"n_docs" - $"c2")
    val dO = $"do_num".cast("double") / ($"n_docs" * 6).cast("double")
    val dE = deNum.cast("double") /
      (lit(3L) * $"n_docs" * (lit(3L) * $"n_docs" - 1)).cast("double")
    agg.select($"n_docs", $"do_num", deNum.as("de_num"),
      dO.as("d_o"), dE.as("d_e"), (lit(1.0) - dO / dE).as("alpha"))
  }

  /** Population stability index between the even- and odd-user halves
    * of the events value distribution — the model-monitoring drift
    * number (banking-standard: PSI < 0.1 stable, > 0.25 shifted) that
    * complements [[qKsTest]]'s supremum statistic with a per-bin
    * decomposition: 10 fixed value bins, add-1 smoothed shares,
    * PSI = Σ (p_ref − p_cur)·ln(p_ref/p_cur).
    *
    * Portability: counts are exact BIGINTs; each share is ONE division
    * of exact integers; the per-bin ln term follows the
    * q_stat_mutual_info convention — DECIMAL(38,6)-pinned before the
    * order-insensitive sum (margins audited by round_boundary_audit).
    * Scale shape: one corpus aggregation to 10 bins; everything after
    * is constant-size.
    */
  val qPsi: GQuery = GQuery(
    "q_quality_psi",
    Some("""
      WITH b AS (
        SELECT least(CAST(floor(value / 25e0) AS BIGINT), 9) AS bin,
               user_id % 2 AS half, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
      spine AS (SELECT unnest(generate_series(0, 9)) AS bin),
      f AS (
        SELECT s.bin,
               COALESCE(r.n, 0) AS n_ref, COALESCE(c.n, 0) AS n_cur
        FROM spine s
        LEFT JOIN b r ON r.bin = s.bin AND r.half = 0
        LEFT JOIN b c ON c.bin = s.bin AND c.half = 1),
      tot AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
                     CAST(SUM(n_cur) AS BIGINT) AS t_cur FROM f),
      terms AS (
        SELECT f.bin, f.n_ref, f.n_cur,
               CAST(f.n_ref + 1 AS DOUBLE) / CAST(t.t_ref + 10 AS DOUBLE) AS p_ref,
               CAST(f.n_cur + 1 AS DOUBLE) / CAST(t.t_cur + 10 AS DOUBLE) AS p_cur
        FROM f CROSS JOIN tot t),
      psi AS (
        SELECT CAST(SUM(CAST((p_ref - p_cur) * ln(p_ref / p_cur) AS DECIMAL(38,6))) AS DOUBLE) AS psi_total
        FROM terms)
      SELECT terms.bin, terms.n_ref, terms.n_cur, terms.p_ref, terms.p_cur, psi.psi_total
      FROM terms CROSS JOIN psi
      ORDER BY terms.bin""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.queries.Common.D
    val b = t(spark, dir).events
      .groupBy(least(floor($"value" / lit(25.0)).cast("long"), lit(9L)).as("bin"),
        ($"user_id" % 2).as("half"))
      .agg(count(lit(1)).as("n"))
      .ckptLazy() // ref + cur legs
    val spine = spark.range(0, 10).toDF("bin")
    val f = spine
      .join(b.filter($"half" === 0).select($"bin", $"n".as("n_ref")), Seq("bin"), "left")
      .join(b.filter($"half" === 1).select($"bin", $"n".as("n_cur")), Seq("bin"), "left")
      .select($"bin", coalesce($"n_ref", lit(0L)).as("n_ref"),
        coalesce($"n_cur", lit(0L)).as("n_cur"))
      .ckptLazy() // totals + terms
    val tot = f.agg(sum($"n_ref").as("t_ref"), sum($"n_cur").as("t_cur"))
    val terms = f.crossJoin(broadcast(tot))
      .select($"bin", $"n_ref", $"n_cur",
        (($"n_ref" + 1).cast("double") / ($"t_ref" + 10).cast("double")).as("p_ref"),
        (($"n_cur" + 1).cast("double") / ($"t_cur" + 10).cast("double")).as("p_cur"))
      .ckptLazy() // rows + the psi sum
    val psi = terms.agg(
      sum((($"p_ref" - $"p_cur") * log($"p_ref" / $"p_cur")).cast(D))
        .cast("double").as("psi_total"))
    terms.crossJoin(broadcast(psi))
      .select($"bin", $"n_ref", $"n_cur", $"p_ref", $"p_cur", $"psi_total")
      .orderBy($"bin")
  }

  /** Friedman rank test across event types blocked by day — the
    * REPEATED-MEASURES omnibus next to [[qLevene]]/[[qAbTest]]: does any
    * treatment (event type) systematically rank higher across blocks
    * (days), with each day acting as its own control? Only COMPLETE
    * blocks (days where every type appears) enter, the standard design
    * requirement.
    *
    * Portability: within-block ranks are row_number over (v, typ) — v is
    * the exact decimal daily sum, ties broken by typ, a total order both
    * engines sort identically — so ranks, rank sums and SS = ΣR² are
    * exact BIGINTs, and χ² = 12·SS/(n·k·(k+1)) − 3·n·(k+1) is one
    * IEEE-exact chain over exact integers (division last, nothing
    * rounded). Scale shape: one fact shuffle to daily cells, a
    * k-bounded per-day window, then k-row arithmetic.
    */
  val qFriedman: GQuery = GQuery(
    "q_stat_friedman",
    Some("""
      WITH daily AS MATERIALIZED (
        SELECT epoch_us(ts) // 86400000000 AS d, event_type AS typ,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2),
      kk AS (SELECT CAST(COUNT(DISTINCT typ) AS BIGINT) AS k FROM daily),
      blocks AS MATERIALIZED (
        SELECT d FROM daily GROUP BY d
        HAVING CAST(COUNT(*) AS BIGINT) = (SELECT k FROM kk)),
      ranked AS (
        SELECT dd.typ,
               CAST(row_number() OVER (PARTITION BY dd.d ORDER BY dd.v, dd.typ)
                    AS BIGINT) AS rk
        FROM daily dd JOIN blocks b ON b.d = dd.d),
      rs AS MATERIALIZED (
        SELECT typ, CAST(SUM(rk) AS BIGINT) AS rank_sum FROM ranked GROUP BY 1),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM blocks),
      ss AS (SELECT CAST(SUM(rank_sum * rank_sum) AS BIGINT) AS ss FROM rs)
      SELECT rs.typ AS event_type, nn.n AS n_blocks, kk.k AS k_treatments,
             rs.rank_sum,
             CAST(12 AS DOUBLE) * CAST(ss.ss AS DOUBLE)
               / (CAST(nn.n AS DOUBLE) * CAST(kk.k AS DOUBLE)
                  * CAST(kk.k + 1 AS DOUBLE))
               - CAST(3 AS DOUBLE) * CAST(nn.n AS DOUBLE)
                 * CAST(kk.k + 1 AS DOUBLE) AS chi2
      FROM rs, nn, kk, ss ORDER BY event_type""")
  ) { (spark, dir) =>
    import spark.implicits._
    val daily = t(spark, dir).events
      .select(expr("(ts div 1000) div 86400000000").as("d"),
        $"event_type".as("typ"), $"value")
      .groupBy($"d", $"typ").agg(dsum($"value").as("v"))
      .ckptLazy() // feeds k, blocks, and the ranked join
    val k = daily.agg(countDistinct($"typ").as("k"))
    val blocks = daily.groupBy($"d").agg(count(lit(1)).as("c"))
      .join(broadcast(k), $"c" === $"k").select($"d")
    val ranked = daily.join(blocks, Seq("d"))
      .withColumn("rk",
        row_number().over(Window.partitionBy($"d").orderBy($"v", $"typ")).cast("long"))
    val rs = ranked.groupBy($"typ").agg(sum($"rk").as("rank_sum"))
    val n = blocks.agg(count(lit(1)).as("n"))
    val ss = rs.agg(sum($"rank_sum" * $"rank_sum").as("ss"))
    rs.crossJoin(broadcast(n)).crossJoin(broadcast(k)).crossJoin(broadcast(ss))
      .select($"typ".as("event_type"), $"n".as("n_blocks"), $"k".as("k_treatments"),
        $"rank_sum",
        (lit(12.0) * $"ss".cast("double")
          / ($"n".cast("double") * $"k".cast("double") * ($"k" + 1).cast("double"))
          - lit(3.0) * $"n".cast("double") * ($"k" + 1).cast("double")).as("chi2"))
      .orderBy($"event_type")
  }

  /** Page's trend test (Page 1963) — the ORDERED-alternative companion
    * to [[qFriedman]]: same complete-day-block ranks, but the statistic
    * L = Σ j·R_j weights each treatment's rank sum by its HYPOTHESIZED
    * position j (here the lexicographic event-type order, stated up
    * front — the standard a-priori-ordering requirement), so a monotone
    * trend along that order is detected where Friedman's omnibus only
    * sees "some difference". Standardized z = (L − μ)/σ with
    * μ = n·k·(k+1)²/4 and σ² = n·k²·(k+1)·(k²−1)/144.
    *
    * Portability: ranks/L/μ numerators are exact BIGINTs (the Friedman
    * discipline); 144·σ² is an exact integer, so z is one ÷√× IEEE
    * chain over exact integers — RAW doubles, nothing rounded. Scale
    * shape: identical to Friedman (one fact shuffle, k-bounded windows,
    * k-row arithmetic).
    */
  val qPageTrend: GQuery = GQuery(
    "q_stat_page_trend",
    Some("""
      WITH daily AS MATERIALIZED (
        SELECT epoch_us(ts) // 86400000000 AS d, event_type AS typ,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2),
      kk AS (SELECT CAST(COUNT(DISTINCT typ) AS BIGINT) AS k FROM daily),
      blocks AS MATERIALIZED (
        SELECT d FROM daily GROUP BY d
        HAVING CAST(COUNT(*) AS BIGINT) = (SELECT k FROM kk)),
      ranked AS (
        SELECT dd.typ,
               CAST(row_number() OVER (PARTITION BY dd.d ORDER BY dd.v, dd.typ)
                    AS BIGINT) AS rk
        FROM daily dd JOIN blocks b ON b.d = dd.d),
      rs AS MATERIALIZED (
        SELECT typ, CAST(SUM(rk) AS BIGINT) AS rank_sum FROM ranked GROUP BY 1),
      ord AS MATERIALIZED (
        SELECT typ, rank_sum,
               CAST(row_number() OVER (ORDER BY typ) AS BIGINT) AS j
        FROM rs),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM blocks),
      ll AS (SELECT CAST(SUM(j * rank_sum) AS BIGINT) AS l FROM ord)
      SELECT o.typ AS event_type, o.j AS hyp_position, o.rank_sum,
             nn.n AS n_blocks, kk.k AS k_treatments, ll.l AS page_l,
             (CAST(ll.l AS DOUBLE)
              - CAST(nn.n * kk.k * (kk.k + 1) * (kk.k + 1) AS DOUBLE) / CAST(4 AS DOUBLE))
               / sqrt(CAST(nn.n * kk.k * kk.k * (kk.k + 1) * (kk.k * kk.k - 1) AS DOUBLE)
                      / CAST(144 AS DOUBLE)) AS z
      FROM ord o, nn, kk, ll ORDER BY event_type""")
  ) { (spark, dir) =>
    import spark.implicits._
    val daily = t(spark, dir).events
      .select(expr("(ts div 1000) div 86400000000").as("d"),
        $"event_type".as("typ"), $"value")
      .groupBy($"d", $"typ").agg(dsum($"value").as("v"))
      .ckptLazy() // feeds k, blocks, and the ranked join
    val k = daily.agg(countDistinct($"typ").as("k"))
    val blocks = daily.groupBy($"d").agg(count(lit(1)).as("c"))
      .join(broadcast(k), $"c" === $"k").select($"d")
    val ranked = daily.join(blocks, Seq("d"))
      .withColumn("rk",
        row_number().over(Window.partitionBy($"d").orderBy($"v", $"typ")).cast("long"))
    val rs = ranked.groupBy($"typ").agg(sum($"rk").as("rank_sum"))
    val ord = rs.withColumn("j",
      row_number().over(Window.orderBy($"typ")).cast("long"))
    val n = blocks.agg(count(lit(1)).as("n"))
    val l = ord.agg(sum($"j" * $"rank_sum").as("l"))
    ord.crossJoin(broadcast(n)).crossJoin(broadcast(k)).crossJoin(broadcast(l))
      .select($"typ".as("event_type"), $"j".as("hyp_position"), $"rank_sum",
        $"n".as("n_blocks"), $"k".as("k_treatments"), $"l".as("page_l"),
        (($"l".cast("double")
          - ($"n" * $"k" * ($"k" + 1) * ($"k" + 1)).cast("double") / lit(4.0))
          / sqrt(($"n" * $"k" * $"k" * ($"k" + 1) * ($"k" * $"k" - 1)).cast("double")
            / lit(144.0))).as("z"))
      .orderBy($"event_type")
  }

  override def queries: Seq[GQuery] =
    Seq(qProfile, qHistogram, qZscore, qDrift, qExpectations, qDiff, qAbTest, qEntropy,
      qChi2, qKanon, qWinsorize, qErasure, qQuantileBins, qTargetEncode, qLdiversity,
      qKsTest, qMannWhitney, qBootstrap, qPseudonym, qMad, qCohenKappa, qFleissKappa,
      qSpearman, qPermutation, qCramersV, qMcnemar, qFdrBh, qBenford, qMutualInfo,
      qStratifiedEffect, qQuantileNorm, qLevene, qFd, qPsi, qKrippendorff, qFriedman,
      qPageTrend)
}
