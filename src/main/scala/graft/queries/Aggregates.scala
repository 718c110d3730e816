package graft.queries

import graft.engine.PlanOnly.syntax._

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import Common._

/** Aggregation inventory: distinct counts, multi-dimensional grouping
  * (rollup/cube/grouping sets), conditional aggregation, ordered string
  * aggregation, and sketches (HLL).
  *
  * Reference analog: running keyed counters in user closures
  * (`examples/src/basic.rs:29-31`, `double-agent.rs:36-48`) — SURVEY.md
  * §2.4 C4. Spark gives partial (map-side) aggregation for all of these;
  * rollup/cube expand grouping sets before the shuffle, so one pass over
  * the fact table feeds every grouping combination.
  */
object Aggregates extends QuerySet {

  /** Distinct counts per group (expands to two aggregates internally). */
  val qDistinct: GQuery = GQuery(
    "q_agg_distinct",
    Some("""
      SELECT l_returnflag,
             COUNT(DISTINCT l_partkey) AS n_parts,
             COUNT(DISTINCT l_suppkey) AS n_supps,
             COUNT(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).lineitem
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        count(lit(1)).as("n_rows")
      )
      .orderBy($"l_returnflag")
  }

  /** ROLLUP: per (segment, nation), per segment, grand total. NULL grouping
    * cells are coalesced to sentinels so ordering/hashing is engine-neutral.
    */
  val qRollup: GQuery = GQuery(
    "q_agg_rollup",
    Some(s"""
      SELECT COALESCE(c_mktsegment, '(all)') AS segment,
             COALESCE(c_nationkey, -1) AS nationkey,
             COUNT(*) AS n_cust,
             ${sqlSum("c_acctbal")} AS total_bal
      FROM customer
      GROUP BY ROLLUP(c_mktsegment, c_nationkey)
      ORDER BY segment, nationkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).customer
      .rollup($"c_mktsegment", $"c_nationkey")
      .agg(count(lit(1)).as("n_cust"), dsum($"c_acctbal").as("total_bal"))
      .select(
        coalesce($"c_mktsegment", lit("(all)")).as("segment"),
        coalesce($"c_nationkey", lit(-1)).as("nationkey"),
        $"n_cust",
        $"total_bal"
      )
      .orderBy($"segment", $"nationkey")
  }

  /** CUBE over order status x priority. */
  val qCube: GQuery = GQuery(
    "q_agg_cube",
    Some(s"""
      SELECT COALESCE(o_orderstatus, '(all)') AS status,
             COALESCE(o_orderpriority, '(all)') AS priority,
             COUNT(*) AS n_orders,
             ${sqlSum("o_totalprice")} AS total_price
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY status, priority""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).orders
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total_price"))
      .select(
        coalesce($"o_orderstatus", lit("(all)")).as("status"),
        coalesce($"o_orderpriority", lit("(all)")).as("priority"),
        $"n_orders",
        $"total_price"
      )
      .orderBy($"status", $"priority")
  }

  /** Explicit GROUPING SETS: an arbitrary set list — (status, priority),
    * (priority), () — not expressible as one rollup/cube. Uses the
    * first-class `Dataset.groupingSets` API (Spark 4).
    */
  val qGroupingSets: GQuery = GQuery(
    "q_agg_grouping_sets",
    Some(s"""
      SELECT COALESCE(o_orderstatus, '(all)') AS status,
             COALESCE(o_orderpriority, '(all)') AS priority,
             COUNT(*) AS n_orders,
             ${sqlSum("o_totalprice")} AS total_price
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
      ORDER BY status, priority""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).orders
      .groupingSets(
        Seq(Seq($"o_orderstatus", $"o_orderpriority"), Seq($"o_orderpriority"), Seq()),
        $"o_orderstatus",
        $"o_orderpriority"
      )
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total_price"))
      .select(
        coalesce($"o_orderstatus", lit("(all)")).as("status"),
        coalesce($"o_orderpriority", lit("(all)")).as("priority"),
        $"n_orders",
        $"total_price"
      )
      .orderBy($"status", $"priority")
  }

  /** Conditional aggregation: CASE-gated sums in one pass. */
  val qConditional: GQuery = GQuery(
    "q_agg_conditional",
    Some(s"""
      SELECT o_orderpriority,
             COUNT(*) AS n,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
             ${sqlSum("CASE WHEN o_totalprice > 50000 THEN o_totalprice ELSE 0 END")} AS big_total
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).orders
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        sum(when($"o_orderstatus" === "F", 1L).otherwise(0L)).as("n_f"),
        dsum(when($"o_totalprice" > 50000, $"o_totalprice").otherwise(lit(0.0)))
          .as("big_total")
      )
      .orderBy($"o_orderpriority")
  }

  /** Ordered string aggregation (collect_list analog, engine-neutral as a
    * sorted comma-joined string).
    */
  val qCollect: GQuery = GQuery(
    "q_agg_collect",
    Some("""
      SELECT n_regionkey AS regionkey,
             string_agg(n_name, ',' ORDER BY n_name) AS nations
      FROM nation
      GROUP BY n_regionkey
      ORDER BY regionkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).nation
      .groupBy($"n_regionkey".as("regionkey"))
      .agg(concat_ws(",", array_sort(collect_list($"n_name"))).as("nations"))
      .orderBy($"regionkey")
  }

  /** HLL sketch: approximate distinct. At 100 TB this replaces exact
    * COUNT(DISTINCT) where a 2% error is acceptable — constant memory per
    * group instead of a distinct-expand shuffle.
    *
    * Oracle gate is BOUND-ENCODED: sketch estimates are engine-specific
    * (DuckDB cannot replay Spark's HLL++), so the query emits the exact
    * distinct counts plus booleans asserting the estimate landed within
    * 3×rsd (6%) of exact, and the oracle computes the exact counts with
    * the booleans pinned TRUE — the hash match then IS the error-bound
    * check (observed error at sf0.01: ≤0.95%).
    */
  val qApproxDistinct: GQuery = GQuery(
    "q_agg_approx_distinct",
    Some("""
      SELECT l_returnflag,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
             TRUE AS parts_ok,
             TRUE AS orders_ok
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")
  ) { (spark, dir) =>
    import spark.implicits._
    def ok(approx: Column, exact: Column): Column =
      abs(approx.cast("double") - exact.cast("double")) / exact.cast("double") <= 0.06
    val li = t(spark, dir).lineitem
    // approx side: partial-aggregatable sketches, one pass, no expand
    val approx = li
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_partkey", 0.02).as("approx_parts"),
        approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"))
    // exact sides as separate pair-distinct aggregates: two hash
    // distincts instead of one Expand that would ×3 every input row
    // (multi-column COUNT DISTINCT plans via Expand — the slowest query
    // of the suite until split this way)
    def exactDistinct(c: Column, as: String) =
      li.select($"l_returnflag", c).distinct()
        .groupBy($"l_returnflag").agg(count(lit(1)).as(as))
    approx
      .join(exactDistinct($"l_partkey", "exact_parts"), "l_returnflag")
      .join(exactDistinct($"l_orderkey", "exact_orders"), "l_returnflag")
      .select(
        $"l_returnflag",
        $"exact_parts",
        $"exact_orders",
        ok($"approx_parts", $"exact_parts").as("parts_ok"),
        ok($"approx_orders", $"exact_orders").as("orders_ok")
      )
      .orderBy($"l_returnflag")
  }

  /** Mergeable HLL sketch rollup (Datasketches `hll_sketch_agg` /
    * `hll_union_agg`): per-day user sketches re-aggregated to per-type
    * distinct estimates WITHOUT touching raw rows again — the warehouse
    * pattern where a 100 TB fact table is sketched once at fine grain and
    * every coarser rollup merges kilobyte sketches instead of rescanning.
    *
    * Oracle gate is BOUND-ENCODED (sketches are engine-specific): the
    * query emits n_days and exact distinct users per type plus a boolean
    * asserting the merged-sketch estimate is within 5% of exact; the
    * oracle recomputes days and exact counts with the boolean pinned
    * TRUE. ExtensionSpec additionally proves merge-consistency (daily
    * sketches merged == whole column sketched directly).
    */
  val qHllRollup: GQuery = GQuery(
    "q_agg_hll_rollup",
    Some("""
      SELECT event_type,
             CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
             TRUE AS approx_ok
      FROM events
      GROUP BY event_type
      ORDER BY event_type""")
  ) { (spark, dir) =>
    import spark.implicits._
    val ev = t(spark, dir).events
      .select($"event_type", to_date(graft.streaming.StreamOps.tsFromNanos($"ts")).as("day"), $"user_id")
    val daily = ev
      .groupBy($"event_type", $"day")
      .agg(hll_sketch_agg($"user_id").as("sk"))
    val rolled = daily
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("approx_users"), count(lit(1)).as("n_days"))
    val exact = ev
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact_users"))
    rolled
      .join(exact, "event_type")
      .select(
        $"event_type",
        $"n_days",
        $"exact_users",
        (abs($"approx_users".cast("double") - $"exact_users".cast("double")) /
          $"exact_users".cast("double") <= 0.05).as("approx_ok")
      )
      .orderBy($"event_type")
  }

  /** SQL-standard FILTER clause on aggregates — the declarative form of
    * the CASE-WHEN conditional aggregation q_agg_conditional exercises:
    * each aggregate sees only its own filtered rows, all in ONE pass
    * (Catalyst compiles both spellings to the same conditional
    * aggregation; the parser surface is what this query pins).
    */
  val qFilterClause: GQuery = GQuery(
    "q_agg_filter_clause",
    Some(s"""
      SELECT l_returnflag,
             COUNT(*) AS n_all,
             COUNT(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
             ${sqlSum("l_extendedprice")} AS rev_all,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS rev_discounted,
             CAST(MAX(l_quantity) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS max_qty_f
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")
  ) { (spark, dir) =>
    t(spark, dir).lineitem.createOrReplaceTempView("lineitem")
    spark.sql("""
      SELECT l_returnflag,
             COUNT(*) AS n_all,
             COUNT(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS rev_all,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS rev_discounted,
             CAST(MAX(l_quantity) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS max_qty_f
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")
  }

  /** Sketch SET OPERATIONS: estimated overlap between audience slices via
    * HLL inclusion-exclusion — |A∩B| ≈ est(A) + est(B) − est(A∪B), with
    * the union estimated by MERGING the two slices' sketches (`hll_union`),
    * never rescanning. At 100 TB this answers "how much do the `view` and
    * `click` audiences overlap" from per-slice sketches a rollup already
    * maintains — no pairwise distinct-expand over the fact table, and the
    * same per-type sketch serves every pair.
    *
    * Plan shape: one distinct pass to (type, user); per-type sketch + exact
    * count (5 rows); pairs by self-join of the 5-row aggregate; the EXACT
    * union side (oracle ground truth) goes pair→explode to (pair_id, type)
    * and equi-joins back — no OR-predicate BNLJ anywhere.
    *
    * Bound-encoded oracle: exact per-slice/union/intersection counts are
    * replayed in SQL; the sketch estimate ships only as an in-bound boolean
    * pinned TRUE (inclusion-exclusion stacks three estimates' errors, so
    * the bound is vs the UNION size — the quantity the errors scale with).
    */
  val qHllIntersect: GQuery = GQuery(
    "q_agg_hll_intersect",
    Some("""
      WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
      pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b
                FROM (SELECT DISTINCT event_type FROM tu) a
                JOIN (SELECT DISTINCT event_type FROM tu) b ON a.event_type < b.event_type),
      nd AS (SELECT event_type, COUNT(DISTINCT user_id) AS nd FROM tu GROUP BY 1),
      un AS (SELECT p.type_a, p.type_b, COUNT(DISTINCT t.user_id) AS exact_union
             FROM pairs p JOIN tu t ON t.event_type IN (p.type_a, p.type_b)
             GROUP BY 1, 2)
      SELECT u.type_a, u.type_b,
             na.nd AS exact_a, nb.nd AS exact_b,
             u.exact_union,
             na.nd + nb.nd - u.exact_union AS exact_inter,
             TRUE AS est_in_bound
      FROM un u
      JOIN nd na ON na.event_type = u.type_a
      JOIN nd nb ON nb.event_type = u.type_b
      ORDER BY type_a, type_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tu = t(spark, dir).events.select($"event_type", $"user_id").distinct()
    val perType = tu
      .groupBy($"event_type")
      .agg(hll_sketch_agg($"user_id").as("sk"), countDistinct($"user_id").as("nd"))
    val pairs = perType.as("a")
      .join(perType.as("b"), col("a.event_type") < col("b.event_type"))
      .select(
        col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
        col("a.nd").as("exact_a"), col("b.nd").as("exact_b"),
        (col("a.nd") + col("b.nd") -
          hll_sketch_estimate(hll_union(col("a.sk"), col("b.sk")))).as("est_inter"))
    // exact union per pair: explode the pair list to (pair, type) and
    // equi-join the distinct (type, user) pairs — no OR-join, no BNLJ
    val pairTypes = pairs
      .select($"type_a", $"type_b", explode(array($"type_a", $"type_b")).as("event_type"))
    val exactUnion = pairTypes
      .join(tu, "event_type")
      .groupBy($"type_a", $"type_b")
      .agg(countDistinct($"user_id").as("exact_union"))
    pairs
      .join(exactUnion, Seq("type_a", "type_b"))
      .select(
        $"type_a", $"type_b", $"exact_a", $"exact_b", $"exact_union",
        ($"exact_a" + $"exact_b" - $"exact_union").as("exact_inter"),
        (abs($"est_inter" - ($"exact_a" + $"exact_b" - $"exact_union")) <=
          greatest(lit(5.0), $"exact_union" * 0.05)).as("est_in_bound"))
      .orderBy($"type_a", $"type_b")
  }

  /** Key-skew report ([[graft.operators.Diagnostics.skewReport]]) for
    * lineitem's part key — the pre-flight check for any shuffle on it.
    * Median over integer counts interpolates to .0/.5 midpoints (exactly
    * representable), so the whole row is hash-exact cross-engine.
    */
  val qDiagSkew: GQuery = GQuery(
    "q_diag_skew",
    Some("""
      WITH c AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt
                 FROM lineitem GROUP BY 1)
      SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt,
             CAST(quantile_cont(cnt, 0.5) AS DOUBLE) AS p50_cnt,
             CAST(MAX(cnt) AS DOUBLE) / (CAST(SUM(cnt) AS DOUBLE) / COUNT(*)) AS skew_ratio
      FROM c""")
  ) { (spark, dir) =>
    graft.operators.Diagnostics.skewReport(t(spark, dir).lineitem, "l_partkey")
  }

  /** min/max/min_by/max_by with deterministic tie-breaks. */
  val qMinMax: GQuery = GQuery(
    "q_agg_minmax",
    Some("""
      SELECT c_nationkey AS nationkey,
             MIN(c_acctbal) AS min_bal,
             MAX(c_acctbal) AS max_bal,
             MIN(c_name) AS first_name,
             MAX(c_name) AS last_name
      FROM customer
      GROUP BY c_nationkey
      ORDER BY nationkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).customer
      .groupBy($"c_nationkey".as("nationkey"))
      .agg(
        min($"c_acctbal").as("min_bal"),
        max($"c_acctbal").as("max_bal"),
        min($"c_name").as("first_name"),
        max($"c_name").as("last_name")
      )
      .orderBy($"nationkey")
  }

  /** Distribution statistics: exact interpolated percentiles (Spark
    * `percentile` and DuckDB `quantile_cont` share the linear-interpolation
    * definition) and a width_bucket histogram position. Rounded to 6dp —
    * interpolation arithmetic is deterministic but engine fp order isn't
    * bit-pinned.
    */
  val qPercentiles: GQuery = GQuery(
    "q_agg_percentiles",
    Some("""
      SELECT event_type,
             round(quantile_cont(value, 0.5), 6) AS p50,
             round(quantile_cont(value, 0.9), 6) AS p90,
             round(quantile_cont(value, 0.99), 6) AS p99,
             CAST(SUM(CAST(least(greatest(floor(value / 100.0) + 1, 0), 11) AS BIGINT)) AS BIGINT)
               AS bucket_mass
      FROM events
      GROUP BY event_type
      ORDER BY event_type""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).events
      .groupBy($"event_type")
      .agg(
        round(percentile($"value", lit(0.5)), 6).as("p50"),
        round(percentile($"value", lit(0.9)), 6).as("p90"),
        round(percentile($"value", lit(0.99)), 6).as("p99"),
        sum(width_bucket($"value", lit(0.0), lit(1000.0), lit(10))).as("bucket_mass")
      )
      .orderBy($"event_type")
  }

  /** Statistical aggregates (stddev, correlation) computed from EXPLICIT
    * moment sums through DECIMAL(38,6) — not the built-in Welford-style
    * stddev/corr, whose streaming updates are FP-order-dependent and
    * differ between partition-parallel Spark and single-scan DuckDB in the
    * last ulps. Per-row products are IEEE-deterministic; the decimal sums
    * are exact and order-insensitive; mean and stddev then combine
    * bit-identically cross-engine. corr's longer compound division was
    * observed 1 ulp apart between the engines, so it alone rounds to 9dp
    * on both sides. Same one-pass map-side-combinable shape the built-ins
    * have. Also covers max_by/min_by with deterministic struct tie-breaks
    * (the oracle states them independently via ROW_NUMBER).
    */
  val qStats: GQuery = GQuery(
    "q_agg_stats",
    Some(s"""
      WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               ${sqlSum("l_quantity")} AS sq,
               ${sqlSum("l_quantity * l_quantity")} AS sqq,
               ${sqlSum("l_extendedprice")} AS sp,
               ${sqlSum("l_extendedprice * l_extendedprice")} AS spp,
               ${sqlSum("l_quantity * l_extendedprice")} AS sqp
        FROM lineitem GROUP BY l_returnflag),
      ranked AS (
        SELECT l_returnflag, l_partkey,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice DESC, l_partkey DESC) AS rmax,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice, l_partkey DESC) AS rmin
        FROM lineitem)
      SELECT m.l_returnflag, m.n,
             m.sq / m.n AS mean_qty,
             sqrt((m.sqq - m.sq * m.sq / m.n) / (m.n - 1)) AS stddev_qty,
             round((m.sqp - m.sq * m.sp / m.n)
               / (sqrt(m.sqq - m.sq * m.sq / m.n) * sqrt(m.spp - m.sp * m.sp / m.n)), 9)
               AS corr_qty_price,
             mx.l_partkey AS priciest_part,
             mn.l_partkey AS cheapest_part
      FROM m
      JOIN (SELECT l_returnflag, l_partkey FROM ranked WHERE rmax = 1) mx USING (l_returnflag)
      JOIN (SELECT l_returnflag, l_partkey FROM ranked WHERE rmin = 1) mn USING (l_returnflag)
      ORDER BY m.l_returnflag""")
  ) { (spark, dir) =>
    import spark.implicits._
    val n = count(lit(1)).cast("double")
    val sq = dsum($"l_quantity")
    val sqq = dsum($"l_quantity" * $"l_quantity")
    val sp = dsum($"l_extendedprice")
    val spp = dsum($"l_extendedprice" * $"l_extendedprice")
    val sqp = dsum($"l_quantity" * $"l_extendedprice")
    t(spark, dir).lineitem
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        (sq / n).as("mean_qty"),
        sqrt((sqq - sq * sq / n) / (n - 1)).as("stddev_qty"),
        round((sqp - sq * sp / n) / (sqrt(sqq - sq * sq / n) * sqrt(spp - sp * sp / n)), 9)
          .as("corr_qty_price"),
        max_by($"l_partkey", struct($"l_extendedprice", $"l_partkey")).as("priciest_part"),
        min_by($"l_partkey", struct($"l_extendedprice", -$"l_partkey")).as("cheapest_part")
      )
      .orderBy($"l_returnflag")
  }

  /** Count-min sketch frequency estimation over the fact table's part
    * key, bound-encoded (see q_agg_approx_distinct): the query emits the
    * EXACT count of the 20 hottest keys plus two per-key contract
    * booleans — CMS never undercounts (est ≥ exact), and overcounts by at
    * most ε·N with the sketch's confidence (est ≤ exact + ⌈ε·N⌉) — and
    * the oracle recomputes the exact counts with the booleans pinned
    * TRUE, making the hash match the sketch-accuracy check.
    *
    * Scale shape: the sketch build is one `TreeAggregate` over the fact
    * table (mergeable W×D counter arrays, KBs on the driver — the same
    * bounded-summary exemption as centroid/codebook training); the probe
    * set is the top-20 aggregate, collected bounded. ε = 0.001 / δ =
    * 0.001 → 2719×10 counters; the Bench SF never pushes a hot key's
    * collision mass past the decoded bound.
    */
  val qCountMin: GQuery = GQuery(
    "q_agg_count_min",
    Some("""
      WITH c AS (
        SELECT l_partkey, COUNT(*) AS exact_cnt
        FROM lineitem GROUP BY 1
        ORDER BY exact_cnt DESC, l_partkey LIMIT 20)
      SELECT l_partkey, exact_cnt, TRUE AS est_ge_exact, TRUE AS est_within_eps
      FROM c
      ORDER BY exact_cnt DESC, l_partkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    val li = t(spark, dir).lineitem
    val n = li.count()
    val eps = 0.001
    val sketch = li.stat.countMinSketch($"l_partkey", eps, 0.999, 42)
    val bound = math.ceil(eps * n).toLong
    val topk = li
      .groupBy($"l_partkey")
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy($"exact_cnt".desc, $"l_partkey")
      .limit(20)
      .collect() // bounded: exactly 20 rows
      .map { r =>
        val key = r.getLong(0)
        val exact = r.getLong(1)
        val est = sketch.estimateCount(key)
        (key, exact, est >= exact, est <= exact + bound)
      }
      .toSeq
    spark
      .createDataFrame(topk)
      .toDF("l_partkey", "exact_cnt", "est_ge_exact", "est_within_eps")
      .orderBy($"exact_cnt".desc, $"l_partkey")
  }

  /** Linear-regression aggregates (regr_slope / regr_intercept / R²) from
    * the same explicit decimal moment sums as [[qStats]] — one map-side-
    * combinable pass, no Welford order-dependence. Slope and intercept
    * are RAW IEEE doubles (round-10): the chain is div/mul/sub over
    * DECIMAL-exact sums written identically on both sides, so the bits
    * match any engine — whereas `round(x, 9)` on a ~5e4-magnitude
    * intercept left only ~10² ulps between grid points, a cross-build
    * round-impl lottery (the round-boundary audit flagged exactly this;
    * PARITY.md "Rounding portability"). R² keeps round(·, 9): its spp
    * input is large enough (~6e14 at DECIMAL(38,6)) that DuckDB's
    * two-step int128→double→scale conversion lands 1 ulp off the JVM's
    * correctly-rounded Decimal.toDouble, so the raw bits genuinely
    * differ — but R² ≤ 1, so the 9dp grid is ~10¹⁰ ulps wide and the
    * round is boundary-safe by magnitude.
    */
  val qRegression: GQuery = GQuery(
    "q_agg_regression",
    Some(s"""
      WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               ${sqlSum("l_quantity")} AS sq,
               ${sqlSum("l_quantity * l_quantity")} AS sqq,
               ${sqlSum("l_extendedprice")} AS sp,
               ${sqlSum("l_extendedprice * l_extendedprice")} AS spp,
               ${sqlSum("l_quantity * l_extendedprice")} AS sqp
        FROM lineitem GROUP BY l_returnflag),
      s AS (
        SELECT l_returnflag, n, sq, sp, sqq, spp,
               (sqp - sq * sp / n) / (sqq - sq * sq / n) AS slope_raw
        FROM m)
      SELECT l_returnflag, n,
             slope_raw AS regr_slope,
             (sp - slope_raw * sq) / n AS regr_intercept,
             round(slope_raw * slope_raw * (sqq - sq * sq / n) / (spp - sp * sp / n), 9)
               AS regr_r2
      FROM s
      ORDER BY l_returnflag""")
  ) { (spark, dir) =>
    import spark.implicits._
    val n = count(lit(1)).cast("double")
    val sq = dsum($"l_quantity")
    val sqq = dsum($"l_quantity" * $"l_quantity")
    val sp = dsum($"l_extendedprice")
    val spp = dsum($"l_extendedprice" * $"l_extendedprice")
    val sqp = dsum($"l_quantity" * $"l_extendedprice")
    t(spark, dir).lineitem
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sq.as("__sq"), sp.as("__sp"), sqq.as("__sqq"), spp.as("__spp"), sqp.as("__sqp"))
      .withColumn(
        "__slope_raw",
        ($"__sqp" - $"__sq" * $"__sp" / $"n".cast("double")) /
          ($"__sqq" - $"__sq" * $"__sq" / $"n".cast("double")))
      .select(
        $"l_returnflag",
        $"n",
        $"__slope_raw".as("regr_slope"),
        (($"__sp" - $"__slope_raw" * $"__sq") / $"n".cast("double"))
          .as("regr_intercept"),
        round(
          $"__slope_raw" * $"__slope_raw" *
            ($"__sqq" - $"__sq" * $"__sq" / $"n".cast("double")) /
            ($"__spp" - $"__sp" * $"__sp" / $"n".cast("double")),
          9).as("regr_r2")
      )
      .orderBy($"l_returnflag")
  }

  /** Pivot (long → wide): per-customer-segment event... here, per order
    * priority, lineitem quantity mass by return flag as columns. Spark's
    * `pivot` with an explicit value list keeps the schema static and the
    * aggregation one-pass (each pivot cell is a conditional aggregate,
    * map-side combined); the oracle expresses the identical wide schema
    * with CASE-gated sums — the portable formulation of PIVOT.
    */
  val qPivot: GQuery = GQuery(
    "q_agg_pivot",
    Some(s"""
      SELECT o_orderpriority,
             ${sqlSum("CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0 END")} AS qty_A,
             ${sqlSum("CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE 0 END")} AS qty_N,
             ${sqlSum("CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END")} AS qty_R
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tb = t(spark, dir)
    tb.lineitem
      .join(tb.orders.select($"o_orderkey".as("l_orderkey"), $"o_orderpriority"), "l_orderkey")
      .groupBy($"o_orderpriority")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(dsum($"l_quantity"))
      // a flag absent from a priority group pivots to NULL; the CASE-sum
      // oracle yields 0 — align
      .select(
        $"o_orderpriority",
        coalesce($"A", lit(0.0)).as("qty_A"),
        coalesce($"N", lit(0.0)).as("qty_N"),
        coalesce($"R", lit(0.0)).as("qty_R")
      )
      .orderBy($"o_orderpriority")
  }

  /** Two-pass heavy hitters via the Misra–Gries sketch
    * ([[graft.operators.FrequentItems.heavyHitters]]): power users with
    * ≥ 0.7% of all events. The sketch pass keeps reduce state bounded at
    * k=255 entries no matter how many distinct users exist; the exact
    * recount makes the result oracle-checkable (the oracle computes the
    * same set by brute-force groupBy — same rows, unbounded state).
    */
  val qHeavyHitters: GQuery = GQuery(
    "q_agg_heavy_hitters",
    Some("""
      WITH tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events WHERE user_id IS NOT NULL)
      SELECT CAST(user_id AS BIGINT) AS user_id, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events, tot
      WHERE user_id IS NOT NULL
      GROUP BY user_id, n
      HAVING COUNT(*) >= ceil(0.007 * n)
      ORDER BY cnt DESC, user_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    graft.operators.FrequentItems
      .heavyHitters(t(spark, dir).events, "user_id", s = 0.007, k = 255)
      .select($"item".cast("long").as("user_id"), $"cnt")
      .orderBy($"cnt".desc, $"user_id")
  }

  /** Exact median + deterministic mode per group. Median uses the exact
    * interpolating percentile over l_quantity — integral values, so the
    * even-count midpoint is x.0/x.5 (exactly representable: both engines'
    * interpolation formulas agree bit-for-bit; over arbitrary doubles the
    * two formulas can differ in the last ulp, and percentile_approx is
    * the scale path anyway — QuantileSketchSpec). Mode is formulated as
    * count-then-rank with an explicit (cnt desc, value asc) tie-break:
    * built-in mode()'s tie choice is engine-arbitrary, which can never be
    * oracle-checked.
    */
  val qMedianMode: GQuery = GQuery(
    "q_agg_median_mode",
    Some("""
      WITH med AS (SELECT l_returnflag,
                          CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS median_qty
                   FROM lineitem GROUP BY 1),
           cnts AS (SELECT l_returnflag, l_linestatus,
                           COUNT(*) AS c
                    FROM lineitem GROUP BY 1, 2),
           md AS (SELECT l_returnflag, l_linestatus AS mode_status,
                         row_number() OVER (PARTITION BY l_returnflag
                                            ORDER BY c DESC, l_linestatus) AS rk
                  FROM cnts)
      SELECT m.l_returnflag, m.median_qty, d.mode_status
      FROM med m JOIN md d ON m.l_returnflag = d.l_returnflag AND d.rk = 1
      ORDER BY m.l_returnflag""")
  ) { (spark, dir) =>
    import spark.implicits._
    val li = t(spark, dir).lineitem
    val med = li
      .groupBy($"l_returnflag")
      .agg(percentile($"l_quantity", lit(0.5)).as("median_qty"))
    val md = li
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("c"))
      .withColumn(
        "rk",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"l_returnflag")
            .orderBy($"c".desc, $"l_linestatus")))
      .filter($"rk" === 1)
      .select($"l_returnflag", $"l_linestatus".as("mode_status"))
    med.join(md, "l_returnflag")
      .select($"l_returnflag", $"median_qty", $"mode_status")
      .orderBy($"l_returnflag")
  }

  /** IQR outlier screen (Tukey fences): per event_type, exact quartiles of
    * `value`, fences at q1/q3 ∓ 1.5·IQR, and the outlier count — the
    * standard numeric-column quality gate before training-data export.
    * Fences are rounded to 6dp on BOTH sides before comparing so a
    * last-ulp interpolation difference between engines cannot flip a
    * boundary row. Two-pass shape: the per-group fences are a tiny frame
    * broadcast back onto the fact scan (no second shuffle); at 100 TB the
    * exact `percentile` pass is the cost — `percentile_approx` (bounded
    * error, QuantileSketchSpec) is the drop-in scale path.
    */
  val qOutlierIqr: GQuery = GQuery(
    "q_agg_outlier_iqr",
    Some("""
      WITH f AS (
        SELECT event_type,
               round(CAST(quantile_cont(value, 0.25) AS DOUBLE), 6) AS q1,
               round(CAST(quantile_cont(value, 0.75) AS DOUBLE), 6) AS q3
        FROM events GROUP BY 1),
      b AS (
        SELECT event_type, q1, q3,
               round(q1 - 1.5 * (q3 - q1), 6) AS lo,
               round(q3 + 1.5 * (q3 - q1), 6) AS hi
        FROM f)
      SELECT e.event_type, b.q1, b.q3,
             COUNT(*) FILTER (WHERE e.value < b.lo OR e.value > b.hi) AS n_outliers,
             COUNT(*) AS n_total
      FROM events e JOIN b ON e.event_type = b.event_type
      GROUP BY 1, 2, 3
      ORDER BY 1""")
  ) { (spark, dir) =>
    import spark.implicits._
    val ev = t(spark, dir).events
    val fences = ev
      .groupBy($"event_type")
      .agg(
        round(percentile($"value", lit(0.25)), 6).as("q1"),
        round(percentile($"value", lit(0.75)), 6).as("q3"))
      .select(
        $"event_type", $"q1", $"q3",
        round($"q1" - lit(1.5) * ($"q3" - $"q1"), 6).as("lo"),
        round($"q3" + lit(1.5) * ($"q3" - $"q1"), 6).as("hi"))
    ev.join(broadcast(fences), "event_type")
      .groupBy($"event_type", $"q1", $"q3")
      .agg(
        count(when($"value" < $"lo" || $"value" > $"hi", 1)).as("n_outliers"),
        count(lit(1)).as("n_total"))
      .orderBy($"event_type")
  }

  /** Boolean / filtered aggregates: `bool_and`/`bool_or` (ALL/ANY-style
    * predicates folded map-side like any other partial agg) and
    * `count_if` — the assertion layer of data-quality reporting ("every
    * row in this partition satisfies X"). The oracle spells count_if as
    * the standard `COUNT(*) FILTER (WHERE ...)`.
    */
  val qBools: GQuery = GQuery(
    "q_agg_bools",
    Some("""
      SELECT event_type,
             bool_and(value >= 0.0) AS all_nonneg,
             bool_or(value > 990.0) AS any_hot,
             CAST(COUNT(*) FILTER (WHERE value > 500.0) AS BIGINT) AS n_hi,
             CAST(COUNT(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS n_even_user
      FROM events
      GROUP BY event_type
      ORDER BY event_type""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).events
      .groupBy($"event_type")
      .agg(
        bool_and($"value" >= 0.0).as("all_nonneg"),
        bool_or($"value" > 990.0).as("any_hot"),
        count_if($"value" > 500.0).as("n_hi"),
        count_if($"user_id" % 2 === 0).as("n_even_user"))
      .orderBy($"event_type")
  }

  /** One-pass mergeable quantile sketch (approx_percentile at accuracy
    * 1000) vs the exact sort — the only quantile shape that survives
    * 100 TB (partial-aggregatable per partition, no global sort). Oracle
    * gate is BOUND-ENCODED (see q_agg_approx_distinct): Spark computes
    * the returned element's RANK INTERVAL inside the group —
    * [count(value < ap) + 1, count(value <= ap)], so heavy ties at the
    * sketch output widen the interval instead of inflating a single
    * count — and asserts the interval overlaps the sketch's guaranteed
    * [n·p − n/accuracy, n·p + n/accuracy] window (+1 slack for the
    * discrete boundary); the oracle pins the booleans TRUE over exact
    * group counts — the hash match IS the rank-error check.
    */
  val qApproxQuantile: GQuery = GQuery(
    "q_agg_approx_quantile",
    Some("""
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok, TRUE AS p90_ok
      FROM events GROUP BY 1 ORDER BY 1""")
  ) { (spark, dir) =>
    import spark.implicits._
    val ps  = Seq(0.25, 0.50, 0.75, 0.90)
    val acc = 1000
    val ev  = t(spark, dir).events.select($"event_type", $"value")
    val sk = ev.groupBy($"event_type").agg(
      percentile_approx($"value", array(ps.map(lit): _*), lit(acc)).as("ap"),
      count(lit(1)).as("n"))
    // one extra narrow pass: the rank of each sketch output within its group
    val ranked = ev
      .join(broadcast(sk), "event_type")
      .groupBy($"event_type")
      .agg(
        max($"n").as("n"),
        ps.indices.flatMap(i => Seq(
          sum(when($"value" < element_at($"ap", i + 1), 1L).otherwise(0L)).as(s"lt_$i"),
          sum(when($"value" <= element_at($"ap", i + 1), 1L).otherwise(0L)).as(s"le_$i"))): _*)
    val checks = ps.zipWithIndex.map { case (p, i) =>
      val err    = $"n".cast("double") / acc + 1.0
      val target = $"n".cast("double") * p
      // element's min rank is lt+1, max rank is le; pass iff the rank
      // interval overlaps the GK guarantee window
      ((col(s"lt_$i").cast("double") + 1.0 <= target + err) &&
        (col(s"le_$i").cast("double") >= target - err))
        .as(s"p${(p * 100).toInt}_ok")
    }
    ranked
      .select($"event_type" +: $"n" +: checks: _*)
      .orderBy($"event_type")
  }

  /** EXACT distributed weighted median (lower weighted median of
    * l_extendedprice weighted by l_quantity, per return flag) — the
    * robust center for weighted populations (token-weighted doc length,
    * spend-weighted price) where the plain median over rows answers the
    * wrong question. Definition: smallest v with cumweight(v) ≥
    * ⌈W/2⌉ = (W+1) div 2, all-integer weights so the threshold and every
    * cumulative are exact BIGINTs.
    *
    * Scale shape: one (flag, value)-keyed pre-aggregate shuffles the fact
    * table once; the cumulative weights come from the range-partitioned
    * two-pass prefix scan ([[graft.operators.Sampling.prefixSumsBy]] over
    * the composite (flag, value) order) — NEVER a per-group
    * `Window.orderBy` (a flag group is a third of the fact table, which
    * would funnel through one task). Per-group exclusive offsets need no
    * window at all: groups are contiguous in the scan order, so
    * offset(g) = max(cum) − sum(w) per group. Threshold math uses `div`
    * (CLAUDE.md: Spark `/` on integers is DOUBLE division). The oracle
    * recomputes the same integers with a per-flag window — the
    * cum_at_median witness pins the selection, not just the value.
    */
  val qWeightedMedian: GQuery = GQuery(
    "q_agg_weighted_median",
    Some("""
      WITH f AS (
        SELECT l_returnflag AS flag, l_extendedprice AS v,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        FROM lineitem GROUP BY 1, 2),
      c AS (
        SELECT flag, v, w,
               CAST(SUM(w) OVER (PARTITION BY flag ORDER BY v) AS BIGINT) AS cumw
        FROM f),
      t AS (SELECT flag, CAST(SUM(w) AS BIGINT) AS w_total FROM f GROUP BY 1),
      m AS (
        SELECT c.flag, min(c.v) AS median_value
        FROM c JOIN t USING (flag)
        WHERE c.cumw >= (t.w_total + 1) // 2
        GROUP BY 1)
      SELECT t.flag AS l_returnflag, t.w_total,
             (t.w_total + 1) // 2 AS threshold,
             m.median_value, cm.cumw AS cum_at_median
      FROM t JOIN m ON m.flag = t.flag
      JOIN c cm ON cm.flag = t.flag AND cm.v = m.median_value
      ORDER BY l_returnflag""")
  ) { (spark, dir) =>
    import spark.implicits._
    val f = t(spark, dir).lineitem
      .groupBy($"l_returnflag".as("flag"), $"l_extendedprice".as("v"))
      .agg(sum($"l_quantity".cast("long")).as("w"))
    // global two-pass prefix scan over the composite (flag, v) order
    val c = graft.operators.Sampling
      .prefixSumsBy(f, Seq($"flag", $"v"), Seq("w"))
    // groups are contiguous in scan order: per-flag exclusive offset =
    // cumulative at group end minus the group's own total — no window
    val tt = c.groupBy($"flag")
      .agg(sum($"w").as("w_total"), max($"cum_w").as("grp_end"))
      .select($"flag", $"w_total", ($"grp_end" - $"w_total").as("offset"),
        expr("(w_total + 1) div 2").as("threshold"))
    val cl = c.join(broadcast(tt), "flag")
      .select($"flag", $"v", ($"cum_w" - $"offset").as("cumw"),
        $"w_total", $"threshold")
    val m = cl.filter($"cumw" >= $"threshold")
      .groupBy($"flag").agg(min($"v").as("median_value"))
    cl.join(broadcast(m), "flag")
      .filter($"v" === $"median_value")
      .select($"flag".as("l_returnflag"), $"w_total", $"threshold",
        $"median_value", $"cumw".as("cum_at_median"))
      .orderBy($"l_returnflag")
  }

  /** EXACT distributed k-th order statistic (k = ⌈0.9·n⌉ of
    * l_extendedprice) via RECURSIVE grid selection
    * ([[graft.operators.Selection.kthSmallest]]) — the scale path for
    * exact quantiles over ONE huge group, where the sort-within-group
    * shape (q_agg_median_mode, q_stat_conformal) has no partitioning to
    * lean on: each level buckets candidates into a 65,536-cell grid,
    * finds the cell holding the rank from the (bounded) cumulative cell
    * counts, and RECURSES into that cell until it is single-valued
    * (point-mass short-circuit: the cell IS the answer) or small enough
    * for one task to rank — so a 40%-point-mass distribution never
    * funnels 0.4·n rows through a single sort (round-10 verdict #2).
    * No global sort; the grid math stays engine-internal — the oracle
    * checks the ANSWER (direct ORDER BY/OFFSET) plus the exactness
    * witnesses n_le ≥ k > n_lt, which certify the selection
    * independently of how either engine found it.
    */
  val qExactKth: GQuery = GQuery(
    "q_agg_exact_kth",
    Some("""
      WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem),
      k AS (SELECT n, (9 * n + 9) // 10 AS k FROM n),
      direct AS (SELECT l_extendedprice AS v FROM lineitem ORDER BY l_extendedprice
                 LIMIT 1 OFFSET (SELECT k - 1 FROM k))
      SELECT k.n, CAST(k.k AS BIGINT) AS k, d.v AS kth_value,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem WHERE l_extendedprice <= d.v) AS n_le,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem WHERE l_extendedprice < d.v) AS n_lt
      FROM k, direct d""")
  ) { (spark, dir) =>
    import spark.implicits._
    val li = t(spark, dir).lineitem.select($"l_extendedprice".as("v"))
      .ckptLazy() // scanned once per grid level + the witness pass
    val n = li.count()
    val k = (9 * n + 9) / 10
    val kth = graft.operators.Selection.kthSmallest(li, "v", k)
    li.agg(
      count(lit(1)).as("n"),
      sum(when($"v" <= kth, 1L).otherwise(0L)).as("n_le"),
      sum(when($"v" < kth, 1L).otherwise(0L)).as("n_lt"))
      .select($"n", lit(k).as("k"), lit(kth).as("kth_value"), $"n_le", $"n_lt")
  }

  override def queries: Seq[GQuery] = Seq(
    qDistinct, qRollup, qCube, qGroupingSets, qConditional, qFilterClause, qCollect,
    qApproxDistinct, qMinMax, qPercentiles, qStats, qPivot, qHeavyHitters, qMedianMode,
    qHllRollup, qHllIntersect, qDiagSkew, qOutlierIqr, qBools, qRegression, qCountMin,
    qApproxQuantile, qExactKth, qWeightedMedian
  )
}
