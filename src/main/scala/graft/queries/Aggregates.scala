package graft.queries

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

  /** HLL sketch: approximate distinct. Not SQL-oracle-able (different
    * sketch implementations) → rows-only check. At 100 TB this replaces
    * exact COUNT(DISTINCT) where a 2% error is acceptable — constant
    * memory per group instead of a distinct-expand shuffle.
    */
  val qApproxDistinct: GQuery = GQuery("q_agg_approx_distinct", None) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).lineitem
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_partkey", 0.02).as("approx_parts"),
        approx_count_distinct($"l_orderkey", 0.02).as("approx_orders")
      )
      .orderBy($"l_returnflag")
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

  override def queries: Seq[GQuery] = Seq(
    qDistinct, qRollup, qCube, qGroupingSets, qConditional, qCollect, qApproxDistinct,
    qMinMax, qPercentiles
  )
}
