package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Common._

/** Analytic (window) function inventory: ranking, running aggregates,
  * lag/lead, frames, top-k-per-group, distribution functions.
  *
  * Reference analog: `stream.enumerate()` (running index,
  * `examples/src/postgres-sink.rs:24`) and running counters — SURVEY.md
  * §2.4 C3/C4. The reference has no per-key ordered analytics at all
  * (§2.5); these are the Spark-native generalization.
  *
  * Scale notes: every window here partitions by a key (no global windows
  * except the explicitly-bounded top-k, which uses a rank-filter so only
  * k rows per partition survive the shuffle). Running sums use integral
  * quantities so results are FP-order-proof on both engines.
  */
object Windows extends QuerySet {

  /** Top-3 orders per customer via row_number (deterministic tie-break). */
  val qTopkPerGroup: GQuery = GQuery(
    "q_window_topk_per_group",
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, rn
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
      WHERE rn <= 3
      ORDER BY o_custkey, rn""")
  ) { (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    t(spark, dir).orders
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  /** rank / dense_rank with genuine ties (integral quantities). */
  val qRank: GQuery = GQuery(
    "q_window_rank",
    Some("""
      SELECT l_orderkey, l_linenumber,
             RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC) AS qty_rank,
             DENSE_RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC) AS qty_dense_rank
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber, qty_rank""")
  ) { (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"l_orderkey").orderBy($"l_quantity".desc)
    t(spark, dir).lineitem
      .select(
        $"l_orderkey",
        $"l_linenumber",
        rank().over(w).as("qty_rank"),
        dense_rank().over(w).as("qty_dense_rank")
      )
      .orderBy($"l_orderkey", $"l_linenumber", $"qty_rank")
  }

  /** Running sum + running count per order. (l_orderkey, l_linenumber) is
    * not unique in the synthetic data, so the window order includes
    * partkey/suppkey/extendedprice to fix a total, engine-neutral order.
    */
  val qRunning: GQuery = GQuery(
    "q_window_running_sum",
    Some("""
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice,
             SUM(l_quantity) OVER w AS running_qty,
             COUNT(*) OVER w AS running_n
      FROM lineitem
      WINDOW w AS (PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice""")
  ) { (spark, dir) =>
    import spark.implicits._
    val w = Window
      .partitionBy($"l_orderkey")
      .orderBy($"l_linenumber", $"l_partkey", $"l_suppkey", $"l_extendedprice")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir).lineitem
      .select(
        $"l_orderkey",
        $"l_linenumber",
        $"l_partkey",
        $"l_suppkey",
        $"l_extendedprice",
        sum($"l_quantity").over(w).as("running_qty"),
        count(lit(1)).over(w).as("running_n")
      )
      .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey", $"l_extendedprice")
  }

  /** lag/lead across each user's event sequence (CTable "previous value
    * per key" analog, but ordered and batch-verifiable).
    */
  val qLagLead: GQuery = GQuery(
    "q_window_lag_lead",
    Some("""
      SELECT event_id, user_id, value,
             LAG(value)  OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
             LEAD(value) OVER (PARTITION BY user_id ORDER BY event_id) AS next_value
      FROM events
      ORDER BY user_id, event_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    t(spark, dir).events
      .select(
        $"event_id",
        $"user_id",
        $"value",
        lag($"value", 1).over(w).as("prev_value"),
        lead($"value", 1).over(w).as("next_value")
      )
      .orderBy($"user_id", $"event_id")
  }

  /** Sliding frame: 3-row moving sum/count of quantity per supplier. */
  val qMovingFrame: GQuery = GQuery(
    "q_window_moving_frame",
    Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey, l_extendedprice,
             SUM(l_quantity) OVER w AS moving_qty
      FROM lineitem
      WINDOW w AS (PARTITION BY l_suppkey
                   ORDER BY l_orderkey, l_linenumber, l_partkey, l_extendedprice
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY l_suppkey, l_orderkey, l_linenumber, l_partkey, l_extendedprice""")
  ) { (spark, dir) =>
    import spark.implicits._
    val w = Window
      .partitionBy($"l_suppkey")
      .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_extendedprice")
      .rowsBetween(-2, Window.currentRow)
    t(spark, dir).lineitem
      .select(
        $"l_suppkey",
        $"l_orderkey",
        $"l_linenumber",
        $"l_partkey",
        $"l_extendedprice",
        sum($"l_quantity").over(w).as("moving_qty")
      )
      .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_partkey", $"l_extendedprice")
  }

  /** Distribution functions: ntile / percent_rank / cume_dist. */
  val qDistribution: GQuery = GQuery(
    "q_window_distribution",
    Some("""
      SELECT o_orderkey, o_orderpriority,
             NTILE(4)       OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS quartile,
             PERCENT_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS pct_rank,
             CUME_DIST()    OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS cume
      FROM orders
      ORDER BY o_orderpriority, o_orderkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice", $"o_orderkey")
    t(spark, dir).orders
      .select(
        $"o_orderkey",
        $"o_orderpriority",
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume")
      )
      .orderBy($"o_orderpriority", $"o_orderkey")
  }

  /** Global top-k with total order (sort/limit inventory entry). */
  val qTopkGlobal: GQuery = GQuery(
    "q_topk_orders",
    Some("""
      SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS orderdate
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 100""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).orders
      .select(
        $"o_orderkey",
        $"o_totalprice",
        date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate")
      )
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  /** Time-range frame: per-user trailing-1-hour event-time sum + first
    * value in the frame. Spark range frames need a numeric order column,
    * so the frame runs over epoch-µs longs (the oracle mirrors with
    * epoch_us arithmetic); the windowed sum goes through DECIMAL(38,6)
    * so frame-internal addition order can't drift the doubles.
    */
  val qRangeFrame: GQuery = GQuery(
    "q_window_range_frame",
    Some("""
      WITH e AS (SELECT event_id, user_id, value,
                        epoch_us(CAST(ts AS TIMESTAMP)) AS tsu
                 FROM events)
      SELECT event_id, user_id,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS hour_sum,
             COUNT(*) OVER w AS hour_n,
             min(event_id) OVER w AS frame_min_event
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY tsu
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, event_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.StreamOps.tsFromNanos
    val w = Window
      .partitionBy($"user_id")
      .orderBy($"tsu")
      .rangeBetween(-3600000000L, Window.currentRow)
    t(spark, dir).events
      .select(
        $"event_id", $"user_id", $"value",
        unix_micros(tsFromNanos($"ts")).as("tsu"))
      .select(
        $"event_id",
        $"user_id",
        sum($"value".cast(Common.D)).over(w).cast("double").as("hour_sum"),
        count(lit(1)).over(w).as("hour_n"),
        // min (not first_value): RANGE frames include ALL peer rows at an
        // equal order key, and first_value picks an arbitrary peer — min is
        // the deterministic choice under duplicate-microsecond ties
        min($"event_id").over(w).as("frame_min_event")
      )
      .orderBy($"user_id", $"event_id")
  }

  /** IGNORE NULLS window fills — forward fill (last non-null so far) and
    * backward fill (next non-null) per user over event time, then the
    * coalesced imputation. The missing-value repair step of feature
    * pipelines, as pure window functions: one shuffle on user_id, both
    * fill directions computed from the same sorted partition (Spark reuses
    * the sort across the two frames). Sparsity is synthesized
    * deterministically (click events' values treated as missing).
    */
  val qFillNulls: GQuery = GQuery(
    "q_window_fill_nulls",
    Some("""
      WITH e AS (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v
        FROM events)
      SELECT event_id, user_id, v,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill,
             first_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bfill,
             coalesce(v,
               last_value(v IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               first_value(v IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS imputed
      FROM e
      ORDER BY event_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val fwd = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val ffill = last($"v", ignoreNulls = true).over(fwd)
    val bfill = first($"v", ignoreNulls = true).over(bwd)
    t(spark, dir).events
      .select($"event_id", $"user_id", $"ts",
        when($"event_type" === "click", lit(null)).otherwise($"value").as("v"))
      .select($"event_id", $"user_id", $"v",
        ffill.as("ffill"), bfill.as("bfill"),
        coalesce($"v", ffill, bfill).as("imputed"))
      .orderBy($"event_id")
  }

  override def queries: Seq[GQuery] = Seq(
    qTopkPerGroup, qRank, qRunning, qLagLead, qMovingFrame, qDistribution, qTopkGlobal,
    qRangeFrame, qFillNulls
  )
}
