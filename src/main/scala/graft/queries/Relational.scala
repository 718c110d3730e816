package graft.queries

import org.apache.spark.sql.functions._

import Common._

/** Core relational inventory: scan → filter → project → aggregate → sort,
  * plus the full join family. The reference expresses all of this in user
  * closures over Kafka streams (SURVEY.md §2.4: map `examples/src/avro-sink
  * .rs:41-50`, filter `examples/src/inmemory.rs:15-23`, counters
  * `examples/src/basic.rs:29-31`); here each is a first-class declarative
  * operator so Catalyst gets pushdown/pruning/join-selection for free.
  *
  * Scale notes: every aggregate is partial-aggregated map-side (hash
  * aggregate); small dimension tables (region/nation/supplier/part/customer)
  * are broadcast to avoid shuffling the fact table; only genuinely large-
  * by-large joins (lineitem x orders) shuffle — on both keys, once.
  */
object Relational extends QuerySet {

  /** TPC-H Q1 shape: the flagship pricing summary. */
  val q1PricingSummary: GQuery = GQuery(
    "q1_pricing_summary",
    Some(s"""
      SELECT l_returnflag, l_linestatus,
             ${sqlSum("l_quantity")} AS sum_qty,
             ${sqlSum("l_extendedprice")} AS sum_base_price,
             ${sqlSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
             ${sqlSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
             ${sqlAvg("l_quantity")} AS avg_qty,
             ${sqlAvg("l_extendedprice")} AS avg_price,
             ${sqlAvg("l_discount")} AS avg_disc,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).lineitem
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"))
          .as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order")
      )
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** TPC-H Q6 shape: tight filter + single global aggregate. Exercises
    * predicate pushdown — all three predicates reach the parquet scan.
    */
  val q6Revenue: GQuery = GQuery(
    "q6_forecast_revenue",
    Some(s"""
      SELECT ${sqlSum("l_extendedprice * l_discount")} AS revenue,
             COUNT(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.02 AND 0.06
        AND l_quantity < 24""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).lineitem
      .filter(
        $"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
          $"l_discount".between(0.02, 0.06) && $"l_quantity" < 24
      )
      .agg(
        dsum($"l_extendedprice" * $"l_discount").as("revenue"),
        count(lit(1)).as("n")
      )
  }

  /** TPC-H Q3 shape: 3-way join, filter both sides, group, top-10.
    * customer is broadcast; orders x lineitem shuffle on the join key.
    */
  val q3ShippingPriority: GQuery = GQuery(
    "q3_shipping_priority",
    Some(s"""
      SELECT l_orderkey,
             ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue,
             strftime(o_orderdate, '%Y-%m-%d') AS orderdate
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-03-15'
        AND l_shipdate > TIMESTAMP '1996-03-15'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    tt.customer
      .filter($"c_mktsegment" === "BUILDING")
      .join(tt.orders, $"c_custkey" === $"o_custkey")
      .filter($"o_orderdate" < lit("1998-03-15").cast("timestamp"))
      .join(
        tt.lineitem.filter($"l_shipdate" > lit("1996-03-15").cast("timestamp")),
        $"l_orderkey" === $"o_orderkey"
      )
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .select($"l_orderkey", $"revenue", date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  /** TPC-H Q5 shape: 6-way star join (region→nation→customer/supplier,
    * orders→lineitem) with local-supplier predicate. Dimensions broadcast.
    */
  val q5LocalSupplier: GQuery = GQuery(
    "q5_local_supplier_volume",
    Some(s"""
      SELECT n_name,
             ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    tt.customer
      .join(
        tt.orders.filter(
          $"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1998-01-01").cast("timestamp")
        ),
        $"c_custkey" === $"o_custkey"
      )
      .join(tt.lineitem, $"l_orderkey" === $"o_orderkey")
      .join(
        broadcast(tt.supplier),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey"
      )
      .join(broadcast(tt.nation), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(tt.region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** Broadcast-hash inner join: fact x small dim with explicit hint. */
  val qJoinBroadcast: GQuery = GQuery(
    "q_join_broadcast_inner",
    Some(s"""
      SELECT p_brand,
             ${sqlSum("l_quantity")} AS total_qty,
             COUNT(*) AS n_lines
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
      ORDER BY p_brand""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    tt.lineitem
      .join(broadcast(tt.part), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(dsum($"l_quantity").as("total_qty"), count(lit(1)).as("n_lines"))
      .orderBy($"p_brand")
  }

  /** Left outer join: every customer, order count 0 where no orders. */
  val qJoinLeft: GQuery = GQuery(
    "q_join_left_outer",
    Some("""
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
      ORDER BY c_custkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    tt.customer
      .join(tt.orders, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("n_orders"))
      .orderBy($"c_custkey")
  }

  /** Left-semi join (EXISTS): customers that placed a high-value order. */
  val qJoinSemi: GQuery = GQuery(
    "q_join_semi",
    Some("""
      SELECT c_custkey, c_name
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 100000)
      ORDER BY c_custkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    tt.customer
      .join(
        tt.orders.filter($"o_totalprice" > 100000),
        $"c_custkey" === $"o_custkey",
        "left_semi"
      )
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Left-anti join (NOT EXISTS): customers that never placed an urgent
    * order.
    */
  val qJoinAnti: GQuery = GQuery(
    "q_join_anti",
    Some("""
      SELECT c_custkey, c_name
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    tt.customer
      .join(
        tt.orders.filter($"o_orderpriority" === "1-URGENT"),
        $"c_custkey" === $"o_custkey",
        "left_anti"
      )
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Full outer join of two aggregates: customer count vs supplier count
    * per nation (either side may be missing).
    */
  val qJoinFull: GQuery = GQuery(
    "q_join_full_outer",
    Some("""
      SELECT COALESCE(c.nk, s.nk) AS nationkey,
             COALESCE(c.n_cust, 0) AS n_cust,
             COALESCE(s.n_supp, 0) AS n_supp
      FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
      FULL OUTER JOIN
           (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
      ON c.nk = s.nk
      ORDER BY nationkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    val c = tt.customer.groupBy($"c_nationkey".as("nk")).agg(count(lit(1)).as("n_cust"))
    val s = tt.supplier.groupBy($"s_nationkey".as("nk")).agg(count(lit(1)).as("n_supp"))
    c.join(s, c("nk") === s("nk"), "full_outer")
      .select(
        coalesce(c("nk"), s("nk")).as("nationkey"),
        coalesce($"n_cust", lit(0L)).as("n_cust"),
        coalesce($"n_supp", lit(0L)).as("n_supp")
      )
      .orderBy($"nationkey")
  }

  /** Theta join: equi key + non-equi residual (price above retail). */
  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): null keys
    * MATCH each other instead of dropping — the semantics needed when a
    * "bucket" key legitimately contains an unknown class. Keys with nulls
    * are synthesized from events (every user_id ending in 5 degrades to
    * null) and joined null-safely to a dim that includes a null row.
    */
  val qJoinNullSafe: GQuery = GQuery(
    "q_join_null_safe",
    Some(s"""
      WITH e AS (SELECT event_id, value,
                        nullif(user_id % 10, 5) AS bucket
                 FROM events),
      dim(bucket, label) AS (VALUES
        (0, 'b0'), (1, 'b1'), (2, 'b2'), (3, 'b3'), (4, 'b4'),
        (6, 'b6'), (7, 'b7'), (8, 'b8'), (9, 'b9'), (NULL, 'unknown'))
      SELECT d.label,
             COUNT(*) AS n,
             ${sqlSum("e.value")} AS total
      FROM e JOIN dim d ON e.bucket IS NOT DISTINCT FROM d.bucket
      GROUP BY d.label
      ORDER BY d.label""")
  ) { (spark, dir) =>
    import spark.implicits._
    val ev = t(spark, dir).events
      .select($"event_id", $"value", nullif($"user_id" % 10, lit(5)).as("bucket"))
    val dim = Seq(
      Some(0L) -> "b0", Some(1L) -> "b1", Some(2L) -> "b2", Some(3L) -> "b3",
      Some(4L) -> "b4", Some(6L) -> "b6", Some(7L) -> "b7", Some(8L) -> "b8",
      Some(9L) -> "b9", (None: Option[Long]) -> "unknown"
    ).toDF("d_bucket", "label")
    ev.join(dim, $"bucket" <=> $"d_bucket")
      .groupBy($"label")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total"))
      .orderBy($"label")
  }

  /** Unpivot (wide → long, the inverse of q_agg_pivot): per-returnflag
    * metric columns melted into (flag, metric, value) rows via
    * `Dataset.unpivot`; the oracle is the portable UNION ALL formulation.
    */
  val qUnpivot: GQuery = GQuery(
    "q_agg_unpivot",
    Some(s"""
      WITH w AS (
        SELECT l_returnflag,
               ${sqlSum("l_quantity")} AS sum_qty,
               ${sqlSum("l_extendedprice")} AS sum_price,
               CAST(COUNT(*) AS DOUBLE) AS n_rows
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, metric, value FROM (
        SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
        UNION ALL
        SELECT l_returnflag, 'sum_price', sum_price FROM w
        UNION ALL
        SELECT l_returnflag, 'n_rows', n_rows FROM w)
      ORDER BY l_returnflag, metric""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).lineitem
      .groupBy($"l_returnflag")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_price"),
        count(lit(1)).cast("double").as("n_rows")
      )
      .unpivot(
        ids = Array($"l_returnflag"),
        values = Array($"sum_qty", $"sum_price", $"n_rows"),
        variableColumnName = "metric",
        valueColumnName = "value")
      .orderBy($"l_returnflag", $"metric")
  }

  val qJoinTheta: GQuery = GQuery(
    "q_join_theta",
    Some("""
      SELECT p_brand, COUNT(*) AS n_above_retail
      FROM lineitem JOIN part
        ON l_partkey = p_partkey AND l_extendedprice > 10 * p_retailprice
      GROUP BY p_brand
      ORDER BY p_brand""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    tt.lineitem
      .join(
        broadcast(tt.part),
        $"l_partkey" === $"p_partkey" && $"l_extendedprice" > lit(10.0) * $"p_retailprice"
      )
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_above_retail"))
      .orderBy($"p_brand")
  }

  /** Interval (event-time range) join — the batch analog of the
    * watermarked stream-stream join (StreamOps.streamJoin): purchases
    * matched to the same user's clicks within the following hour. Both
    * sides truncate ts to µs so boundary arithmetic agrees with the
    * oracle; the join is equi-key (user_id) + time-range residual, which
    * is exactly the state-evictable shape streaming requires.
    */
  val qJoinInterval: GQuery = GQuery(
    "q_join_interval",
    Some("""
      WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events)
      SELECT p.user_id,
             p.event_id AS purchase_id,
             COUNT(c.event_id) AS clicks_within_1h
      FROM (SELECT * FROM e WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT * FROM e WHERE event_type = 'click') c
        ON p.user_id = c.user_id
       AND c.ts > p.ts AND c.ts <= p.ts + INTERVAL 1 HOUR
      GROUP BY 1, 2
      ORDER BY 1, 2""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.StreamOps.tsFromNanos
    val ev = t(spark, dir).events.select(
      $"user_id", $"event_id", $"event_type", tsFromNanos($"ts").as("ts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("p_ts"))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"event_id".as("click_id"), $"ts".as("c_ts"))
    p.join(
        c,
        $"user_id" === $"c_user" &&
          $"c_ts" > $"p_ts" && $"c_ts" <= $"p_ts" + expr("INTERVAL 1 HOUR"),
        "left_outer"
      )
      .groupBy($"user_id", $"purchase_id")
      .agg(count($"click_id").as("clicks_within_1h"))
      .orderBy($"user_id", $"purchase_id")
  }

  /** As-of join: each purchase gets the user's most recent click at or
    * before the purchase time, through the engine's custom whole-operator
    * plan (graft.plans.AsofJoin → sorted-merge AsofJoinExec; the
    * union+window composition in [[graft.operators.Joins.asOfJoin]] is the
    * cross-checked fallback). Oracle uses DuckDB's native ASOF LEFT JOIN —
    * a genuinely independent third formulation.
    */
  val qJoinAsof: GQuery = GQuery(
    "q_join_asof",
    Some("""
      WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      p AS (SELECT user_id, event_id AS purchase_id, ts FROM e WHERE event_type = 'purchase'),
      -- collapse same-(user, ts) clicks to the max id: DuckDB's ASOF picks an
      -- ARBITRARY row among equal-ts matches, the engine's exec picks the max
      -- payload deterministically -- pre-collapsing makes both well-defined
      c AS (SELECT user_id, ts, max(event_id) AS click_id
            FROM e WHERE event_type = 'click' GROUP BY user_id, ts)
      SELECT p.user_id, p.purchase_id, c.click_id AS last_click_id
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.user_id, p.purchase_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.StreamOps.tsFromNanos
    val ev = t(spark, dir).events.select(
      $"user_id", $"event_id", $"event_type", tsFromNanos($"ts").as("ts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts")
    val c = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts")
      .agg(max($"event_id").as("click_id"))
    graft.operators.Joins
      .asOfJoinNative(p, c, key = "user_id", tsCol = "ts", payload = Seq("click_id"))
      .select($"user_id", $"purchase_id", $"click_id".as("last_click_id"))
      .orderBy($"user_id", $"purchase_id")
  }

  /** Broadcast as-of: identical semantics and oracle as q_join_asof, but
    * through [[graft.operators.Joins.asOfJoinBroadcast]] — the clicks side
    * is collected/broadcast and each purchase binary-searches in place,
    * zero exchanges (JoinsSpec asserts the plan). The same DuckDB ASOF
    * oracle checking BOTH paths proves shuffled and broadcast plans agree.
    */
  val qJoinAsofBroadcast: GQuery = GQuery(
    "q_join_asof_broadcast",
    Some("""
      WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      p AS (SELECT user_id, event_id AS purchase_id, ts FROM e WHERE event_type = 'purchase'),
      c AS (SELECT user_id, ts, max(event_id) AS click_id
            FROM e WHERE event_type = 'click' GROUP BY user_id, ts)
      SELECT p.user_id, p.purchase_id, c.click_id AS last_click_id
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.user_id, p.purchase_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.StreamOps.tsFromNanos
    val ev = t(spark, dir).events.select(
      $"user_id", $"event_id", $"event_type", tsFromNanos($"ts").as("ts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts")
    val c = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts")
      .agg(max($"event_id").as("click_id"))
    graft.operators.Joins
      .asOfJoinBroadcast(p, c, key = "user_id", tsCol = "ts", payload = Seq("click_id"))
      .select($"user_id", $"purchase_id", $"click_id".as("last_click_id"))
      .orderBy($"user_id", $"purchase_id")
  }

  /** Forward as-of with tolerance: each click gets the user's NEXT
    * purchase within one hour (conversion attribution). Exercises the
    * custom exec's forward direction + tolerance; the oracle states the
    * same semantics independently via a ranked range join.
    */
  val qJoinAsofForward: GQuery = GQuery(
    "q_join_asof_forward",
    Some("""
      WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      c AS (SELECT user_id, event_id AS click_id, ts FROM e WHERE event_type = 'click'),
      p AS (SELECT user_id, event_id AS purchase_id, ts FROM e WHERE event_type = 'purchase'),
      cand AS (
        SELECT c.click_id, p.purchase_id,
               ROW_NUMBER() OVER (PARTITION BY c.click_id
                                  ORDER BY p.ts, p.purchase_id) AS rn
        FROM c JOIN p ON p.user_id = c.user_id
                     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR)
      SELECT c.user_id, c.click_id, f.purchase_id AS next_purchase_id
      FROM c LEFT JOIN (SELECT click_id, purchase_id FROM cand WHERE rn = 1) f
        ON c.click_id = f.click_id
      ORDER BY c.user_id, c.click_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.StreamOps.tsFromNanos
    val ev = t(spark, dir).events.select(
      $"user_id", $"event_id", $"event_type", tsFromNanos($"ts").as("ts"))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts")
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts")
    graft.operators.Joins
      .asOfJoinNative(
        c, p, key = "user_id", tsCol = "ts", payload = Seq("purchase_id"),
        direction = "forward", toleranceMicros = Some(3600L * 1000000L))
      .select($"user_id", $"click_id", $"purchase_id".as("next_purchase_id"))
      .orderBy($"user_id", $"click_id")
  }

  /** NEAREST as-of with tolerance (pandas merge_asof direction='nearest'
    * parity): each purchase gets the user's closest click within ±1 hour,
    * ties resolving backward — composed from the custom exec's two
    * directions (one backward + one forward sorted-merge pass, then a
    * row-local pick), never a range join. The oracle states the same
    * semantics independently via a ranked |Δt| candidate join. Clicks are
    * pre-collapsed to one row per (user_id, ts) — max event_id, exactly
    * as q_join_asof — on BOTH sides: without the collapse the exec's
    * equal-ts tie rule (greatest payload backward / smallest forward)
    * and the oracle's ROW_NUMBER min-click_id tie-break diverge on
    * duplicate-timestamp clicks.
    */
  val qJoinAsofNearest: GQuery = GQuery(
    "q_join_asof_nearest",
    Some("""
      WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      c AS (SELECT user_id, ts, max(event_id) AS click_id
            FROM e WHERE event_type = 'click' GROUP BY user_id, ts),
      p AS (SELECT user_id, event_id AS purchase_id, ts FROM e WHERE event_type = 'purchase'),
      cand AS (
        SELECT p.purchase_id, c.click_id,
               abs(epoch_us(p.ts) - epoch_us(c.ts)) AS gap,
               ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                 ORDER BY abs(epoch_us(p.ts) - epoch_us(c.ts)),
                          CASE WHEN epoch_us(c.ts) <= epoch_us(p.ts) THEN 0 ELSE 1 END,
                          c.click_id) AS rn
        FROM p JOIN c ON c.user_id = p.user_id
                     AND abs(epoch_us(p.ts) - epoch_us(c.ts)) <= 3600000000)
      SELECT p.user_id, p.purchase_id,
             f.click_id AS nearest_click_id,
             f.gap AS nearest_gap_us
      FROM p LEFT JOIN (SELECT purchase_id, click_id, CAST(gap AS BIGINT) AS gap
                        FROM cand WHERE rn = 1) f
        ON f.purchase_id = p.purchase_id
      ORDER BY p.user_id, p.purchase_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.StreamOps.tsFromNanos
    val ev = t(spark, dir).events.select(
      $"user_id", $"event_id", $"event_type", tsFromNanos($"ts").as("ts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts")
    val c = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts")
      .agg(max($"event_id").as("click_id"))
      .select($"user_id", $"click_id", $"ts", unix_micros($"ts").as("c_us"))
    val tol = 3600L * 1000000L
    val back = graft.operators.Joins
      .asOfJoinNative(p, c, key = "user_id", tsCol = "ts",
        payload = Seq("click_id", "c_us"), direction = "backward",
        toleranceMicros = Some(tol))
      .select($"purchase_id", $"click_id".as("b_id"), $"c_us".as("b_us"))
    val fwd = graft.operators.Joins
      .asOfJoinNative(p, c, key = "user_id", tsCol = "ts",
        payload = Seq("click_id", "c_us"), direction = "forward",
        toleranceMicros = Some(tol))
      .select($"purchase_id", $"click_id".as("f_id"), $"c_us".as("f_us"))
    val gapB = unix_micros($"ts") - $"b_us"
    val gapF = $"f_us" - unix_micros($"ts")
    p.join(back, Seq("purchase_id"), "left")
      .join(fwd, Seq("purchase_id"), "left")
      .select(
        $"user_id", $"purchase_id",
        // ties go backward (<=) — pandas 'nearest' parity
        when($"b_id".isNotNull && ($"f_id".isNull || gapB <= gapF), $"b_id")
          .otherwise($"f_id").as("nearest_click_id"),
        when($"b_id".isNotNull && ($"f_id".isNull || gapB <= gapF), gapB)
          .otherwise(gapF).as("nearest_gap_us"))
      .orderBy($"user_id", $"purchase_id")
  }

  /** Salted skew join: events (hot 5-value key) x an unbroadcast-worthy
    * dim, split across 8 salts (see [[graft.operators.Joins.saltedJoin]]).
    * The oracle replays the plain unsalted join — same result by
    * construction, which is exactly the property salting must preserve.
    */
  val qJoinSalted: GQuery = GQuery(
    "q_join_salted_skew",
    Some(s"""
      WITH dim(event_type, weight) AS (VALUES
        ('click', 1.0), ('view', 0.5), ('purchase', 5.0),
        ('error', 0.0), ('signup', 2.0))
      SELECT e.event_type,
             COUNT(*) AS n_events,
             ${sqlSum("e.value * CAST(d.weight AS DOUBLE)")} AS weighted_value
      FROM events e JOIN dim d ON e.event_type = d.event_type
      GROUP BY 1
      ORDER BY 1""")
  ) { (spark, dir) =>
    import spark.implicits._
    val dim = Seq(
      ("click", 1.0), ("view", 0.5), ("purchase", 5.0),
      ("error", 0.0), ("signup", 2.0)
    ).toDF("event_type", "weight")
    val ev = t(spark, dir).events.select($"event_id", $"event_type", $"value")
    graft.operators.Joins
      .saltedJoin(ev, dim, key = "event_type", saltFrom = "event_id", nSalts = 8)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        dsum($"value" * $"weight").as("weighted_value")
      )
      .orderBy($"event_type")
  }

  /** Explicit cross join (dim × dim): every (region, nation) combination
    * with a membership flag. Cross joins are legitimate ONLY when at least
    * one side is tiny and broadcast — Spark requires the explicit
    * `crossJoin` API precisely so an accidental cartesian can't hide in a
    * typo'd join condition (at 100 TB an unintended cross join is dead).
    */
  val qJoinCross: GQuery = GQuery(
    "q_join_cross",
    Some("""
      SELECT r.r_name, n.n_name,
             CASE WHEN n.n_regionkey = r.r_regionkey THEN 1 ELSE 0 END AS is_member
      FROM region r CROSS JOIN nation n
      ORDER BY r.r_name, n.n_name""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    tt.region
      .crossJoin(broadcast(tt.nation))
      .select(
        $"r_name",
        $"n_name",
        when($"n_regionkey" === $"r_regionkey", 1).otherwise(0).as("is_member")
      )
      .orderBy($"r_name", $"n_name")
  }

  /** Keyless range join through [[graft.operators.Joins.rangeJoinBinned]]:
    * orders classified into OVERLAPPING price bands (50% overlap, so this
    * is a genuine range join, not bucketing — a row can land in two
    * bands). No equi key exists, so the naive plan is BroadcastNestedLoop /
    * cartesian; the binned rewrite turns it into one shuffled equi-join on
    * the bin id (PlanSpec asserts no BNLJ even with broadcast disabled).
    * Oracle states the range predicate directly — independent plan, same
    * rows.
    */
  val qJoinRangeBinned: GQuery = GQuery(
    "q_join_range_binned",
    Some("""
      WITH p AS (SELECT CAST(floor(o_totalprice) AS BIGINT) AS v FROM orders),
           b AS (SELECT CAST(range AS BIGINT) AS band_id,
                        CAST(range * 10000 AS BIGINT) AS lo,
                        CAST(range * 10000 + 14999 AS BIGINT) AS hi
                 FROM range(0, 60))
      SELECT b.band_id,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(p.v) AS BIGINT) AS sum_v
      FROM p JOIN b ON p.v >= b.lo AND p.v <= b.hi
      GROUP BY 1
      ORDER BY 1""")
  ) { (spark, dir) =>
    import spark.implicits._
    val p = t(spark, dir).orders
      .select(floor($"o_totalprice").cast("long").as("v"))
    val bands = spark
      .range(0, 60)
      .select(
        $"id".as("band_id"),
        ($"id" * 10000L).cast("long").as("lo"),
        ($"id" * 10000L + 14999L).cast("long").as("hi"))
    graft.operators.Joins
      .rangeJoinBinned(p, bands, "v", "lo", "hi", binWidth = 5000L)
      .groupBy($"band_id")
      .agg(count(lit(1)).as("n_orders"), sum($"v").as("sum_v"))
      .orderBy($"band_id")
  }

  /** Interval × interval OVERLAP join
    * ([[graft.operators.Joins.intervalOverlapJoinBinned]]): each event
    * owns a processing window (1–20 min, deterministic from its id);
    * find every overlapping window pair across the even/odd split —
    * concurrent-span detection, the join shape behind session-collision
    * and in-transit-conflict analyses. No equi key: the naive plan is a
    * nested loop; the binned rewrite double-explodes into 10-min bins,
    * joins equi on bin, and emits each pair only in the overlap's START
    * bin — exactly-once without a dedup shuffle. The oracle states the
    * overlap predicate directly (independent nested-loop plan, same
    * rows), so the hash match proves the canonical-bin dedup loses and
    * duplicates nothing.
    */
  val qJoinIntervalOverlap: GQuery = GQuery(
    "q_join_interval_overlap",
    Some("""
      WITH e AS (SELECT event_id, epoch_us(ts) AS lo,
                        epoch_us(ts) + (event_id % 20 + 1) * 60000000 AS hi
                 FROM events),
      a AS (SELECT event_id AS id_a, lo AS lo_a, hi AS hi_a FROM e WHERE event_id % 2 = 0),
      b AS (SELECT event_id AS id_b, lo AS lo_b, hi AS hi_b FROM e WHERE event_id % 2 = 1)
      SELECT id_a, id_b,
             CAST(least(hi_a, hi_b) - greatest(lo_a, lo_b) AS BIGINT) AS overlap_us
      FROM a JOIN b ON lo_a <= hi_b AND lo_b <= hi_a
      ORDER BY id_a, id_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    val e = t(spark, dir).events
      .select($"event_id", expr("ts div 1000").as("lo"))
      .withColumn("hi", $"lo" + ($"event_id" % 20 + 1) * 60000000L)
    val a = e.filter($"event_id" % 2 === 0)
      .select($"event_id".as("id_a"), $"lo".as("lo_a"), $"hi".as("hi_a"))
    val b = e.filter($"event_id" % 2 === 1)
      .select($"event_id".as("id_b"), $"lo".as("lo_b"), $"hi".as("hi_b"))
    graft.operators.Joins
      .intervalOverlapJoinBinned(a, b, "lo_a", "hi_a", "lo_b", "hi_b", binWidth = 600000000L)
      .select(
        $"id_a", $"id_b",
        (least($"hi_a", $"hi_b") - greatest($"lo_a", $"lo_b")).as("overlap_us"))
      .orderBy($"id_a", $"id_b")
  }

  /** Bloom-filter semi-join reduction ([[graft.operators.Joins.bloomSemiJoin]]):
    * lineitems of high-value urgent orders. The probe side is cut by the
    * dim-key sketch BEFORE the shuffle; the exact join then removes the
    * sketch's false positives, so the result equals the plain left-semi
    * join — which is exactly what the oracle checks.
    */
  val qJoinBloomSemi: GQuery = GQuery(
    "q_join_bloom_semi",
    Some("""
      SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
      FROM lineitem
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_orderkey = l_orderkey
                      AND o_totalprice > 150000 AND o_orderpriority = '1-URGENT')
      GROUP BY 1
      ORDER BY 1""")
  ) { (spark, dir) =>
    import spark.implicits._
    val dim = t(spark, dir).orders
      .filter($"o_totalprice" > 150000 && $"o_orderpriority" === "1-URGENT")
    graft.operators.Joins
      .bloomSemiJoin(
        t(spark, dir).lineitem, "l_orderkey",
        dim, "o_orderkey",
        expectedItems = 1000000L, fpp = 0.01)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag")
  }

  /** TPC-H Q10 shape: revenue lost to returned items per customer —
    * 4-way join (customer × nation × orders × lineitem), returnflag
    * filter pushed to the lineitem scan, top-20 by revenue. The classic
    * "big fact filtered then joined up a dimension chain" plan: nation
    * and customer broadcast, one shuffle on the order key.
    */
  val q10ReturnedRevenue: GQuery = GQuery(
    "q10_returned_revenue",
    Some(s"""
      SELECT c_custkey, c_name, n_name,
             ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue,
             COUNT(*) AS n_items
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN orders ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    tt.customer
      .join(tt.nation, $"c_nationkey" === $"n_nationkey")
      .join(tt.orders, $"o_custkey" === $"c_custkey")
      .join(tt.lineitem.filter($"l_returnflag" === "R"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"c_custkey", $"c_name", $"n_name")
      .agg(
        dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** TPC-H Q14 shape: promo revenue share — a conditional-aggregate RATIO
    * over a fact × dimension join in one pass (no second scan for the
    * denominator). Exact decimal sums divided once in double keep the
    * ratio bit-reproducible cross-engine.
    */
  val q14PromoShare: GQuery = GQuery(
    "q14_promo_share",
    Some(s"""
      SELECT ${sqlSum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
               / ${sqlSum("l_extendedprice * (1 - l_discount)")} AS promo_share,
             COUNT(*) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-07-01'""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    val rev = $"l_extendedprice" * (lit(1) - $"l_discount")
    tt.lineitem
      .filter(
        $"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1996-07-01").cast("timestamp"))
      .join(tt.part, $"l_partkey" === $"p_partkey")
      .agg(
        (dsum(when($"p_type".startsWith("PROMO"), rev).otherwise(lit(0.0))) /
          dsum(rev)).as("promo_share"),
        count(lit(1)).as("n"))
  }

  /** TPC-H Q19 shape: DISJUNCTIVE join predicate — an OR of AND-brackets
    * mixing both sides' columns. The planner must still run an equi-join
    * on the part key (the OR brackets share it) and evaluate the residual
    * disjunction post-join; the common-key extraction is exactly what
    * keeps this off a nested-loop plan. Brackets adapted to this
    * corpus's columns (brand/size/quantity bands).
    */
  val q19Disjunctive: GQuery = GQuery(
    "q19_disjunctive_pushdown",
    Some(s"""
      SELECT ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue,
             COUNT(*) AS n
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    tt.lineitem
      .join(tt.part, $"p_partkey" === $"l_partkey" && (
        ($"p_brand" === "Brand#1" && $"p_size".between(1, 15) && $"l_quantity".between(1, 20)) ||
        ($"p_brand" === "Brand#2" && $"p_size".between(10, 30) && $"l_quantity".between(10, 35)) ||
        ($"p_brand" === "Brand#3" && $"p_size".between(20, 50) && $"l_quantity".between(20, 50))))
      .agg(
        dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n"))
  }

  /** TPC-H Q13 shape: customer order-count DISTRIBUTION — a left-outer
    * join whose ON clause carries a right-side-only filter (so customers
    * with zero qualifying orders still appear, counted as 0), then a
    * second aggregation over the first's result. The two groupBys shuffle
    * on different keys (custkey, then c_count) but the second input is one
    * row per customer — at 100 TB the first aggregate has already
    * collapsed the fact table, so the distribution step is tiny.
    */
  val q13CustDist: GQuery = GQuery(
    "q13_custdist",
    Some("""
      WITH co AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey)
      SELECT c_count, COUNT(*) AS custdist
      FROM co
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    tt.customer
      .join(
        tt.orders.filter($"o_orderpriority" =!= "1-URGENT"),
        $"c_custkey" === $"o_custkey",
        "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  /** TPC-H Q22 shape: GLOBAL-scalar threshold + anti join — customers
    * above the positive-balance average with no URGENT order (every
    * customer in this corpus has ordered, so the anti-join arm is pinned
    * to the urgent subset to stay non-vacuous), bucketed by a derived
    * country code. The scalar average is a one-row broadcast (exact
    * decimal sum ÷ count, divided once in double so the threshold
    * comparison is bit-identical cross-engine); the "no urgent order"
    * gate is a left-anti join on the filtered orders key set.
    */
  val q22NoOrders: GQuery = GQuery(
    "q22_global_threshold_anti",
    Some(s"""
      WITH avg_bal AS (
        SELECT ${sqlAvg("c_acctbal")} AS a FROM customer WHERE c_acctbal > 0.0)
      SELECT c_nationkey % 5 AS cntrycode,
             COUNT(*) AS numcust,
             ${sqlSum("c_acctbal")} AS totacctbal
      FROM customer, avg_bal
      WHERE c_acctbal > a
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
      GROUP BY 1
      ORDER BY 1""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    val avgBal = tt.customer.filter($"c_acctbal" > 0.0).agg(davg($"c_acctbal").as("a"))
    tt.customer
      .join(broadcast(avgBal))
      .filter($"c_acctbal" > $"a")
      .join(
        tt.orders.filter($"o_orderpriority" === "1-URGENT"),
        $"o_custkey" === $"c_custkey",
        "left_anti")
      .groupBy(($"c_nationkey" % 5).as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), dsum($"c_acctbal").as("totacctbal"))
      .orderBy($"cntrycode")
  }

  /** TPC-H Q11 shape: value CONCENTRATION — per-supplier revenue kept only
    * where it exceeds a fraction of the GLOBAL total. Per-group sums stay
    * exact DECIMAL(38,6) through both aggregation levels (summing the
    * already-cast doubles would reintroduce order-dependence); the single
    * double division happens once, identically, on both engines. The
    * global total is a one-row broadcast against the per-supplier
    * aggregate — no second fact-table scan.
    */
  val q11ValueShare: GQuery = GQuery(
    "q11_value_concentration",
    Some("""
      WITH sup AS (
        SELECT l_suppkey,
               SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS rev_d
        FROM lineitem
        GROUP BY l_suppkey),
      tot AS (SELECT CAST(SUM(rev_d) AS DOUBLE) AS total FROM sup)
      SELECT l_suppkey, CAST(rev_d AS DOUBLE) AS revenue
      FROM sup, tot
      WHERE CAST(rev_d AS DOUBLE) > total * CAST(0.001 AS DOUBLE)
      ORDER BY revenue DESC, l_suppkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    val sup = tt.lineitem
      .groupBy($"l_suppkey")
      .agg(sum(($"l_extendedprice" * (lit(1) - $"l_discount")).cast(D)).as("rev_d"))
    val total = sup.agg(sum($"rev_d").cast("double").as("total"))
    sup
      .join(broadcast(total))
      .filter($"rev_d".cast("double") > $"total" * lit(0.001))
      .select($"l_suppkey", $"rev_d".cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"l_suppkey")
  }

  /** TPC-H Q18 shape: large-quantity orders — a HAVING-gated key set
    * (orders whose total quantity clears a threshold) semi-joins the
    * orders table BEFORE the customer/lineitem joins, so only qualifying
    * orders flow through the wide join. The threshold comparison is exact
    * (DECIMAL sum vs integer literal); ties in the final ordering are
    * broken by the unique order key.
    */
  val q18LargeOrders: GQuery = GQuery(
    "q18_large_orders",
    Some("""
      WITH big AS (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 95)
      SELECT c_custkey, o_orderkey,
             o_totalprice AS totalprice,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderkey IN (SELECT l_orderkey FROM big)
      GROUP BY c_custkey, o_orderkey, o_totalprice
      ORDER BY totalprice DESC, o_orderkey
      LIMIT 50""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    val big = tt.lineitem
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity".cast(D)).as("q"))
      .filter($"q" > 95)
      .select($"l_orderkey".as("o_orderkey"))
    tt.orders
      .join(big, Seq("o_orderkey"), "left_semi")
      .join(tt.customer, $"c_custkey" === $"o_custkey")
      .join(tt.lineitem, $"o_orderkey" === $"l_orderkey")
      .groupBy($"c_custkey", $"o_orderkey", $"o_totalprice")
      .agg(sum($"l_quantity".cast(D)).cast("double").as("total_qty"))
      .select(
        $"c_custkey", $"o_orderkey",
        $"o_totalprice".as("totalprice"), $"total_qty")
      .orderBy($"totalprice".desc, $"o_orderkey")
      .limit(50)
  }

  /** 2-D grid-bucketed radius join (the spatial tier of the binned-join
    * family — [[qJoinRangeBinned]] is its 1-D sibling): every center
    * finds the points inside its L∞ ball of radius r plus its nearest
    * point, WITHOUT a theta join. Points bucket once into r-sized grid
    * cells; each center probes only its 3×3 neighbor cells (the ball of
    * a center in cell g is contained in cells g±1), so the join is equi
    * on (gx, gy) and linear in points — the standard spatial-join shape
    * that survives 100 TB where abs(x−cx) ≤ r theta joins explode.
    * Coordinates are integer multiplicative scatters of the keys
    * (portable arithmetic, no engine hash); the nearest pick encodes
    * (chebyshev, key) into ONE exact BIGINT d·10⁸+key so the argmin is
    * integer MIN on both engines. The oracle replays SEMANTICS as the
    * direct theta join — the gate proves the grid plan computes exactly
    * the ball predicate.
    *
    * The coordinate space side M scales as √(n_customers) —
    * M = max(1000003, ⌊√(n/15000)·1000003⌋) — so point DENSITY (and
    * with it hits-per-center) is constant as the corpus grows: with a
    * fixed modulus the join output grows quadratically by geometry
    * alone and the ScaleStress decade exponent reads output growth,
    * not plan behavior. At every real SF n ≤ 15000, so M clamps to
    * exactly 1000003 (sf0.1 has exactly 15000 customers → √1·1000003);
    * the decade tiers hit n/15000 ∈ {10, 100} whose √ products are
    * IEEE-exact, so both engines agree on M with zero boundary risk
    * (every step is one correctly-rounded op over exact inputs).
    */
  val qJoinSpatialGrid: GQuery = GQuery(
    "q_join_spatial_grid",
    Some("""
      WITH msp AS (
        SELECT GREATEST(1000003, CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)
                 / CAST(15000 AS DOUBLE)) * CAST(1000003 AS DOUBLE)) AS BIGINT)) AS m
        FROM customer),
      p AS (
        SELECT c_custkey,
               (c_custkey * 2654435761) % msp.m AS x,
               (c_custkey * 97006721) % msp.m AS y
        FROM customer, msp),
      s AS (
        SELECT s_suppkey,
               (s_suppkey * 48271 + 777771) % msp.m AS cx,
               (s_suppkey * 16807 + 333667) % msp.m AS cy
        FROM supplier, msp),
      hits AS (
        SELECT s.s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_in_radius,
               MIN(greatest(abs(p.x - s.cx), abs(p.y - s.cy)) * 100000000
                   + p.c_custkey) AS code
        FROM s JOIN p ON abs(p.x - s.cx) <= 20000 AND abs(p.y - s.cy) <= 20000
        GROUP BY 1)
      SELECT s.s_suppkey, s.cx, s.cy,
             COALESCE(h.n_in_radius, CAST(0 AS BIGINT)) AS n_in_radius,
             COALESCE(h.code // 100000000, CAST(-1 AS BIGINT)) AS nearest_dist,
             COALESCE(h.code % 100000000, CAST(-1 AS BIGINT)) AS nearest_custkey
      FROM s LEFT JOIN hits h ON h.s_suppkey = s.s_suppkey
      ORDER BY s.s_suppkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    val r = 20000L
    // one driver scalar (the q_graph_sssp precedent): the adaptive space
    // side — identical correctly-rounded arithmetic to the oracle's msp CTE
    val nc = t(spark, dir).customer.count()
    val m = math.max(1000003L, math.floor(math.sqrt(nc / 15000.0) * 1000003.0).toLong)
    val pts = t(spark, dir).customer.select(
      $"c_custkey",
      (($"c_custkey" * 2654435761L) % m).as("x"),
      (($"c_custkey" * 97006721L) % m).as("y"))
    val ctr = t(spark, dir).supplier.select(
      $"s_suppkey",
      (($"s_suppkey" * 48271L + 777771L) % m).as("cx"),
      (($"s_suppkey" * 16807L + 333667L) % m).as("cy"))
    val ptsCell = pts.select($"c_custkey", $"x", $"y",
      expr(s"x div $r").as("gx"), expr(s"y div $r").as("gy"))
    val probes = ctr
      .select($"s_suppkey", $"cx", $"cy",
        explode(expr("array(-1L, 0L, 1L)")).as("dgx"))
      .select($"s_suppkey", $"cx", $"cy", $"dgx",
        explode(expr("array(-1L, 0L, 1L)")).as("dgy"))
      .select($"s_suppkey", $"cx", $"cy",
        (expr(s"cx div $r") + $"dgx").as("gx"),
        (expr(s"cy div $r") + $"dgy").as("gy"))
    val hits = probes.join(ptsCell, Seq("gx", "gy"))
      .filter(abs($"x" - $"cx") <= r && abs($"y" - $"cy") <= r)
      .groupBy($"s_suppkey")
      .agg(count(lit(1)).as("n_in_radius"),
        min(greatest(abs($"x" - $"cx"), abs($"y" - $"cy")) * 100000000L + $"c_custkey")
          .as("code"))
    ctr.join(hits, Seq("s_suppkey"), "left")
      .select($"s_suppkey", $"cx", $"cy",
        coalesce($"n_in_radius", lit(0L)).as("n_in_radius"),
        coalesce(expr("code div 100000000"), lit(-1L)).as("nearest_dist"),
        coalesce($"code" % 100000000L, lit(-1L)).as("nearest_custkey"))
      .orderBy($"s_suppkey")
  }

  override def queries: Seq[GQuery] = Seq(
    qJoinSpatialGrid,
    q1PricingSummary,
    q6Revenue,
    q3ShippingPriority,
    q5LocalSupplier,
    q10ReturnedRevenue,
    q13CustDist,
    q14PromoShare,
    q18LargeOrders,
    q19Disjunctive,
    q11ValueShare,
    q22NoOrders,
    qJoinBroadcast,
    qJoinLeft,
    qJoinSemi,
    qJoinAnti,
    qJoinBloomSemi,
    qJoinAsof,
    qJoinAsofBroadcast,
    qJoinAsofForward,
    qJoinAsofNearest,
    qJoinSalted,
    qJoinFull,
    qJoinTheta,
    qJoinInterval,
    qJoinRangeBinned,
    qJoinIntervalOverlap,
    qJoinNullSafe,
    qJoinCross,
    qUnpivot
  )
}
