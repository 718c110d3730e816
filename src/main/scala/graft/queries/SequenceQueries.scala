package graft.queries

import graft.engine.PlanOnly.syntax._

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Common._

/** Event-sequence analytics over the `events` stream table: transition
  * matrices, funnel completion, cohort retention. In the reference these
  * are exactly the things users hand-roll in agent closures over per-key
  * state (callysto/src/types/table_agent.rs:116-179 — read state, compare
  * timestamps, write state); here each is a declarative, oracle-checked
  * relational query.
  *
  * Scale notes: everything is keyed on user_id — one hash partitioning
  * serves the window sort (transitions) and every per-user aggregate in
  * the funnel cascade (Catalyst reuses the exchange). Stage tables are
  * per-user aggregates, orders of magnitude smaller than the event log,
  * so the funnel's chain joins broadcast at real scale.
  */
object SequenceQueries extends QuerySet {

  /** Event-type bigram transition matrix: for consecutive events per user
    * (event-time order), count each (prev → curr) transition and the
    * distinct users making it. The Markov-chain summary used for both
    * behavioral analytics and synthetic-session generation. One window
    * shuffle on user_id, then a bounded groupBy (|types|² groups max).
    */
  val qTransitions: GQuery = GQuery(
    "q_seq_transitions",
    Some("""
      WITH s AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events)
      SELECT prev, event_type AS curr,
             COUNT(*) AS n,
             COUNT(DISTINCT user_id) AS n_users
      FROM s
      WHERE prev IS NOT NULL
      GROUP BY prev, curr
      ORDER BY prev, curr""")
  ) { (spark, dir) =>
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    t(spark, dir).events
      .select($"user_id", $"event_type", lag($"event_type", 1).over(w).as("prev"))
      .filter($"prev".isNotNull)
      .groupBy($"prev", $"event_type".as("curr"))
      .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("n_users"))
      .orderBy($"prev", $"curr")
  }

  /** Ordered funnel completion: signup → view → click → purchase, each
    * stage requiring an event STRICTLY after the user's previous-stage
    * time. Stage tables are min-timestamp-per-user aggregates; each next
    * stage filters the event log against the (small) previous stage —
    * the standard scalable funnel shape (no per-user UDF sessionization).
    */
  val qFunnel: GQuery = GQuery(
    "q_seq_funnel",
    Some("""
      WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events
                  WHERE event_type = 'signup' GROUP BY 1),
      s1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN s0 USING (user_id)
             WHERE e.event_type = 'view' AND e.ts > s0.t0 GROUP BY 1),
      s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
             WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
      s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
             WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
      SELECT * FROM (
        SELECT 1 AS stage_ord, 'signup' AS stage, COUNT(*) AS users FROM s0
        UNION ALL SELECT 2, 'view', COUNT(*) FROM s1
        UNION ALL SELECT 3, 'click', COUNT(*) FROM s2
        UNION ALL SELECT 4, 'purchase', COUNT(*) FROM s3)
      ORDER BY stage_ord""")
  ) { (spark, dir) =>
    import spark.implicits._
    val e = t(spark, dir).events
    def stage(evt: String, prev: org.apache.spark.sql.DataFrame, prevT: String, outT: String) =
      e.filter($"event_type" === evt)
        .join(prev, "user_id")
        .filter($"ts" > col(prevT))
        .groupBy($"user_id")
        .agg(min($"ts").as(outT))
    val s0 = e.filter($"event_type" === "signup").groupBy($"user_id").agg(min($"ts").as("t0"))
    val s1 = stage("view", s0, "t0", "t1")
    val s2 = stage("click", s1, "t1", "t2")
    val s3 = stage("purchase", s2, "t2", "t3")
    def cnt(df: org.apache.spark.sql.DataFrame, ord: Int, name: String) =
      df.agg(count(lit(1)).as("users"))
        .select(lit(ord).as("stage_ord"), lit(name).as("stage"), $"users")
    cnt(s0, 1, "signup")
      .unionAll(cnt(s1, 2, "view"))
      .unionAll(cnt(s2, 3, "click"))
      .unionAll(cnt(s3, 4, "purchase"))
      .orderBy($"stage_ord")
  }

  /** Cohort retention: users grouped by first-activity day, counted on
    * each subsequent active day as (cohort, day-offset) cells — the
    * retention-curve input. Two per-user aggregates plus one bounded
    * groupBy; day buckets come out as strings (raw DATE/TIMESTAMP output
    * is banned by oracle-parity rules — ns vs µs physics).
    */
  val qRetention: GQuery = GQuery(
    "q_seq_retention",
    Some("""
      WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS cohort
                 FROM events GROUP BY 1),
      a AS (SELECT DISTINCT e.user_id, date_trunc('day', e.ts) AS d FROM events e)
      SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
             CAST(date_diff('day', f.cohort, a.d) AS INT) AS day_offset,
             COUNT(*) AS users
      FROM f JOIN a USING (user_id)
      GROUP BY 1, 2
      ORDER BY cohort_day, day_offset""")
  ) { (spark, dir) =>
    import spark.implicits._
    // events.ts arrives as ns-since-epoch BIGINT on the Spark side
    // (parquet TIMESTAMP(NANOS) via nanosAsLong); day-truncation needs a
    // real timestamp — integral ns→µs conversion, see StreamOps.tsFromNanos.
    val e = t(spark, dir).events
      .withColumn("tts", graft.streaming.StreamOps.tsFromNanos($"ts"))
    val f = e.groupBy($"user_id").agg(min(date_trunc("day", $"tts")).as("cohort"))
    val a = e.select($"user_id", date_trunc("day", $"tts").as("d")).distinct()
    f.join(a, "user_id")
      .groupBy(
        date_format($"cohort", "yyyy-MM-dd").as("cohort_day"),
        datediff($"d", $"cohort").as("day_offset"))
      .agg(count(lit(1)).as("users"))
      .orderBy($"cohort_day", $"day_offset")
  }

  /** Rolling 7-day distinct users per day — the hard case of windowed
    * aggregation (COUNT DISTINCT does not decompose over sliding frames,
    * so no window function can express it). Exact shape: reduce the event
    * log to distinct (day, user) pairs FIRST (the only big-data pass),
    * then EXPLODE each pair to the ≤7 window-days it contributes to and
    * equi-aggregate — a pure shuffle-on-day plan with a bounded 7× row
    * expansion, no range join and no BroadcastNestedLoopJoin anywhere
    * (PlanSpec asserts it). The equi-join back to active days only trims
    * windows anchored on days with no activity of their own. The HLL
    * variant below is the approximate scale path when even the 7×
    * pair-day table is too hot.
    */
  val qRollingDistinct: GQuery = GQuery(
    "q_seq_rolling_distinct",
    Some("""
      WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events),
      days AS (SELECT DISTINCT d FROM du)
      SELECT strftime(days.d, '%Y-%m-%d') AS day,
             COUNT(DISTINCT du.user_id) AS users_7d
      FROM days JOIN du
        ON du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
      GROUP BY days.d
      ORDER BY day""")
  ) { (spark, dir) =>
    import spark.implicits._
    val e = t(spark, dir).events
      .withColumn("tts", graft.streaming.StreamOps.tsFromNanos($"ts"))
    val du = e.select(date_trunc("day", $"tts").as("d"), $"user_id").distinct()
    val days = du.select($"d".as("day_d")).distinct()
    val contrib = du.select(
      explode(sequence($"d", $"d" + expr("INTERVAL 6 DAY"), expr("INTERVAL 1 DAY")))
        .as("day_d"),
      $"user_id")
    contrib
      .join(days, "day_d") // equi-join on the window anchor, broadcastable
      .groupBy($"day_d")
      .agg(countDistinct($"user_id").as("users_7d"))
      .select(date_format($"day_d", "yyyy-MM-dd").as("day"), $"users_7d")
      .orderBy($"day")
  }

  /** Approximate rolling 7-day distinct users — the 100 TB path for
    * q_seq_rolling_distinct: sketch each day ONCE (kilobytes per day),
    * then every 7-day window merges 7 sketches instead of re-touching
    * (day, user) pairs — the same explode-to-window equi-shuffle shape,
    * but over |days| sketch rows instead of |days|·|daily actives| pairs.
    *
    * Oracle gate is BOUND-ENCODED like q_agg_hll_rollup: emits the exact
    * 7-day distinct count plus a boolean asserting the merged-sketch
    * estimate lands within 5% of exact; the oracle recomputes exact with
    * the boolean pinned TRUE.
    */
  val qRollingDistinctHll: GQuery = GQuery(
    "q_seq_rolling_distinct_hll",
    Some("""
      WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events),
      days AS (SELECT DISTINCT d FROM du)
      SELECT strftime(days.d, '%Y-%m-%d') AS day,
             COUNT(DISTINCT du.user_id) AS exact_users_7d,
             TRUE AS approx_ok
      FROM days JOIN du
        ON du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
      GROUP BY days.d
      ORDER BY day""")
  ) { (spark, dir) =>
    import spark.implicits._
    val e = t(spark, dir).events
      .withColumn("tts", graft.streaming.StreamOps.tsFromNanos($"ts"))
    val du = e.select(date_trunc("day", $"tts").as("d"), $"user_id").distinct()
    val days = du.select($"d".as("day_d")).distinct()
    def windows(c: Column): Column =
      explode(sequence(c, c + expr("INTERVAL 6 DAY"), expr("INTERVAL 1 DAY")))
    // one sketch per day, merged per window — the approximate path
    val daily = du.groupBy($"d").agg(hll_sketch_agg($"user_id").as("sk"))
    val approx = daily
      .select(windows($"d").as("day_d"), $"sk")
      .join(days, "day_d")
      .groupBy($"day_d")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("approx_users_7d"))
    // exact side for the bound (same plan as q_seq_rolling_distinct)
    val exact = du
      .select(windows($"d").as("day_d"), $"user_id")
      .join(days, "day_d")
      .groupBy($"day_d")
      .agg(countDistinct($"user_id").as("exact_users_7d"))
    approx
      .join(exact, "day_d")
      .select(
        date_format($"day_d", "yyyy-MM-dd").as("day"),
        $"exact_users_7d",
        (abs($"approx_users_7d".cast("double") - $"exact_users_7d".cast("double")) /
          $"exact_users_7d".cast("double") <= 0.05).as("approx_ok")
      )
      .orderBy($"day")
  }

  /** Market-basket triangle census ([[graft.operators.Graphs]]): parts
    * co-purchased within an order become canonical weighted edges; edges
    * seen in ≥2 orders (the noise cut that also bounds the join — the
    * raw co-occurrence graph is 1000× denser) feed the node-ordered
    * two-join triangle enumeration; output is each node's triangle
    * membership count. Triangle structure is the strength-of-community
    * signal one level above the pairwise edges the dedup family uses.
    * The oracle replays edge building, the weight cut, and the canonical
    * (a < b < c) enumeration.
    */
  val qTriangles: GQuery = GQuery(
    "q_graph_triangles",
    Some("""
      WITH g AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      e AS (SELECT a.i AS src, b.i AS dst, COUNT(*) AS w
            FROM g a JOIN g b ON a.g = b.g AND a.i < b.i
            GROUP BY 1, 2),
      e2 AS (SELECT src, dst FROM e WHERE w >= 2),
      tri AS (SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
              FROM e2 ab
              JOIN e2 bc ON ab.dst = bc.src
              JOIN e2 ac ON ac.src = ab.src AND ac.dst = bc.dst),
      nodes AS (SELECT a AS node FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri)
      SELECT node, COUNT(*) AS n_triangles
      FROM nodes GROUP BY node
      ORDER BY node""")
  ) { (spark, dir) =>
    import spark.implicits._
    val edges = graft.operators.Graphs
      .cooccurrenceEdges(t(spark, dir).lineitem, "l_orderkey", "l_partkey")
      .filter($"weight" >= 2)
    graft.operators.Graphs
      .triangleCounts(edges)
      .orderBy($"node")
  }

  /** PageRank (3 damped iterations) on the same co-purchase graph —
    * [[graft.operators.Graphs.pagerank]]'s every score hash-checked: the
    * oracle chains the iterations as plain aggregations (no recursion
    * needed at fixed k) with the SAME decimal-exact contribution sums and
    * the SAME IEEE constant arithmetic (1 − 0.85 is computed in double on
    * both engines, never as a decimal literal — the one base-10 trap in
    * cross-engine float parity).
    */
  val qPagerank: GQuery = GQuery(
    "q_graph_pagerank",
    Some("""
      WITH g AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      e AS (SELECT a.i AS src, b.i AS dst, COUNT(*) AS w
            FROM g a JOIN g b ON a.g = b.g AND a.i < b.i
            GROUP BY 1, 2),
      e2 AS (SELECT src, dst FROM e WHERE w >= 2),
      sym AS (SELECT src, dst FROM e2 UNION SELECT dst, src FROM e2),
      deg AS (SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY 1),
      nn AS (SELECT COUNT(*) AS n FROM deg),
      p0 AS (SELECT d.node, CAST(1 AS DOUBLE) / nn.n AS pr, d.deg
             FROM deg d CROSS JOIN nn),
      c1 AS (SELECT s.dst AS node,
                    CAST(SUM(CAST(floor((p.pr / p.deg) * 1e15) AS BIGINT)) AS DOUBLE) / 1e15 AS acc
             FROM sym s JOIN p0 p ON p.node = s.src GROUP BY 1),
      p1 AS (SELECT d.node,
                    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
                      + CAST(0.85 AS DOUBLE) * COALESCE(c1.acc, CAST(0 AS DOUBLE)) AS pr,
                    d.deg
             FROM deg d CROSS JOIN nn LEFT JOIN c1 ON c1.node = d.node),
      c2 AS (SELECT s.dst AS node,
                    CAST(SUM(CAST(floor((p.pr / p.deg) * 1e15) AS BIGINT)) AS DOUBLE) / 1e15 AS acc
             FROM sym s JOIN p1 p ON p.node = s.src GROUP BY 1),
      p2 AS (SELECT d.node,
                    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
                      + CAST(0.85 AS DOUBLE) * COALESCE(c2.acc, CAST(0 AS DOUBLE)) AS pr,
                    d.deg
             FROM deg d CROSS JOIN nn LEFT JOIN c2 ON c2.node = d.node),
      c3 AS (SELECT s.dst AS node,
                    CAST(SUM(CAST(floor((p.pr / p.deg) * 1e15) AS BIGINT)) AS DOUBLE) / 1e15 AS acc
             FROM sym s JOIN p2 p ON p.node = s.src GROUP BY 1),
      p3 AS (SELECT d.node,
                    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
                      + CAST(0.85 AS DOUBLE) * COALESCE(c3.acc, CAST(0 AS DOUBLE)) AS pr,
                    d.deg
             FROM deg d CROSS JOIN nn LEFT JOIN c3 ON c3.node = d.node)
      SELECT node, pr FROM p3 ORDER BY node""")
  ) { (spark, dir) =>
    import spark.implicits._
    val edges = graft.operators.Graphs
      .cooccurrenceEdges(t(spark, dir).lineitem, "l_orderkey", "l_partkey")
      .filter($"weight" >= 2)
    graft.operators.Graphs
      .pagerank(edges, k = 3)
      .orderBy($"node")
  }

  /** Personalized PageRank ([[graft.operators.Graphs.personalizedPagerank]],
    * 3 damped iterations) on the co-purchase graph, teleporting to the
    * three smallest node ids as the trusted seed set — the
    * seed-expansion signal ("how close is each part to this whitelist")
    * behind curated-neighborhood sampling. The oracle chains the
    * iterations exactly like q_graph_pagerank's, with the seed-indicator
    * teleport column threaded through every round and the same
    * floor(x·1e15) exact contribution sums.
    */
  val qGraphPpr: GQuery = GQuery(
    "q_graph_ppr",
    Some("""
      WITH g AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      e AS (SELECT a.i AS src, b.i AS dst, COUNT(*) AS w
            FROM g a JOIN g b ON a.g = b.g AND a.i < b.i
            GROUP BY 1, 2),
      e2 AS (SELECT src, dst FROM e WHERE w >= 2),
      sym AS (SELECT src, dst FROM e2 UNION SELECT dst, src FROM e2),
      deg AS (SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY 1),
      seeds AS (SELECT node FROM deg ORDER BY node LIMIT 3),
      ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM seeds),
      tl AS (SELECT d.node, d.deg,
                    CASE WHEN s.node IS NOT NULL THEN CAST(1 AS DOUBLE) / ns.ns
                         ELSE CAST(0 AS DOUBLE) END AS tele
             FROM deg d CROSS JOIN ns LEFT JOIN seeds s ON s.node = d.node),
      p0 AS (SELECT node, tele AS pr, deg FROM tl),
      c1 AS (SELECT s.dst AS node,
                    CAST(SUM(CAST(floor((p.pr / p.deg) * 1e15) AS BIGINT)) AS DOUBLE) / 1e15 AS acc
             FROM sym s JOIN p0 p ON p.node = s.src GROUP BY 1),
      p1 AS (SELECT t.node,
                    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * t.tele
                      + CAST(0.85 AS DOUBLE) * COALESCE(c1.acc, CAST(0 AS DOUBLE)) AS pr,
                    t.deg
             FROM tl t LEFT JOIN c1 ON c1.node = t.node),
      c2 AS (SELECT s.dst AS node,
                    CAST(SUM(CAST(floor((p.pr / p.deg) * 1e15) AS BIGINT)) AS DOUBLE) / 1e15 AS acc
             FROM sym s JOIN p1 p ON p.node = s.src GROUP BY 1),
      p2 AS (SELECT t.node,
                    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * t.tele
                      + CAST(0.85 AS DOUBLE) * COALESCE(c2.acc, CAST(0 AS DOUBLE)) AS pr,
                    t.deg
             FROM tl t LEFT JOIN c2 ON c2.node = t.node),
      c3 AS (SELECT s.dst AS node,
                    CAST(SUM(CAST(floor((p.pr / p.deg) * 1e15) AS BIGINT)) AS DOUBLE) / 1e15 AS acc
             FROM sym s JOIN p2 p ON p.node = s.src GROUP BY 1),
      p3 AS (SELECT t.node,
                    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * t.tele
                      + CAST(0.85 AS DOUBLE) * COALESCE(c3.acc, CAST(0 AS DOUBLE)) AS pr,
                    t.deg
             FROM tl t LEFT JOIN c3 ON c3.node = t.node)
      SELECT node, pr FROM p3 ORDER BY node""")
  ) { (spark, dir) =>
    import spark.implicits._
    val edges = graft.operators.Graphs
      .cooccurrenceEdges(t(spark, dir).lineitem, "l_orderkey", "l_partkey")
      .filter($"weight" >= 2)
    val nodes = edges.select($"src".as("node"))
      .union(edges.select($"dst".as("node")))
      .distinct()
    val seeds = nodes.orderBy($"node").limit(3)
    graft.operators.Graphs
      .personalizedPagerank(edges, seeds, k = 3)
      .orderBy($"node")
  }

  /** Local clustering coefficient on the same co-purchase graph
    * ([[graft.operators.Graphs.clusteringCoefficient]]): 2T/(d(d−1)) per
    * node of degree ≥ 2, zero-filled for triangle-free nodes — exact
    * integers into one IEEE division, so the whole column hash-matches.
    */
  val qClustering: GQuery = GQuery(
    "q_graph_clustering",
    Some("""
      WITH g AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      e AS (SELECT a.i AS src, b.i AS dst, COUNT(*) AS w
            FROM g a JOIN g b ON a.g = b.g AND a.i < b.i
            GROUP BY 1, 2),
      e2 AS (SELECT src, dst FROM e WHERE w >= 2),
      deg AS (SELECT node, COUNT(*) AS deg FROM (
                SELECT src AS node FROM e2 UNION ALL SELECT dst FROM e2) n
              GROUP BY 1),
      tri AS (SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
              FROM e2 ab
              JOIN e2 bc ON ab.dst = bc.src
              JOIN e2 ac ON ac.src = ab.src AND ac.dst = bc.dst),
      tc AS (SELECT node, COUNT(*) AS n_triangles FROM (
               SELECT a AS node FROM tri
               UNION ALL SELECT b FROM tri
               UNION ALL SELECT c FROM tri) n
             GROUP BY 1)
      SELECT d.node, d.deg,
             COALESCE(tc.n_triangles, 0) AS n_triangles,
             (COALESCE(tc.n_triangles, 0) * CAST(2 AS DOUBLE))
               / CAST(d.deg * (d.deg - 1) AS DOUBLE) AS clustering_coeff
      FROM deg d LEFT JOIN tc ON tc.node = d.node
      WHERE d.deg >= 2
      ORDER BY d.node""")
  ) { (spark, dir) =>
    import spark.implicits._
    val edges = graft.operators.Graphs
      .cooccurrenceEdges(t(spark, dir).lineitem, "l_orderkey", "l_partkey")
      .filter($"weight" >= 2)
    graft.operators.Graphs
      .clusteringCoefficient(edges)
      .orderBy($"node")
  }

  /** Time-to-convert: per user, latency from first signup to the first
    * STRICTLY-later purchase, summarized per signup-day cohort — the
    * funnel's time dimension (q_seq_funnel counts who converts; this
    * measures how fast). Latencies are µs-integer subtraction; the mean
    * is an exact BIGINT sum divided in double — NOT the decimal-sum
    * convention: at ~1e17 micro-unit magnitudes DuckDB's DECIMAL→DOUBLE
    * conversion lands one ulp off Spark's correctly-rounded one, while
    * int64→double is correctly rounded in both engines.
    */
  val qTimeToConvert: GQuery = GQuery(
    "q_seq_time_to_convert",
    Some(s"""
      WITH s AS (SELECT user_id, min(ts) AS t0 FROM events
                 WHERE event_type = 'signup' GROUP BY 1),
      p AS (SELECT e.user_id, min(e.ts) AS t1
            FROM events e JOIN s USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > s.t0 GROUP BY 1),
      lat AS (SELECT s.user_id,
                     strftime(date_trunc('day', s.t0), '%Y-%m-%d') AS cohort_day,
                     CAST(epoch_us(p.t1) - epoch_us(s.t0) AS BIGINT) AS us
              FROM s JOIN p USING (user_id))
      SELECT cohort_day,
             COUNT(*) AS n_converted,
             MIN(us) AS min_us,
             MAX(us) AS max_us,
             CAST(CAST(SUM(us) AS BIGINT) AS DOUBLE) / CAST(COUNT(us) AS DOUBLE) AS avg_us
      FROM lat GROUP BY 1 ORDER BY cohort_day""")
  ) { (spark, dir) =>
    import spark.implicits._
    // truncate to µs FIRST: the oracle's view sees µs timestamps, so the
    // strictly-after comparison must run on identical values (an event
    // <1µs after signup is a tie in µs, not 'after')
    val e = t(spark, dir).events
      .select($"user_id", $"event_type", expr("ts div 1000").as("tus"))
    val s = e.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"tus").as("t0"))
    val p = e.filter($"event_type" === "purchase")
      .join(s, "user_id").filter($"tus" > $"t0")
      .groupBy($"user_id").agg(min($"tus").as("t1"))
    s.join(p, "user_id")
      .select(
        date_format(
          date_trunc("day", timestamp_micros($"t0")),
          "yyyy-MM-dd").as("cohort_day"),
        ($"t1" - $"t0").as("us"))
      .groupBy($"cohort_day")
      .agg(
        count(lit(1)).as("n_converted"),
        min($"us").as("min_us"),
        max($"us").as("max_us"),
        (sum($"us").cast("double") / count($"us").cast("double")).as("avg_us"))
      .orderBy($"cohort_day")
  }

  /** Connected components on the co-purchase graph — the SAME
    * [[graft.operators.Dedup.connectedComponents]] the dedup family uses,
    * shown generic: substitute clusters among parts bought together.
    * Oracle = recursive-CTE reachability, as for q_dedup_connected.
    */
  val qGraphComponents: GQuery = GQuery(
    "q_graph_components",
    Some("""
      WITH RECURSIVE g AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      e AS (SELECT a.i AS src, b.i AS dst, COUNT(*) AS w
            FROM g a JOIN g b ON a.g = b.g AND a.i < b.i
            GROUP BY 1, 2),
      e2 AS (SELECT src, dst FROM e WHERE w >= 3),
      ed AS (SELECT src, dst FROM e2 UNION SELECT dst, src FROM e2),
      reach(src, dst) AS (
        SELECT src, dst FROM ed
        UNION
        SELECT r.src, x.dst FROM reach r JOIN ed x ON r.dst = x.src)
      SELECT src AS node, least(src, MIN(dst)) AS component
      FROM reach GROUP BY src
      ORDER BY node""")
  ) { (spark, dir) =>
    import spark.implicits._
    val edges = graft.operators.Graphs
      .cooccurrenceEdges(t(spark, dir).lineitem, "l_orderkey", "l_partkey")
      .filter($"weight" >= 3)
      .select($"src".as("id_a"), $"dst".as("id_b"))
    graft.operators.Dedup
      .connectedComponents(edges)
      .select($"id".as("node"), $"component")
      .orderBy($"node")
  }

  /** Batch sessionization ([[graft.operators.TimeSeries.sessionize]]):
    * per-event session ids from a 30-minute inactivity gap, rolled up to
    * one row per session. All arithmetic is integer µs; the session index
    * is a running count over the same per-key sort the gap test uses.
    */
  val qSessionize: GQuery = GQuery(
    "q_seq_sessionize",
    Some("""
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
      g AS (SELECT user_id, event_id, tus,
              CASE WHEN lag(tus) OVER w IS NULL
                     OR tus - lag(tus) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
      s AS (SELECT user_id, tus,
              SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                ROWS UNBOUNDED PRECEDING) AS sidx
            FROM g)
      SELECT user_id, CAST(sidx AS BIGINT) AS session_idx,
             COUNT(*) AS n_events,
             MIN(tus) AS start_us, MAX(tus) AS end_us,
             MAX(tus) - MIN(tus) AS duration_us
      FROM s
      GROUP BY user_id, sidx
      ORDER BY user_id, session_idx""")
  ) { (spark, dir) =>
    import spark.implicits._
    val e = t(spark, dir).events
      .select($"user_id", $"event_id", expr("ts div 1000").as("tus"))
    graft.operators.TimeSeries
      .sessionize(e, "user_id", "tus", "event_id", gapUs = 1800000000L)
      .orderBy($"user_id", $"session_idx")
  }

  /** Halving-weight decayed moving average
    * ([[graft.operators.TimeSeries.decayAvg]]). The oracle replays the
    * IDENTICAL Horner chain — every multiply an exact power-of-two scale,
    * additions in one fixed order — so the doubles hash-match with no
    * decimal detour: the gate proves bit-reproducible smoothing across
    * engines, the property that makes the score safe to join across
    * recomputations at 100 TB.
    */
  val qDecayAvg: GQuery = GQuery(
    "q_ts_decay_avg",
    Some("""
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus, value FROM events)
      SELECT user_id, event_id, tus, value,
             ((((((((CAST(0.0 AS DOUBLE) * CAST(0.5 AS DOUBLE)
               + coalesce(lag(value, 7) OVER w, CAST(0.0 AS DOUBLE))) * CAST(0.5 AS DOUBLE)
               + coalesce(lag(value, 6) OVER w, CAST(0.0 AS DOUBLE))) * CAST(0.5 AS DOUBLE)
               + coalesce(lag(value, 5) OVER w, CAST(0.0 AS DOUBLE))) * CAST(0.5 AS DOUBLE)
               + coalesce(lag(value, 4) OVER w, CAST(0.0 AS DOUBLE))) * CAST(0.5 AS DOUBLE)
               + coalesce(lag(value, 3) OVER w, CAST(0.0 AS DOUBLE))) * CAST(0.5 AS DOUBLE)
               + coalesce(lag(value, 2) OVER w, CAST(0.0 AS DOUBLE))) * CAST(0.5 AS DOUBLE)
               + coalesce(lag(value, 1) OVER w, CAST(0.0 AS DOUBLE))) * CAST(0.5 AS DOUBLE)
               + value)
             / (CAST(2.0 AS DOUBLE)
                - pow(CAST(0.5 AS DOUBLE),
                      CAST(least(row_number() OVER w, 8) - 1 AS DOUBLE))) AS decay_avg
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
      ORDER BY user_id, tus, event_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val e = t(spark, dir).events
      .select($"user_id", $"event_id", expr("ts div 1000").as("tus"), $"value")
    graft.operators.TimeSeries
      .decayAvg(e, "user_id", "tus", "event_id", "value", depth = 8)
      .orderBy($"user_id", $"tus", $"event_id")
  }

  /** Rolling z-score anomaly screen
    * ([[graft.operators.TimeSeries.rollingAnomaly]]): each event vs the
    * mean/variance of its 10 PRIOR values (frame excludes the current
    * row), flagged beyond 2σ once at least 5 antecedents exist. DECIMAL
    * sums make the moments order-insensitive; the flag comparison is a
    * handful of IEEE ops replayed identically by the oracle.
    */
  val qAnomaly: GQuery = GQuery(
    "q_ts_anomaly",
    Some("""
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus, value FROM events)
      SELECT user_id, event_id, tus, value,
             COUNT(value) OVER wf AS n_prior,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER wf AS DOUBLE)
               / CAST(COUNT(value) OVER wf AS DOUBLE) AS mean_prior,
             (COUNT(value) OVER wf >= 5 AND
              (value - CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER wf AS DOUBLE)
                         / CAST(COUNT(value) OVER wf AS DOUBLE))
              * (value - CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER wf AS DOUBLE)
                           / CAST(COUNT(value) OVER wf AS DOUBLE))
              > CAST(4.0 AS DOUBLE) * greatest(
                  CAST(SUM(CAST(value * value AS DECIMAL(38,6))) OVER wf AS DOUBLE)
                    / CAST(COUNT(value) OVER wf AS DOUBLE)
                  - (CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER wf AS DOUBLE)
                       / CAST(COUNT(value) OVER wf AS DOUBLE))
                    * (CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER wf AS DOUBLE)
                         / CAST(COUNT(value) OVER wf AS DOUBLE)),
                  CAST(0.0 AS DOUBLE))) AS is_anomaly
      FROM e
      WINDOW wf AS (PARTITION BY user_id ORDER BY tus, event_id
                    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
      ORDER BY user_id, tus, event_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val e = t(spark, dir).events
      .select($"user_id", $"event_id", expr("ts div 1000").as("tus"), $"value")
    graft.operators.TimeSeries
      .rollingAnomaly(e, "user_id", "tus", "event_id", "value",
        lookback = 10, minPrior = 5, sigmas = 2.0)
      .orderBy($"user_id", $"tus", $"event_id")
  }

  /** Single-source BFS hop counts ([[graft.operators.Graphs.bfsHops]])
    * over the same thresholded co-purchase graph as [[qGraphComponents]],
    * from the graph's minimum node id (computed, not hardcoded — the same
    * source on every engine and SF). The oracle replays the BFS as a
    * depth-capped recursive walk whose (node, d) pairs dedup through
    * UNION, then takes MIN(d) per node — equal to the frontier BFS
    * whenever the true eccentricity is under the cap, which the Spark
    * side enforces by failing loud at the same bound.
    */
  val qGraphBfs: GQuery = GQuery(
    "q_graph_bfs",
    Some("""
      WITH RECURSIVE g AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      e AS (SELECT a.i AS src, b.i AS dst, COUNT(*) AS w
            FROM g a JOIN g b ON a.g = b.g AND a.i < b.i
            GROUP BY 1, 2),
      e2 AS (SELECT src, dst FROM e WHERE w >= 3),
      ed AS (SELECT src, dst FROM e2 UNION SELECT dst, src FROM e2),
      s AS (SELECT MIN(src) AS s0 FROM ed),
      walk(node, d) AS (
        SELECT s0, 0 FROM s
        UNION
        SELECT x.dst, w.d + 1 FROM walk w JOIN ed x ON w.node = x.src WHERE w.d < 30)
      SELECT node, CAST(MIN(d) AS INT) AS hops
      FROM walk GROUP BY node
      ORDER BY node""")
  ) { (spark, dir) =>
    import spark.implicits._
    val edges = graft.operators.Graphs
      .cooccurrenceEdges(t(spark, dir).lineitem, "l_orderkey", "l_partkey")
      .filter($"weight" >= 3)
      .select($"src", $"dst")
    val source = edges.agg(min($"src")).as[Long].head() // one driver scalar
    graft.operators.Graphs
      .bfsHops(edges, source, maxIter = 30)
      .select($"node", $"hops".cast("int").as("hops"))
      .orderBy($"node")
  }

  /** Weighted single-source shortest paths
    * ([[graft.operators.Graphs.ssspWeighted]]) over the co-purchase
    * graph, edge cost = the co-occurrence count (integer, so min/compare
    * semantics are exact on both engines). The oracle replays the search
    * as a cost-capped recursive walk — every (node, path-cost) pair up to
    * the cap, deduped through UNION, MIN per node — which equals
    * Bellman-Ford whenever true distances sit under the cap; the cap (200,
    * ~40× this graph's eccentricity·max-cost) and the Spark side's
    * fail-loud round bound keep both sides honest.
    */
  val qGraphSssp: GQuery = GQuery(
    "q_graph_sssp",
    Some("""
      WITH RECURSIVE g AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      e AS (SELECT a.i AS src, b.i AS dst, CAST(COUNT(*) AS BIGINT) AS w
            FROM g a JOIN g b ON a.g = b.g AND a.i < b.i
            GROUP BY 1, 2),
      e2 AS (SELECT src, dst, w FROM e WHERE w >= 3),
      ed AS (SELECT src, dst, w FROM e2 UNION SELECT dst, src, w FROM e2),
      s AS (SELECT MIN(src) AS s0 FROM ed),
      walk(node, d) AS (
        SELECT s0, CAST(0 AS BIGINT) FROM s
        UNION
        SELECT x.dst, w.d + x.w FROM walk w JOIN ed x ON w.node = x.src
        WHERE w.d + x.w <= 200)
      SELECT node, MIN(d) AS dist
      FROM walk GROUP BY node
      ORDER BY node""")
  ) { (spark, dir) =>
    import spark.implicits._
    val edges = graft.operators.Graphs
      .cooccurrenceEdges(t(spark, dir).lineitem, "l_orderkey", "l_partkey")
      .filter($"weight" >= 3)
      .select($"src", $"dst", $"weight".as("cost"))
    val source = edges.agg(min($"src")).as[Long].head() // one driver scalar
    graft.operators.Graphs
      .ssspWeighted(edges, source, maxIter = 30)
      .select($"node", $"dist")
      .orderBy($"node")
  }

  /** OHLC bar downsampling: per (event_type, hour) emit open/high/low/
    * close/count/volume — the canonical time-series compaction (metrics,
    * finance, sensor rollups). Open/close are selected by a per-bucket
    * ROW_NUMBER over (µs, event_id) — a unique integer, so min_by/max_by
    * tie-breaks are deterministic on both engines. One window pass + one
    * bounded groupBy, both on the same (event_type, bucket) partitioning;
    * volume sums through DECIMAL(38,6).
    */
  val qOhlc: GQuery = GQuery(
    "q_ts_ohlc",
    Some(s"""
      WITH e AS (
        SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, value,
               ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', CAST(ts AS TIMESTAMP))
                                  ORDER BY epoch_us(ts), event_id) AS rn
        FROM events)
      SELECT event_type,
             strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket,
             round(arg_min(value, rn), 6) AS open,
             round(max(value), 6) AS high,
             round(min(value), 6) AS low,
             round(arg_max(value, rn), 6) AS close,
             COUNT(*) AS n,
             ${sqlSum("value")} AS volume
      FROM e GROUP BY 1, 2
      ORDER BY event_type, bucket""")
  ) { (spark, dir) =>
    import spark.implicits._
    val e = t(spark, dir).events
      .withColumn("tts", graft.streaming.StreamOps.tsFromNanos($"ts"))
      .withColumn("h", date_trunc("hour", $"tts"))
    val w  = Window.partitionBy($"event_type", $"h").orderBy(expr("ts div 1000"), $"event_id")
    e.withColumn("rn", row_number().over(w))
      .groupBy($"event_type", $"h")
      .agg(
        round(min_by($"value", $"rn"), 6).as("open"),
        round(max($"value"), 6).as("high"),
        round(min($"value"), 6).as("low"),
        round(max_by($"value", $"rn"), 6).as("close"),
        count(lit(1)).as("n"),
        dsum($"value").as("volume"))
      .select($"event_type", date_format($"h", "yyyy-MM-dd HH:mm:ss").as("bucket"),
        $"open", $"high", $"low", $"close", $"n", $"volume")
      .orderBy($"event_type", $"bucket")
  }

  /** 3-core of the co-purchase graph ([[graft.operators.Graphs.kCore]]):
    * iterative peeling to the maximal subgraph of min-degree ≥ 3, with
    * each survivor's in-core degree. The oracle unrolls the peeling as a
    * fixed chain of 16 filter rounds — peeling is monotone, so once the
    * fixpoint is reached every further round is the identity and the
    * unrolled chain EQUALS the converged result; the Spark side fails
    * LOUD if 16 rounds were not enough (so both engines provably reached
    * the same fixpoint, never a premature superset).
    */
  val qGraphKcore: GQuery = {
    val k      = 3
    val rounds = 16
    val peel = (1 to rounds).map { i =>
      val p = s"e${i - 1}"
      s"""e$i AS MATERIALIZED (SELECT src, dst FROM $p
         |        WHERE src IN (SELECT src FROM $p GROUP BY src HAVING COUNT(*) >= $k)
         |          AND dst IN (SELECT src FROM $p GROUP BY src HAVING COUNT(*) >= $k))""".stripMargin
    }.mkString(",\n      ")
    GQuery(
      "q_graph_kcore",
      Some(s"""
      WITH g AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      ew AS (SELECT a.i AS s, b.i AS d, COUNT(*) AS w
             FROM g a JOIN g b ON a.g = b.g AND a.i < b.i GROUP BY 1, 2),
      ec AS (SELECT s, d FROM ew WHERE w >= 2),
      e0 AS MATERIALIZED (SELECT s AS src, d AS dst FROM ec UNION SELECT d, s FROM ec),
      $peel
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
      FROM e$rounds GROUP BY 1 ORDER BY 1""")
    ) { (spark, dir) =>
      import spark.implicits._
      val edges = graft.operators.Graphs
        .cooccurrenceEdges(t(spark, dir).lineitem, "l_orderkey", "l_partkey")
        .filter($"weight" >= 2)
      graft.operators.Graphs
        .kCore(edges, k = k, maxIter = rounds)
        .orderBy($"node")
    }
  }

  /** Deterministic synchronous label propagation, 4 rounds
    * ([[graft.operators.Graphs.labelPropagation]]): plurality neighbor
    * label with (count DESC, label ASC) tie-break from self-seeded
    * labels. Fixed rounds + total tie order make the full community
    * assignment exact, so the oracle unrolls the same 4 rounds
    * (MATERIALIZED — each round is referenced by the next) and every
    * (node, label) row hash-matches.
    */
  val qGraphLabelProp: GQuery = {
    val rounds = 4
    val prop = (1 to rounds).map { i =>
      s"""l$i AS MATERIALIZED (
         |        SELECT node, label FROM (
         |          SELECT e.dst AS node, l.label, COUNT(*) AS c,
         |                 ROW_NUMBER() OVER (PARTITION BY e.dst
         |                                    ORDER BY COUNT(*) DESC, l.label) AS rk
         |          FROM e0 e JOIN l${i - 1} l ON e.src = l.node
         |          GROUP BY e.dst, l.label)
         |        WHERE rk = 1)""".stripMargin
    }.mkString(",\n      ")
    GQuery(
      "q_graph_labelprop",
      Some(s"""
      WITH g AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      ew AS (SELECT a.i AS s, b.i AS d, COUNT(*) AS w
             FROM g a JOIN g b ON a.g = b.g AND a.i < b.i GROUP BY 1, 2),
      ec AS (SELECT s, d FROM ew WHERE w >= 2),
      e0 AS MATERIALIZED (SELECT s AS src, d AS dst FROM ec UNION SELECT d, s FROM ec),
      l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM e0),
      $prop
      SELECT node, label FROM l$rounds ORDER BY node""")
    ) { (spark, dir) =>
      import spark.implicits._
      val edges = graft.operators.Graphs
        .cooccurrenceEdges(t(spark, dir).lineitem, "l_orderkey", "l_partkey")
        .filter($"weight" >= 2)
      graft.operators.Graphs
        .labelPropagation(edges, rounds = rounds)
        .orderBy($"node")
    }
  }

  /** Newman modularity of the 4-round label-propagation partition
    * ([[graft.operators.Graphs.modularity]]) — the community-quality
    * audit that decides whether detected structure beats the
    * degree-preserving random graph. Emitted per community (exact
    * BIGINT intra-edge and degree counts + one IEEE q_term), never
    * summed engine-side: a cross-engine double sum over communities is
    * order-dependent, per-community terms are not. The q_term is
    * UNROUNDED on both sides — exact-int→double casts plus an
    * IEEE-defined div/mul/sub chain are bit-identical across engines,
    * while `round(DOUBLE, 6)` is not (DuckDB's rounding of a 6-dp
    * boundary cell changed across releases; the round-9 driver gate
    * proved the local build and the driver's disagree). The oracle replays
    * the full chain — co-purchase edges, weight cut, symmetrization,
    * all 4 unrolled propagation rounds, then the modularity counts —
    * so the audit of the partition is as hash-checked as the partition
    * itself (q_graph_labelprop).
    */
  val qGraphModularity: GQuery = {
    val rounds = 4
    val prop = (1 to rounds).map { i =>
      s"""l$i AS MATERIALIZED (
         |        SELECT node, label FROM (
         |          SELECT e.dst AS node, l.label, COUNT(*) AS c,
         |                 ROW_NUMBER() OVER (PARTITION BY e.dst
         |                                    ORDER BY COUNT(*) DESC, l.label) AS rk
         |          FROM e0 e JOIN l${i - 1} l ON e.src = l.node
         |          GROUP BY e.dst, l.label)
         |        WHERE rk = 1)""".stripMargin
    }.mkString(",\n      ")
    GQuery(
      "q_graph_modularity",
      Some(s"""
      WITH g AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      ew AS (SELECT a.i AS s, b.i AS d, COUNT(*) AS w
             FROM g a JOIN g b ON a.g = b.g AND a.i < b.i GROUP BY 1, 2),
      ec AS (SELECT s, d FROM ew WHERE w >= 2),
      e0 AS MATERIALIZED (SELECT s AS src, d AS dst FROM ec UNION SELECT d, s FROM ec),
      l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM e0),
      $prop,
      lab AS MATERIALIZED (SELECT node, label AS community FROM l$rounds),
      mm AS (SELECT CAST(COUNT(*) AS DOUBLE) AS md FROM e0),
      ej AS MATERIALIZED (
        SELECT a.community AS ca, b.community AS cb
        FROM e0 e JOIN lab a ON e.src = a.node JOIN lab b ON e.dst = b.node),
      intra AS (SELECT ca AS community, CAST(COUNT(*) AS BIGINT) AS intra_edges
                FROM ej WHERE ca = cb GROUP BY ca),
      deg AS (SELECT ca AS community, CAST(COUNT(*) AS BIGINT) AS degree_sum
              FROM ej GROUP BY ca),
      nn AS (SELECT community, CAST(COUNT(*) AS BIGINT) AS n_nodes
             FROM lab GROUP BY community)
      SELECT nn.community, nn.n_nodes,
             COALESCE(intra.intra_edges, 0) AS intra_edges,
             deg.degree_sum,
             CAST(COALESCE(intra.intra_edges, 0) AS DOUBLE) / md
                   - (CAST(deg.degree_sum AS DOUBLE) / md)
                   * (CAST(deg.degree_sum AS DOUBLE) / md) AS q_term
      FROM nn JOIN deg USING (community)
      LEFT JOIN intra USING (community), mm
      ORDER BY community""")
    ) { (spark, dir) =>
      import spark.implicits._
      val edges = graft.operators.Graphs
        .cooccurrenceEdges(t(spark, dir).lineitem, "l_orderkey", "l_partkey")
        .filter($"weight" >= 2)
      graft.operators.Graphs
        .modularity(edges, graft.operators.Graphs.labelPropagation(edges, rounds = rounds))
        .orderBy($"community")
    }
  }

  /** HITS hubs & authorities ([[graft.operators.Graphs.hits]], 3
    * iterations) on the DIRECTED supplier→part shipping graph — the
    * two-sided importance signal: hub suppliers ship many widely-sourced
    * parts, authority parts are shipped by many strong suppliers. Node
    * ids are side-tagged ('s'/'p' prefixes) because the key domains
    * overlap. The oracle unrolls all three mutual-reinforcement
    * iterations as plain CTE aggregations with the SAME floor(x·1e15)
    * BIGINT contribution/normalizer sums — every hub and authority
    * score hash-checked.
    */
  val qGraphHits: GQuery = {
    val iters = 3
    val chain = (1 to iters).map { r =>
      s"""
      ar$r AS MATERIALIZED (
        SELECT e.dst AS node,
               CAST(SUM(CAST(floor(h.hub * 1e15) AS BIGINT)) AS DOUBLE) / 1e15 AS auth
        FROM e JOIN h${r - 1} h ON h.node = e.src GROUP BY 1),
      a$r AS MATERIALIZED (
        SELECT node, auth / t.tot AS auth FROM ar$r,
          (SELECT CAST(SUM(CAST(floor(auth * 1e15) AS BIGINT)) AS DOUBLE) / 1e15 AS tot
           FROM ar$r) t),
      hr$r AS MATERIALIZED (
        SELECT e.src AS node,
               CAST(SUM(CAST(floor(a.auth * 1e15) AS BIGINT)) AS DOUBLE) / 1e15 AS hub
        FROM e JOIN a$r a ON a.node = e.dst GROUP BY 1),
      h$r AS MATERIALIZED (
        SELECT node, hub / t.tot AS hub FROM hr$r,
          (SELECT CAST(SUM(CAST(floor(hub * 1e15) AS BIGINT)) AS DOUBLE) / 1e15 AS tot
           FROM hr$r) t)"""
    }.mkString(",")
    GQuery(
      "q_graph_hits",
      Some(s"""
      WITH e AS MATERIALIZED (
        SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                        'p' || CAST(l_partkey AS VARCHAR) AS dst
        FROM lineitem),
      nodes AS MATERIALIZED (
        SELECT src AS node FROM e UNION SELECT dst FROM e),
      h0 AS MATERIALIZED (SELECT node, CAST(1 AS DOUBLE) AS hub FROM nodes),$chain
      SELECT n.node,
             round(COALESCE(h.hub, CAST(0 AS DOUBLE)), 6) AS hub,
             round(COALESCE(a.auth, CAST(0 AS DOUBLE)), 6) AS auth
      FROM nodes n
      LEFT JOIN h$iters h ON h.node = n.node
      LEFT JOIN a$iters a ON a.node = n.node
      ORDER BY n.node""")
    ) { (spark, dir) =>
      import spark.implicits._
      // Iterate on PACKED LONG node ids (2·suppkey for the supplier side,
      // 2·partkey+1 for the part side — injective across both key
      // domains) and derive the oracle's 's…'/'p…' STRING ids only in the
      // final projection: every per-iteration join/aggregate shuffles an
      // 8-byte key instead of a 10-16 byte UTF8 string with string
      // hashing/compares (guide §2.3 "narrower types"). Scores are
      // per-node sums of the same contributions under an injective
      // relabeling, so hub/auth values are bit-identical; the oracle
      // (unchanged, string-keyed) gates the equivalence.
      val edges = t(spark, dir).lineitem.select(
        ($"l_suppkey" * 2L).as("src"),
        ($"l_partkey" * 2L + 1L).as("dst"))
      graft.operators.Graphs
        .hits(edges, k = iters)
        .select(
          // node >> 1 recovers the key on BOTH sides (2k >> 1 = k,
          // (2k+1) >> 1 = k) — integer shift, never Spark's double `/`
          concat(when($"node" % 2 === 0, lit("s")).otherwise(lit("p")),
            shiftright($"node", 1).cast("string")).as("node"),
          round($"hub", 6).as("hub"), round($"auth", 6).as("auth"))
        .orderBy($"node")
    }
  }

  /** Rolling 7-day EXACT median per event type — the other
    * non-decomposable sliding aggregate next to [[qRollingDistinct]]'s
    * COUNT DISTINCT (no window frame computes an exact quantile
    * incrementally). Same explode-to-anchor shape: every (type, day,
    * value) row contributes to ≤7 window anchors, the join on active
    * anchor days is equi, and the per-anchor group runs the exact
    * interpolated percentile — a pure shuffle-on-(type, anchor) plan
    * with a bounded 7× expansion, never a range join. The 100 TB
    * approximate path mirrors the HLL twin: percentile_approx sketches
    * are MERGEABLE, so each day sketches once and windows merge 7
    * sketches (see q_agg_approx_quantile for the sketch's gated error
    * contract).
    */
  val qRollingMedian: GQuery = GQuery(
    "q_ts_rolling_median",
    Some("""
      WITH ev AS (SELECT event_type, date_trunc('day', ts) AS d, value FROM events),
      days AS (SELECT DISTINCT event_type, d FROM ev)
      SELECT days.event_type, strftime(days.d, '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS n_vals,
             round(quantile_cont(ev.value, 0.5), 6) AS median_7d
      FROM days JOIN ev ON ev.event_type = days.event_type
                        AND ev.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
      GROUP BY days.event_type, days.d
      ORDER BY days.event_type, day""")
  ) { (spark, dir) =>
    import spark.implicits._
    val ev = t(spark, dir).events
      .withColumn("tts", graft.streaming.StreamOps.tsFromNanos($"ts"))
      .select($"event_type", date_trunc("day", $"tts").as("d"), $"value")
    val days = ev.select($"event_type", $"d".as("day_d")).distinct()
    val contrib = ev.select(
      $"event_type",
      explode(sequence($"d", $"d" + expr("INTERVAL 6 DAY"), expr("INTERVAL 1 DAY")))
        .as("day_d"),
      $"value")
    contrib
      .join(days, Seq("event_type", "day_d"))
      .groupBy($"event_type", $"day_d")
      .agg(
        count(lit(1)).as("n_vals"),
        round(percentile($"value", lit(0.5)), 6).as("median_7d"))
      .select(
        $"event_type",
        date_format($"day_d", "yyyy-MM-dd").as("day"),
        $"n_vals", $"median_7d")
      .orderBy($"event_type", $"day")
  }

  /** Neighborhood Jaccard per co-purchase edge
    * ([[graft.operators.Graphs.neighborJaccard]]) — the link-prediction /
    * graph-sparsification score. The oracle replays edge building, the
    * weight cut, symmetrization, wedge-join common-neighbor counting and
    * the one IEEE division, so every edge's score hash-matches.
    */
  val qGraphNeighborJaccard: GQuery = GQuery(
    "q_graph_neighbor_jaccard",
    Some("""
      WITH g AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      e AS (SELECT a.i AS src, b.i AS dst, COUNT(*) AS w
            FROM g a JOIN g b ON a.g = b.g AND a.i < b.i
            GROUP BY 1, 2),
      e2 AS (SELECT src, dst FROM e WHERE w >= 2),
      sym AS (SELECT src, dst FROM e2 UNION ALL SELECT dst, src FROM e2),
      deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
      cn AS (SELECT e.src, e.dst, CAST(COUNT(*) AS BIGINT) AS ni
             FROM e2 e
             JOIN sym sa ON sa.src = e.src
             JOIN sym sb ON sb.src = e.dst AND sb.dst = sa.dst
             GROUP BY e.src, e.dst)
      SELECT e.src, e.dst,
             COALESCE(cn.ni, 0) AS n_common,
             round(CAST(COALESCE(cn.ni, 0) AS DOUBLE)
                   / CAST(da.deg + db.deg - COALESCE(cn.ni, 0) AS DOUBLE), 6) AS jaccard
      FROM e2 e
      JOIN deg da ON da.node = e.src
      JOIN deg db ON db.node = e.dst
      LEFT JOIN cn ON cn.src = e.src AND cn.dst = e.dst
      ORDER BY e.src, e.dst""")
  ) { (spark, dir) =>
    import spark.implicits._
    val edges = graft.operators.Graphs
      .cooccurrenceEdges(t(spark, dir).lineitem, "l_orderkey", "l_partkey")
      .filter($"weight" >= 2)
    graft.operators.Graphs
      .neighborJaccard(edges)
      .orderBy($"src", $"dst")
  }

  /** Classical additive seasonal decomposition of the daily event-value
    * series (trend = centered 7-day moving average, seasonal = centered
    * day-of-week means of the detrended series, residual = the rest) —
    * the standard drift/seasonality screen for ingest-volume and metric
    * monitoring. Every aggregate is DECIMAL-pinned (order-insensitive)
    * and every derived value one fixed IEEE chain, so trend, seasonal
    * index and residual all hash-match. Scale shape: one corpus-scale
    * groupBy to the DAILY table; every window/aggregate after that runs
    * on day-count rows, not events.
    */
  val qSeasonalDecompose: GQuery = GQuery(
    "q_ts_seasonal_decompose",
    Some("""
      WITH ev AS (SELECT epoch_us(ts) // 86400000000 AS day, value FROM events),
      daily AS (SELECT day, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
                FROM ev GROUP BY day),
      tr AS (SELECT day, v,
                    CASE WHEN COUNT(*) OVER w = 7
                         THEN CAST(SUM(CAST(v AS DECIMAL(38,6))) OVER w AS DOUBLE)
                              / CAST(7 AS DOUBLE) END AS trend
             FROM daily
             WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      sr AS (SELECT day % 7 AS dow,
                    CAST(SUM(CAST(v - trend AS DECIMAL(38,6))) AS DOUBLE)
                      / CAST(COUNT(*) AS DOUBLE) AS s_raw
             FROM tr WHERE trend IS NOT NULL GROUP BY 1),
      m AS (SELECT CAST(SUM(CAST(s_raw AS DECIMAL(38,6))) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE) AS m FROM sr),
      seas AS (SELECT dow, s_raw - m.m AS s FROM sr, m)
      SELECT t.day, t.day % 7 AS dow,
             round(t.v, 6) AS daily_value,
             round(t.trend, 6) AS trend,
             round(se.s, 6) AS seasonal,
             round(t.v - t.trend - se.s, 6) AS residual
      FROM tr t JOIN seas se ON se.dow = t.day % 7
      ORDER BY t.day""")
  ) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = t(spark, dir).events
      .select(expr("(ts div 1000) div 86400000000").as("day"), $"value")
      .groupBy($"day")
      .agg(dsum($"value").as("v"))
    // all downstream windows/aggregates run on the day-count table
    val w = Window.orderBy($"day").rowsBetween(-3, 3)
    val tr = daily.withColumn("trend",
      when(count(lit(1)).over(w) === 7,
        sum($"v".cast(Common.D)).over(w).cast("double") / lit(7.0).cast("double")))
    val sr = tr.filter($"trend".isNotNull)
      .groupBy(($"day" % 7).as("dow"))
      .agg((sum(($"v" - $"trend").cast(Common.D)).cast("double")
        / count(lit(1)).cast("double")).as("s_raw"))
    val m = sr.agg((sum($"s_raw".cast(Common.D)).cast("double")
      / count(lit(1)).cast("double")).as("m"))
    val seas = sr.crossJoin(broadcast(m)).select($"dow", ($"s_raw" - $"m").as("s"))
    tr.withColumn("dow", $"day" % 7)
      .join(broadcast(seas), "dow")
      .select($"day", $"dow",
        round($"v", 6).as("daily_value"),
        round($"trend", 6).as("trend"),
        round($"s", 6).as("seasonal"),
        round($"v" - $"trend" - $"s", 6).as("residual"))
      .orderBy($"day")
  }

  /** CUSUM change-point screen over the daily event-value series: the
    * cumulative sum of deviations from the global mean wanders near zero
    * under a stable level and ramps when the level shifts — the classic
    * sequential drift detector, complementing [[qAnomaly]]'s pointwise
    * screen. Global moments and the running sum are DECIMAL-pinned; the
    * 5σ flag is one IEEE comparison on identical values. Windows run on
    * the DAILY table (day-count rows), after one corpus-scale groupBy.
    */
  val qCusum: GQuery = GQuery(
    "q_ts_cusum",
    Some("""
      WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
        FROM events GROUP BY 1),
      m AS (
        SELECT CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS mu,
               sqrt(greatest(
                 CAST(SUM(CAST(v * v AS DECIMAL(38,6))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE)
                 - (CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE)
                      / CAST(COUNT(*) AS DOUBLE))
                   * (CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE)
                        / CAST(COUNT(*) AS DOUBLE)),
                 CAST(0 AS DOUBLE))) AS sigma
        FROM daily),
      c AS (
        SELECT day, v,
               CAST(SUM(CAST(v - m.mu AS DECIMAL(38,6)))
                      OVER (ORDER BY day) AS DOUBLE) AS cusum,
               m.sigma AS sigma
        FROM daily, m)
      SELECT day, round(v, 6) AS daily_value, round(cusum, 6) AS cusum,
             abs(cusum) > 5 * sigma AS level_shift
      FROM c ORDER BY day""")
  ) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = t(spark, dir).events
      .select(expr("(ts div 1000) div 86400000000").as("day"), $"value")
      .groupBy($"day")
      .agg(dsum($"value").as("v"))
    val mu = sum($"v".cast(Common.D)).cast("double") / count(lit(1)).cast("double")
    val m = daily.agg(
      mu.as("mu"),
      sqrt(greatest(
        sum(($"v" * $"v").cast(Common.D)).cast("double") / count(lit(1)).cast("double")
          - mu * mu,
        lit(0.0))).as("sigma"))
    val win = Window.orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.crossJoin(broadcast(m))
      .withColumn("cusum", sum(($"v" - $"mu").cast(Common.D)).over(win).cast("double"))
      .select($"day", round($"v", 6).as("daily_value"), round($"cusum", 6).as("cusum"),
        (abs($"cusum") > lit(5) * $"sigma").as("level_shift"))
      .orderBy($"day")
  }

  /** Single changepoint estimation over the daily click-count series —
    * binary segmentation's first split: t* = argmax_t |n·S_t − t·S_n|
    * (the cross-multiplied form of the centered-CUSUM statistic, kept in
    * EXACT BIGINTs so the argmax can never be flipped by a float
    * rounding), reporting the split day, the means either side, and the
    * level shift. This is "WHERE did the metric move" next to
    * [[qCusum]]'s "did it move".
    *
    * Scale shape: one corpus-scale day aggregate; everything after runs
    * on the bounded day-grain series (the window-lint allowed class).
    * Interior splits only (t < n); ties resolve to the earliest day.
    */
  val qChangepoint: GQuery = GQuery(
    "q_ts_changepoint",
    Some("""
      WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM events WHERE event_type = 'click' GROUP BY 1),
      c AS (
        SELECT day, v,
               CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
               CAST(SUM(v) OVER (ORDER BY day) AS BIGINT) AS s
        FROM daily),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sn
            FROM daily),
      stat AS (
        SELECT c.day, c.t, c.s, m.n, m.sn,
               abs(m.n * c.s - c.t * m.sn) AS g
        FROM c CROSS JOIN m
        WHERE c.t < m.n)
      SELECT day AS split_day, t AS split_idx, g AS stat,
             round(CAST(s AS DOUBLE) / CAST(t AS DOUBLE), 6) AS mean_before,
             round(CAST(sn - s AS DOUBLE) / CAST(n - t AS DOUBLE), 6) AS mean_after,
             round(CAST(sn - s AS DOUBLE) / CAST(n - t AS DOUBLE)
                   - CAST(s AS DOUBLE) / CAST(t AS DOUBLE), 6) AS shift
      FROM stat
      ORDER BY g DESC, day
      LIMIT 1""")
  ) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = t(spark, dir).events
      .filter($"event_type" === "click")
      .select(expr("(ts div 1000) div 86400000000").as("day"))
      .groupBy($"day")
      .agg(count(lit(1)).as("v"))
    val win = Window.orderBy($"day")
    val c = daily
      .withColumn("t", row_number().over(win).cast("long"))
      .withColumn("s",
        sum($"v").over(win.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val m = daily.agg(count(lit(1)).as("n"), sum($"v").as("sn"))
    c.crossJoin(broadcast(m))
      .filter($"t" < $"n")
      .withColumn("g", abs($"n" * $"s" - $"t" * $"sn"))
      .orderBy($"g".desc, $"day")
      .limit(1)
      .select(
        $"day".as("split_day"), $"t".as("split_idx"), $"g".as("stat"),
        round($"s".cast("double") / $"t".cast("double"), 6).as("mean_before"),
        round(($"sn" - $"s").cast("double") / ($"n" - $"t").cast("double"), 6)
          .as("mean_after"),
        round(($"sn" - $"s").cast("double") / ($"n" - $"t").cast("double")
          - $"s".cast("double") / $"t".cast("double"), 6).as("shift"))
  }

  /** Degree distribution + power-law exponent of the co-purchase graph:
    * the degree histogram and the Clauset-style continuous MLE
    * α̂ = 1 + n / Σ ln(d / (xmin − ½)) at xmin = 1 — the graph-shape
    * audit ("is this scale-free? how heavy is the hub tail?") read
    * before choosing partition strategies for graph workloads (a heavy
    * tail predicts the skew the salted-join / hot-cap machinery exists
    * for).
    *
    * Scale shape: degree is one edge-keyed count; the histogram and the
    * MLE run over |distinct degrees| / |nodes| rows. ln terms round to
    * 6 decimals before the DECIMAL(38,6) sum (the qZipf convention);
    * the histogram rows carry the fit as broadcast constants.
    */
  val qDegreeDist: GQuery = GQuery(
    "q_graph_degree_dist",
    Some("""
      WITH g AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      e AS (SELECT a.i AS src, b.i AS dst, COUNT(*) AS w
            FROM g a JOIN g b ON a.g = b.g AND a.i < b.i
            GROUP BY 1, 2),
      e2 AS (SELECT src, dst FROM e WHERE w >= 2),
      sym AS (SELECT src, dst FROM e2 UNION SELECT dst, src FROM e2),
      deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY 1),
      hist AS (SELECT d AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
               FROM deg GROUP BY d),
      fit AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(ln(CAST(d AS DOUBLE) / CAST(0.5 AS DOUBLE)), 6)
                             AS DECIMAL(38,6))) AS DOUBLE) AS sl
        FROM deg)
      SELECT h.degree, h.n_nodes, f.n AS total_nodes,
             round(CAST(1 AS DOUBLE) + CAST(f.n AS DOUBLE) / f.sl, 6) AS alpha
      FROM hist h CROSS JOIN fit f
      ORDER BY h.degree""")
  ) { (spark, dir) =>
    import spark.implicits._
    val edges = graft.operators.Graphs
      .cooccurrenceEdges(t(spark, dir).lineitem, "l_orderkey", "l_partkey")
      .filter($"weight" >= 2)
    val sym = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .distinct()
    val deg = sym.groupBy($"src".as("node"))
      .agg(count(lit(1)).as("d"))
      .ckptLazy()
    val hist = deg.groupBy($"d".as("degree")).agg(count(lit(1)).as("n_nodes"))
    val fit = deg.agg(
      count(lit(1)).as("n"),
      sum(round(log($"d".cast("double") / lit(0.5).cast("double")), 6).cast(Common.D))
        .cast("double").as("sl"))
    hist.crossJoin(broadcast(fit))
      .select($"degree", $"n_nodes", $"n".as("total_nodes"),
        round(lit(1.0) + $"n".cast("double") / $"sl", 6).as("alpha"))
      .orderBy($"degree")
  }

  /** Autocorrelation function of the daily value series at lags 1–7 —
    * the seasonality detector ([[qSeasonalDecompose]] ASSUMES a weekly
    * period; the ACF peak at lag 7 is what justifies it) and the
    * independence check behind every bootstrap/permutation p-value on
    * time-ordered data. r_k = Σ(v_t−μ)(v_{t+k}−μ) / Σ(v_t−μ)², pairs in
    * ROW order over the ranked days.
    *
    * Scale shape: one corpus-scale day aggregate; the series itself is
    * day-grain bounded (window-lint allowed class) — ranked self-join
    * on t+k, cross-product terms rounded to 6 decimals into
    * DECIMAL(38,6) sums (engine double-summation order must not matter
    * even over 90 rows).
    */
  val qAutocorr: GQuery = GQuery(
    "q_ts_autocorrelation",
    Some("""
      WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
        FROM events GROUP BY 1),
      m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS mu
        FROM daily),
      r AS (SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
            FROM daily),
      den AS (
        SELECT CAST(SUM(CAST(round((v - m.mu) * (v - m.mu), 6) AS DECIMAL(38,6)))
                    AS DOUBLE) AS d
        FROM r CROSS JOIN m),
      num AS (
        SELECT k.k,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CAST(round((a.v - m.mu) * (b.v - m.mu), 6) AS DECIMAL(38,6)))
                    AS DOUBLE) AS s
        FROM r a
        JOIN (SELECT unnest(generate_series(1, 7)) AS k) k ON TRUE
        JOIN r b ON b.t = a.t + k.k
        CROSS JOIN m
        GROUP BY k.k)
      SELECT CAST(num.k AS BIGINT) AS lag, num.n_pairs,
             round(num.s / den.d, 6) AS acf
      FROM num CROSS JOIN den
      ORDER BY lag""")
  ) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = t(spark, dir).events
      .select(expr("(ts div 1000) div 86400000000").as("day"), $"value")
      .groupBy($"day")
      .agg(sum($"value".cast(Common.D)).cast("double").as("v"))
      .ckptLazy()
    val m = daily.agg(
      count(lit(1)).as("n"),
      (sum($"v".cast(Common.D)).cast("double") / count(lit(1)).cast("double")).as("mu"))
    val r = daily
      .withColumn("t", row_number().over(Window.orderBy($"day")).cast("long"))
      .select($"t", $"v")
      .crossJoin(broadcast(m.select($"mu")))
      .ckptLazy()
    val den = r.agg(
      sum(round(($"v" - $"mu") * ($"v" - $"mu"), 6).cast(Common.D))
        .cast("double").as("d"))
    val a = r.select($"t", $"v", $"mu")
      .crossJoin(broadcast(spark.range(1, 8).select($"id".as("k"))))
      .withColumn("tb", $"t" + $"k")
    val num = a.as("a")
      .join(r.select($"t".as("tb"), $"v".as("vb")), "tb")
      .groupBy($"k")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(round(($"v" - $"mu") * ($"vb" - $"mu"), 6).cast(Common.D))
          .cast("double").as("s"))
    num.crossJoin(broadcast(den))
      .select($"k".as("lag"), $"n_pairs", round($"s" / $"d", 6).as("acf"))
      .orderBy($"lag")
  }

  /** Gaps-and-islands: per-user consecutive-ACTIVE-DAY streaks via the
    * classic day − dense-day-rank grouping constant (consecutive days
    * share `day − rank`), reporting each user's longest streak, streak
    * count, and total active days — the engagement-contiguity signal
    * [[qSessionize]]'s time-gap sessions don't give (a session is
    * minutes; a streak is calendar days).
    *
    * Scale shape: distinct (user, day) is one shuffle; BOTH windows are
    * partitioned by user (bounded by a user's distinct days), then two
    * keyed aggregates. No unpartitioned anything.
    */
  val qStreaks: GQuery = GQuery(
    "q_seq_streaks",
    Some("""
      WITH ud AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        FROM events),
      g AS (
        SELECT user_id, day,
               day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
        FROM ud),
      s AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len
        FROM g GROUP BY user_id, grp)
      SELECT user_id,
             CAST(MAX(len) AS BIGINT) AS longest_streak,
             CAST(COUNT(*) AS BIGINT) AS n_streaks,
             CAST(SUM(len) AS BIGINT) AS active_days
      FROM s GROUP BY user_id
      ORDER BY user_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ud = t(spark, dir).events
      .select($"user_id", expr("(ts div 1000) div 86400000000").as("day"))
      .distinct()
    val g = ud.withColumn("grp",
      $"day" - row_number().over(Window.partitionBy($"user_id").orderBy($"day")))
    g.groupBy($"user_id", $"grp")
      .agg(count(lit(1)).as("len"))
      .groupBy($"user_id")
      .agg(
        max($"len").as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum($"len").as("active_days"))
      .orderBy($"user_id")
  }

  /** Top-20 three-event behavioural paths: the most common consecutive
    * (e1 → e2 → e3) trigrams over per-user event order — the
    * sequence-mining step above [[qTransitions]]' pair matrix (funnels
    * hypothesize an order; this DISCOVERS the dominant ones).
    *
    * Scale shape: both lead() windows are partitioned by user (bounded
    * by a user's own history), one path-count shuffle, TakeOrdered
    * top-20. Ties break on the path string for a deterministic cut.
    */
  val qEventPaths: GQuery = GQuery(
    "q_seq_event_paths",
    Some("""
      WITH o AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      p AS (
        SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path
        FROM o WHERE e2 IS NOT NULL AND e3 IS NOT NULL),
      c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY path),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM c)
      SELECT c.path, c.n,
             round(CAST(c.n AS DOUBLE) / CAST(tot.t AS DOUBLE), 6) AS share
      FROM c CROSS JOIN tot
      ORDER BY c.n DESC, c.path
      LIMIT 20""")
  ) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // order on the µs value on BOTH sides — DuckDB's parquet view
    // truncates ns timestamps to µs, so raw-ts ordering could break
    // ties differently (CLAUDE.md convention)
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val p = t(spark, dir).events
      .select($"user_id", $"event_type", expr("ts div 1000").as("ts_us"), $"event_id")
      .withColumn("e2", lead($"event_type", 1).over(w))
      .withColumn("e3", lead($"event_type", 2).over(w))
      .filter($"e2".isNotNull && $"e3".isNotNull)
      .select(concat($"event_type", lit(" > "), $"e2", lit(" > "), $"e3").as("path"))
    val c = p.groupBy($"path").agg(count(lit(1)).as("n")).ckptLazy()
    val tot = c.agg(sum($"n").as("t"))
    c.crossJoin(broadcast(tot))
      .select($"path", $"n",
        round($"n".cast("double") / $"t".cast("double"), 6).as("share"))
      .orderBy($"n".desc, $"path")
      .limit(20)
  }

  /** CEP-style sequence pattern matching (the MATCH_RECOGNIZE shape,
    * SQL:2016): per user, the event-type stream becomes a character
    * string in event-time order and a regex counts non-overlapping
    * browse-then-click-then-buy motifs (`v+c+p`) — the declarative
    * batch analog of what the reference's table agents hand-roll as
    * per-key state machines (callysto/src/types/table_agent.rs:116-179).
    *
    * Scale shape: per-user sequences are rank-capped at 512 events (the
    * hot-key discipline — an always-on user's history is unbounded at
    * 100 TB; the cap is deterministic earliest-512, replayed in the
    * oracle), so the collect and the regex both run on bounded strings;
    * the output is the match-count histogram, not per-user rows. The
    * `v+c+p` class of regex is scan-once with no backtracking blowup in
    * both engines.
    */
  val qPatternMatch: GQuery = GQuery(
    "q_seq_pattern_match",
    Some("""
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
                        CASE event_type WHEN 'signup' THEN 's' WHEN 'view' THEN 'v'
                             WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p' ELSE 'e' END AS ch
                 FROM events),
      capped AS (SELECT * FROM (
                   SELECT user_id, tus, event_id, ch,
                          row_number() OVER (PARTITION BY user_id ORDER BY tus, event_id) AS rn
                   FROM e) WHERE rn <= 512),
      seqs AS (SELECT user_id, string_agg(ch, '' ORDER BY tus, event_id) AS seq
               FROM capped GROUP BY 1),
      m AS (SELECT user_id, CAST(len(regexp_extract_all(seq, 'v+c+p')) AS BIGINT) AS n_matches,
                   CAST(len(seq) AS BIGINT) AS seq_len
            FROM seqs)
      SELECT n_matches, CAST(COUNT(*) AS BIGINT) AS n_users, CAST(SUM(seq_len) AS BIGINT) AS total_events
      FROM m GROUP BY 1 ORDER BY n_matches""")
  ) { (spark, dir) =>
    import spark.implicits._
    val e = t(spark, dir).events.select(
      $"user_id", $"event_id", expr("ts div 1000").as("tus"),
      when($"event_type" === "signup", "s")
        .when($"event_type" === "view", "v")
        .when($"event_type" === "click", "c")
        .when($"event_type" === "purchase", "p")
        .otherwise("e").as("ch"))
    val wCap = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
    val capped = e.withColumn("rn", row_number().over(wCap)).filter($"rn" <= 512)
    val seqs = capped.groupBy($"user_id")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(rn, ch))), x -> x.ch), '')")
        .as("seq"))
    val m = seqs.select(
      expr("cast(size(regexp_extract_all(seq, 'v+c+p', 0)) as bigint)").as("n_matches"),
      length($"seq").cast("long").as("seq_len"))
    m.groupBy($"n_matches")
      .agg(count(lit(1)).as("n_users"), sum($"seq_len").as("total_events"))
      .orderBy($"n_matches")
  }

  /** Degree assortativity of the part co-purchase graph — Newman's r:
    * the Pearson correlation of (deg u, deg v) over the directed edge
    * list; positive = hubs link to hubs, ~0 = degree-random (this
    * fixture), negative = hub-and-spoke. The structural companion to
    * q_graph_degree_dist's marginal (same marginal, different wiring —
    * assortativity tells them apart).
    *
    * Scale shape: edge generation is the basket-bounded order self-join
    * (≤ C(13,2) pairs/order — linear); degrees come from one groupBy of
    * the exploded edge list; moment sums go through DECIMAL and cast to
    * double while still < 2^53 (exact), and the final r is a fixed-order
    * IEEE `× − ÷` chain over those exact doubles — portable even though
    * the intermediate products exceed 2^53 (IEEE rounding is
    * deterministic; only the INPUTS must be exact). Beyond ~1e6-degree
    * graphs lift the moments to DECIMAL(38,0) and divide there first.
    */
  val qAssortativity: GQuery = GQuery(
    "q_graph_assortativity",
    Some("""
      WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
      deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d
              FROM (SELECT u FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
      de AS (SELECT du.d AS x, dv.d AS y
             FROM e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
             UNION ALL
             SELECT dv.d, du.d
             FROM e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node),
      s AS (SELECT CAST(CAST(COUNT(*) AS BIGINT) AS DOUBLE) AS se,
                   CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) AS sx,
                   CAST(CAST(SUM(x * x) AS BIGINT) AS DOUBLE) AS sxx,
                   CAST(CAST(SUM(x * y) AS BIGINT) AS DOUBLE) AS sxy
            FROM de),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg),
      ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e)
      SELECT nn.n_nodes, ne.n_edges,
             (s.se * s.sxy - s.sx * s.sx) / (s.se * s.sxx - s.sx * s.sx) AS assortativity
      FROM s, nn, ne""")
  ) { (spark, dir) =>
    import spark.implicits._
    val op = t(spark, dir).lineitem.select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
    val e = op.as("a").join(op.as("b"), $"a.o" === $"b.o" && $"a.p" < $"b.p")
      .select($"a.p".as("u"), $"b.p".as("v")).distinct()
      .ckptLazy() // feeds degrees + the edge-degree join (no subtree sharing)
    val deg = e.select($"u".as("node")).unionAll(e.select($"v"))
      .groupBy($"node").agg(count(lit(1)).as("d"))
    val de = e.join(deg.as("du"), $"u" === $"du.node")
      .join(deg.as("dv"), $"v" === $"dv.node")
      .select(explode(array(
        struct($"du.d".as("x"), $"dv.d".as("y")),
        struct($"dv.d".as("x"), $"du.d".as("y")))).as("q"))
      .select($"q.x".as("x"), $"q.y".as("y"))
    val s = de.agg(
      count(lit(1)).cast("double").as("se"),
      sum($"x").cast("long").cast("double").as("sx"),
      sum($"x" * $"x").cast("long").cast("double").as("sxx"),
      sum($"x" * $"y").cast("long").cast("double").as("sxy"))
    val nn = deg.agg(count(lit(1)).as("n_nodes"))
    val ne = e.agg(count(lit(1)).as("n_edges"))
    nn.crossJoin(broadcast(ne)).crossJoin(broadcast(s))
      .select($"n_nodes", $"n_edges",
        (($"se" * $"sxy" - $"sx" * $"sx") / ($"se" * $"sxx" - $"sx" * $"sx"))
          .as("assortativity"))
  }

  /** Resource-allocation link prediction over the co-purchase graph
    * ([[graft.operators.Graphs.resourceAllocation]]) — scores NON-edges
    * (u,v) by Σ 1/deg(z) over common neighbors z, the recommend-new-links
    * complement to [[qGraphNeighborJaccard]]'s existing-edge scoring.
    * Top 100 candidates by score.
    *
    * Scale shape: wedge join through the middle node with the deg ≤ 64
    * hot-middle cap (wedge volume is Σ deg(z)²; the cap is replayed by
    * the oracle so both engines see identical truncation), left_anti
    * against the known edges, and a global top-k that plans as
    * TakeOrderedAndProject (per-partition heaps, no full sort).
    * Portability: scores are exact BIGINT picounits (10^12 div deg
    * summed); ra_score is ONE IEEE division of an exact integer.
    */
  val qGraphLinkPredRa: GQuery = GQuery(
    "q_graph_link_pred_ra",
    Some("""
      WITH g AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      ew AS (SELECT a.i AS src, b.i AS dst, COUNT(*) AS w
             FROM g a JOIN g b ON a.g = b.g AND a.i < b.i
             GROUP BY 1, 2),
      e AS (SELECT src, dst FROM ew WHERE w >= 2),
      sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
      deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
      adj AS (SELECT s.src AS z, s.dst AS u, 1000000000000 // d.deg AS unit
              FROM sym s JOIN deg d ON d.node = s.src
              WHERE d.deg <= 64),
      pairs AS (SELECT a.u AS src, b.u AS dst,
                       CAST(COUNT(*) AS BIGINT) AS n_common,
                       CAST(SUM(a.unit) AS BIGINT) AS ra_pico
                FROM adj a JOIN adj b ON a.z = b.z AND a.u < b.u
                GROUP BY 1, 2
                HAVING COUNT(*) >= 2),
      cand AS (SELECT p.* FROM pairs p
               ANTI JOIN e ON e.src = p.src AND e.dst = p.dst)
      SELECT src, dst, n_common, ra_pico,
             CAST(ra_pico AS DOUBLE) / 1e12 AS ra_score
      FROM cand
      ORDER BY ra_pico DESC, src, dst
      LIMIT 100""")
  ) { (spark, dir) =>
    import spark.implicits._
    val edges = graft.operators.Graphs
      .cooccurrenceEdges(t(spark, dir).lineitem, "l_orderkey", "l_partkey")
      .filter($"weight" >= 2)
    graft.operators.Graphs
      .resourceAllocation(edges, minCommon = 2, maxMiddleDeg = 64L)
      .orderBy($"ra_pico".desc, $"src", $"dst")
      .limit(100)
  }

  /** Dynamic-time-warping distance between every pair of event-type
    * daily-value profiles — the elastic alignment similarity (phase-
    * shift-tolerant, unlike correlation) via the native
    * [[graft.functions.DtwDistance]] expression. The oracle replays the
    * FULL O(n·m) recurrence as an anti-diagonal recursive CTE (cells on
    * diagonal i+j depend only on the two previous diagonals, so each
    * step is one list_transform — the within-row left-dependency that
    * blocks a naive row recursion disappears), proving the codegen
    * expression equals the textbook DP bit-for-bit
    * (implementation-equality oracle pattern).
    *
    * Scale shape: the corpus-scale work is ONE (type, day) aggregation;
    * series are calendar-bounded (30 days here) so the per-pair DP is
    * O(days²) on |types|² rows — never corpus-sized. Portability: daily
    * values are DECIMAL-pinned; the DP is abs/+/min only (IEEE-exact
    * chains), dtw_per_step is one further division.
    */
  val qDtw: GQuery = GQuery(
    "q_ts_dtw",
    Some("""
      WITH RECURSIVE daily AS MATERIALIZED (
        SELECT event_type AS typ, epoch_us(ts) // 86400000000 AS day,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2),
      ser AS MATERIALIZED (
        SELECT typ, list(v ORDER BY day) AS series, CAST(COUNT(*) AS BIGINT) AS n
        FROM daily GROUP BY 1),
      pairs AS MATERIALIZED (
        SELECT a.typ AS ta, b.typ AS tb, a.series AS x, b.series AS y,
               a.n AS n, b.n AS m
        FROM ser a JOIN ser b ON a.typ < b.typ),
      rec AS (
        SELECT ta, tb, x, y, n, m, CAST(1 AS BIGINT) AS d,
               CAST(NULL AS DOUBLE[]) AS prev2,
               list_transform(range(1, CAST(n AS INT) + 1),
                 i -> CAST(NULL AS DOUBLE)) AS prev
        FROM pairs
        UNION ALL
        SELECT ta, tb, x, y, n, m, d + 1, prev,
               list_transform(range(1, CAST(n AS INT) + 1), i ->
                 CASE WHEN (d + 1 - i) BETWEEN 1 AND m
                      THEN abs(x[i] - y[d + 1 - i]) +
                           CASE WHEN i = 1 AND d = 1 THEN 0e0
                                ELSE least(
                                  COALESCE(CASE WHEN i > 1 THEN prev[i - 1] END, 1e308),
                                  COALESCE(CASE WHEN d - i >= 1 THEN prev[i] END, 1e308),
                                  COALESCE(CASE WHEN i > 1 AND d + 1 - i > 1
                                                THEN prev2[i - 1] END, 1e308))
                           END
                      ELSE CAST(NULL AS DOUBLE) END)
        FROM rec WHERE d < n + m)
      SELECT ta AS type_a, tb AS type_b, n AS n_days_a, m AS n_days_b,
             prev[CAST(n AS INT)] AS dtw_dist,
             prev[CAST(n AS INT)] / CAST(n + m AS DOUBLE) AS dtw_per_step
      FROM rec WHERE d = n + m
      ORDER BY type_a, type_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.queries.Common.dsum
    val daily = t(spark, dir).events
      .select(expr("(ts div 1000) div 86400000000").as("day"),
        $"event_type".as("typ"), $"value")
      .groupBy($"typ", $"day").agg(dsum($"value").as("v"))
    val ser = daily.groupBy($"typ")
      .agg(array_sort(collect_list(struct($"day", $"v"))).as("sv"))
      .select($"typ",
        transform($"sv", s => s.getField("v")).as("series"),
        size($"sv").cast("long").as("n"))
      .ckptLazy() // feeds both sides of the pair join
    ser.as("a").join(ser.as("b"), col("a.typ") < col("b.typ"))
      .select(col("a.typ").as("type_a"), col("b.typ").as("type_b"),
        col("a.n").as("n_days_a"), col("b.n").as("n_days_b"),
        call_function("graft_dtw", col("a.series"), col("b.series")).as("dtw_dist"))
      .withColumn("dtw_per_step",
        $"dtw_dist" / ($"n_days_a" + $"n_days_b").cast("double"))
      .orderBy($"type_a", $"type_b")
  }

  /** Viterbi MAP decoding of a 2-state HMM (casual=0 / intent=1) over
    * each user's event-character sequence — the latent-state sequence
    * labeler (session-intent segmentation) above [[qTransitions]]'
    * observable Markov chain. Model parameters are DATA-INDEPENDENT
    * constants quantized in the driver JVM to integer micro-log units
    * (round(1e6·ln p) — the q_text_naive_bayes deterministic-serving
    * convention), so the entire DP is INTEGER max-plus arithmetic: no
    * float argmax boundary exists, and exact ties break to state 0 via
    * the same `>=` on both engines. Emits the full decoded path per
    * user (string), the MAP score and the final state.
    *
    * Scale shape: per-user sequences are rank-capped at 512 (the
    * qPatternMatch cap) and the DP folds each sequence in ONE
    * `aggregate` over a post-projection attribute (the HOF-recapture
    * discipline) — row-local, zero extra shuffle. The oracle replays
    * the fold as a recursive CTE stepping all users in lockstep
    * (depth ≤ 512, one self-reference — linear, timed standalone).
    */
  val qViterbi: GQuery = {
    def w(p: Double): Long = math.round(math.log(p) * 1e6)
    // init, transition, emission log-probs in micro units
    val (pi0, pi1) = (w(0.8), w(0.2))
    val (t00, t01, t10, t11) = (w(0.9), w(0.1), w(0.2), w(0.8))
    val em0 = Map("v" -> w(0.5), "c" -> w(0.3), "s" -> w(0.05), "p" -> w(0.05), "e" -> w(0.1))
    val em1 = Map("v" -> w(0.2), "c" -> w(0.3), "s" -> w(0.1), "p" -> w(0.35), "e" -> w(0.05))
    def emitSql(m: Map[String, Long], chExpr: String): String =
      s"""CASE $chExpr WHEN 'v' THEN ${m("v")} WHEN 'c' THEN ${m("c")}
          WHEN 's' THEN ${m("s")} WHEN 'p' THEN ${m("p")} ELSE ${m("e")} END"""
    GQuery(
      "q_seq_viterbi",
      Some(s"""
      WITH RECURSIVE e AS (
        SELECT user_id, event_id, epoch_us(ts) AS tus,
               CASE event_type WHEN 'signup' THEN 's' WHEN 'view' THEN 'v'
                    WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p' ELSE 'e' END AS ch
        FROM events),
      capped AS (SELECT * FROM (
                   SELECT user_id, tus, event_id, ch,
                          row_number() OVER (PARTITION BY user_id ORDER BY tus, event_id) AS rn
                   FROM e) WHERE rn <= 512),
      seqs AS MATERIALIZED (
        SELECT user_id, string_agg(ch, '' ORDER BY tus, event_id) AS seq
        FROM capped GROUP BY 1),
      rec AS (
        SELECT user_id, seq, CAST(len(seq) AS BIGINT) AS len, CAST(1 AS BIGINT) AS t,
               $pi0 + ${emitSql(em0, "substr(seq, 1, 1)")} AS s0, '0' AS p0,
               $pi1 + ${emitSql(em1, "substr(seq, 1, 1)")} AS s1, '1' AS p1
        FROM seqs
        UNION ALL
        SELECT user_id, seq, len, t + 1,
               ${emitSql(em0, "substr(seq, CAST(t + 1 AS INT), 1)")}
                 + greatest(s0 + $t00, s1 + $t10),
               CASE WHEN s0 + $t00 >= s1 + $t10 THEN p0 ELSE p1 END || '0',
               ${emitSql(em1, "substr(seq, CAST(t + 1 AS INT), 1)")}
                 + greatest(s0 + $t01, s1 + $t11),
               CASE WHEN s0 + $t01 >= s1 + $t11 THEN p0 ELSE p1 END || '1'
        FROM rec WHERE t < len)
      SELECT user_id, len AS seq_len,
             CAST(CASE WHEN s0 >= s1 THEN 0 ELSE 1 END AS BIGINT) AS final_state,
             CAST(CASE WHEN s0 >= s1 THEN s0 ELSE s1 END AS BIGINT) AS score_micro,
             CASE WHEN s0 >= s1 THEN p0 ELSE p1 END AS path
      FROM rec WHERE t = len
      ORDER BY user_id""")
    ) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir).events.select(
        $"user_id", $"event_id", expr("ts div 1000").as("tus"),
        when($"event_type" === "signup", "s")
          .when($"event_type" === "view", "v")
          .when($"event_type" === "click", "c")
          .when($"event_type" === "purchase", "p")
          .otherwise("e").as("ch"))
      val wCap = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
      val seqs = e.withColumn("rn", row_number().over(wCap)).filter($"rn" <= 512)
        .groupBy($"user_id")
        .agg(expr("array_join(transform(array_sort(collect_list(struct(rn, ch))), x -> x.ch), '')")
          .as("seq"))
      def emit(m: Map[String, Long], ch: Column): Column =
        when(ch === "v", m("v")).when(ch === "c", m("c"))
          .when(ch === "s", m("s")).when(ch === "p", m("p")).otherwise(m("e"))
      val folded = seqs.select($"user_id", length($"seq").cast("long").as("seq_len"),
        aggregate(
          sequence(lit(1), length($"seq")),
          struct(lit(0L).as("s0"), lit("").as("p0"), lit(0L).as("s1"), lit("").as("p1")),
          (acc, i) => {
            val ch = $"seq".substr(i, lit(1))
            val (a0, a1) = (acc.getField("s0"), acc.getField("s1"))
            val (q0, q1) = (acc.getField("p0"), acc.getField("p1"))
            val ns0 = when(i === 1, lit(pi0) + emit(em0, ch))
              .otherwise(emit(em0, ch) + greatest(a0 + t00, a1 + t10))
            val np0 = when(i === 1, lit("0"))
              .otherwise(concat(when(a0 + t00 >= a1 + t10, q0).otherwise(q1), lit("0")))
            val ns1 = when(i === 1, lit(pi1) + emit(em1, ch))
              .otherwise(emit(em1, ch) + greatest(a0 + t01, a1 + t11))
            val np1 = when(i === 1, lit("1"))
              .otherwise(concat(when(a0 + t01 >= a1 + t11, q0).otherwise(q1), lit("1")))
            struct(ns0.as("s0"), np0.as("p0"), ns1.as("s1"), np1.as("p1"))
          },
          st => struct(
            when(st.getField("s0") >= st.getField("s1"), 0L).otherwise(1L).as("final_state"),
            greatest(st.getField("s0"), st.getField("s1")).as("score_micro"),
            when(st.getField("s0") >= st.getField("s1"), st.getField("p0"))
              .otherwise(st.getField("p1")).as("path"))
        ).as("vit"))
      folded.select($"user_id", $"seq_len",
        $"vit.final_state".as("final_state"),
        $"vit.score_micro".as("score_micro"),
        $"vit.path".as("path"))
        .orderBy($"user_id")
    }
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004) — PageRank over
    * the adjacent-token co-occurrence graph, top 20 tokens: the
    * unsupervised keyword ranker that pure frequency ([[graft.queries
    * .TextAnalysis]] token_freq) gets wrong for well-connected but
    * mid-frequency terms. Pure composition: bigram edges (canonical
    * least/greatest, self-pairs dropped, weight ≥ 3 prune) feed the
    * SAME [[graft.operators.Graphs.pagerank]] the co-purchase query
    * uses — one operator, two domains. The oracle replays the identical
    * 1e-15 fixed-point 3-iteration recursion (q_graph_pagerank's replay
    * text) over the token edge CTE; scores are engine-identical so the
    * top-20 cut is deterministic (ties break on token).
    *
    * Scale shape: bigram generation is row-local over a post-projection
    * token array; the edge groupBy and each rank iteration shuffle on
    * the token key — all linear in corpus tokens.
    */
  val qTextRank: GQuery = GQuery(
    "q_text_textrank",
    Some("""
      WITH d AS (SELECT string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
                 FROM documents),
      bg AS (SELECT ts[i] AS a, ts[i+1] AS b
             FROM d, LATERAL (SELECT unnest(generate_series(1, len(ts)-1)) AS i) g
             WHERE len(ts) >= 2),
      e2 AS (SELECT least(a, b) AS src, greatest(a, b) AS dst
             FROM bg WHERE a <> b GROUP BY 1, 2 HAVING COUNT(*) >= 3),
      sym AS (SELECT src, dst FROM e2 UNION SELECT dst, src FROM e2),
      deg AS (SELECT src AS node, COUNT(*) AS deg FROM sym GROUP BY 1),
      nn AS (SELECT COUNT(*) AS n FROM deg),
      p0 AS (SELECT d.node, CAST(1 AS DOUBLE) / nn.n AS pr, d.deg
             FROM deg d CROSS JOIN nn),
      c1 AS (SELECT s.dst AS node,
                    CAST(SUM(CAST(floor((p.pr / p.deg) * 1e15) AS BIGINT)) AS DOUBLE) / 1e15 AS acc
             FROM sym s JOIN p0 p ON p.node = s.src GROUP BY 1),
      p1 AS (SELECT d.node,
                    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
                      + CAST(0.85 AS DOUBLE) * COALESCE(c1.acc, CAST(0 AS DOUBLE)) AS pr,
                    d.deg
             FROM deg d CROSS JOIN nn LEFT JOIN c1 ON c1.node = d.node),
      c2 AS (SELECT s.dst AS node,
                    CAST(SUM(CAST(floor((p.pr / p.deg) * 1e15) AS BIGINT)) AS DOUBLE) / 1e15 AS acc
             FROM sym s JOIN p1 p ON p.node = s.src GROUP BY 1),
      p2 AS (SELECT d.node,
                    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
                      + CAST(0.85 AS DOUBLE) * COALESCE(c2.acc, CAST(0 AS DOUBLE)) AS pr,
                    d.deg
             FROM deg d CROSS JOIN nn LEFT JOIN c2 ON c2.node = d.node),
      c3 AS (SELECT s.dst AS node,
                    CAST(SUM(CAST(floor((p.pr / p.deg) * 1e15) AS BIGINT)) AS DOUBLE) / 1e15 AS acc
             FROM sym s JOIN p2 p ON p.node = s.src GROUP BY 1),
      p3 AS (SELECT d.node,
                    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
                      + CAST(0.85 AS DOUBLE) * COALESCE(c3.acc, CAST(0 AS DOUBLE)) AS pr,
                    d.deg
             FROM deg d CROSS JOIN nn LEFT JOIN c3 ON c3.node = d.node)
      SELECT node AS token, CAST(deg AS BIGINT) AS degree, pr AS textrank
      FROM p3 ORDER BY pr DESC, token LIMIT 20""")
  ) { (spark, dir) =>
    import spark.implicits._
    val bg = t(spark, dir).documents
      .select(graft.operators.TextOps.tokens($"text").as("ts")) // attribute boundary pre-HOF
      .filter(size($"ts") >= 2)
      .select(explode(transform(sequence(lit(1), size($"ts") - 1),
        i => struct(element_at($"ts", i).as("a"), element_at($"ts", i + 1).as("b"))))
        .as("p"))
      .select($"p.a".as("a"), $"p.b".as("b"))
      .filter($"a" =!= $"b")
    val edges = bg
      .select(least($"a", $"b").as("src"), greatest($"a", $"b").as("dst"))
      .groupBy($"src", $"dst").agg(count(lit(1)).as("weight"))
      .filter($"weight" >= 3)
    val sym = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst"))).distinct()
    val degrees = sym.groupBy($"src".as("node")).agg(count(lit(1)).as("degree"))
    graft.operators.Graphs.pagerank(edges, k = 3)
      .join(degrees, Seq("node"))
      .select($"node".as("token"), $"degree", $"pr".as("textrank"))
      .orderBy($"textrank".desc, $"token")
      .limit(20)
  }

  /** Holt double-exponential smoothing (level + trend, α = β = 1/2) of
    * each event type's daily series, with a 7-day-ahead forecast fan and
    * the in-sample one-step SSE — the trend-aware forecaster that
    * [[qDecayAvg]]'s level-only EWMA can't give (a ramping series lags
    * it by a constant). Init: l₁ = y₁, b₁ = y₂ − y₁; recurrence
    * l_t = ½y_t + ½(l_{t−1} + b_{t−1}), b_t = ½(l_t − l_{t−1}) +
    * ½b_{t−1}; forecast ŷ_{n+h} = l_n + h·b_n.
    *
    * Portability: ×½ is an exact IEEE exponent shift and every other op
    * is one +/−/× on identical inputs, applied in ONE fixed sequential
    * fold (the SSE accumulates INSIDE the fold, so it is a fixed-order
    * chain, not an unordered float sum) — the oracle replays the exact
    * op tree as a lockstep recursive CTE and every raw double matches.
    * Scale shape: one (type, day) corpus aggregation; the fold is
    * row-local over a calendar-bounded post-projection array.
    */
  val qHolt: GQuery = GQuery(
    "q_ts_holt",
    Some("""
      WITH RECURSIVE daily AS MATERIALIZED (
        SELECT event_type AS typ, epoch_us(ts) // 86400000000 AS day,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2),
      ser AS MATERIALIZED (
        SELECT typ, list(v ORDER BY day) AS y, CAST(COUNT(*) AS BIGINT) AS n
        FROM daily GROUP BY 1),
      rec AS (
        SELECT typ, y, n, CAST(1 AS BIGINT) AS t,
               y[1] AS l, 0e0 AS b, 0e0 AS sse
        FROM ser
        UNION ALL
        SELECT typ, y, n, t + 1,
               0.5 * y[CAST(t + 1 AS INT)]
                 + 0.5 * (l + CASE WHEN t = 1 THEN y[CAST(t + 1 AS INT)] - l ELSE b END),
               0.5 * ((0.5 * y[CAST(t + 1 AS INT)]
                       + 0.5 * (l + CASE WHEN t = 1 THEN y[CAST(t + 1 AS INT)] - l ELSE b END)) - l)
                 + 0.5 * CASE WHEN t = 1 THEN y[CAST(t + 1 AS INT)] - l ELSE b END,
               sse + (y[CAST(t + 1 AS INT)]
                      - (l + CASE WHEN t = 1 THEN y[CAST(t + 1 AS INT)] - l ELSE b END))
                   * (y[CAST(t + 1 AS INT)]
                      - (l + CASE WHEN t = 1 THEN y[CAST(t + 1 AS INT)] - l ELSE b END))
        FROM rec WHERE t < n),
      fin AS (SELECT typ, n, l, b, sse FROM rec WHERE t = n AND n >= 2)
      SELECT f.typ AS event_type, f.n AS n_days, f.l AS level, f.b AS trend, f.sse,
             CAST(h.h AS BIGINT) AS h, f.l + CAST(h.h AS DOUBLE) * f.b AS forecast
      FROM fin f, LATERAL (SELECT unnest(generate_series(1, 7)) AS h) h
      ORDER BY event_type, h""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.queries.Common.dsum
    val daily = t(spark, dir).events
      .select(expr("(ts div 1000) div 86400000000").as("day"),
        $"event_type".as("typ"), $"value")
      .groupBy($"typ", $"day").agg(dsum($"value").as("v"))
    val ser = daily.groupBy($"typ")
      .agg(array_sort(collect_list(struct($"day", $"v"))).as("sv"))
      .select($"typ",
        transform($"sv", s => s.getField("v")).as("y"),
        size($"sv").cast("long").as("n_days"))
      // Spark's sequence(2, n) runs BACKWARDS for n = 1 — a 1-day series
      // must not fold at all (the oracle's t < n guard stops at the base)
      .filter(size($"y") >= 2)
    val folded = ser.select($"typ".as("event_type"), $"n_days",
      aggregate(
        sequence(lit(2), size($"y")),
        struct(element_at($"y", 1).as("l"), lit(0.0).as("b"), lit(0.0).as("sse")),
        (acc, i) => {
          val yv = element_at($"y", i)
          val bprev = when(i === 2, yv - acc.getField("l")).otherwise(acc.getField("b"))
          val pred = acc.getField("l") + bprev
          val e = yv - pred
          val l = lit(0.5) * yv + lit(0.5) * pred
          struct(l.as("l"),
            (lit(0.5) * (l - acc.getField("l")) + lit(0.5) * bprev).as("b"),
            (acc.getField("sse") + e * e).as("sse"))
        }).as("st"))
    folded.select($"event_type", $"n_days",
      $"st.l".as("level"), $"st.b".as("trend"), $"st.sse".as("sse"),
      explode(sequence(lit(1L), lit(7L))).as("h"))
      .withColumn("forecast", $"level" + $"h".cast("double") * $"trend")
      .orderBy($"event_type", $"h")
  }

  /** Kendall rank correlation (tau-b) between every pair of event-type
    * daily series — the RANK-based dependence measure that, unlike
    * [[qCrossCorr]]'s Pearson r, ignores magnitudes entirely (robust to
    * the heavy-tailed daily sums a Zipfian corpus produces) and, unlike
    * q_stat_spearman, is built from pairwise concordance so the tie
    * correction is exact. Day pairs i<j per type pair: concordant /
    * discordant / x-tie / y-tie counts, τ_b = (C−D)/√((n₀−t_x)(n₀−t_y)).
    *
    * Portability: values quantize once to centi-units (the cross-corr
    * convention); every count is an exact BIGINT ((Δx·Δy) ≤ 4e16 <
    * 2^63); τ_b is ONE fixed ÷√× IEEE chain over integers ≤ 67k — exact
    * as doubles. NULL (not ÷0) when a series is constant. Scale shape:
    * one corpus aggregation to (type, day), then day-pair self-joins on
    * CALENDAR-bounded tables (≤366 rows/type) — O(types²·days²) with
    * days fixed, never corpus-sized.
    */
  val qKendall: GQuery = GQuery(
    "q_stat_kendall",
    Some("""
      WITH daily AS MATERIALIZED (
        SELECT event_type AS typ, epoch_us(ts) // 86400000000 AS day,
               CAST(floor(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) * 100 + 0.5) AS BIGINT) AS vq
        FROM events GROUP BY 1, 2),
      xy AS MATERIALIZED (
        SELECT a.typ AS type_a, b.typ AS type_b, a.day, a.vq AS x, b.vq AS y
        FROM daily a JOIN daily b ON b.typ > a.typ AND b.day = a.day),
      nd AS (SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_days
             FROM xy GROUP BY 1, 2),
      pr AS (
        SELECT p.type_a, p.type_b,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN (p.x - q.x) * (p.y - q.y) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_conc,
               CAST(SUM(CASE WHEN (p.x - q.x) * (p.y - q.y) < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_disc,
               CAST(SUM(CASE WHEN p.x = q.x THEN 1 ELSE 0 END) AS BIGINT) AS n_tie_x,
               CAST(SUM(CASE WHEN p.y = q.y THEN 1 ELSE 0 END) AS BIGINT) AS n_tie_y
        FROM xy p JOIN xy q
          ON q.type_a = p.type_a AND q.type_b = p.type_b AND q.day > p.day
        GROUP BY 1, 2)
      SELECT pr.type_a, pr.type_b, nd.n_days, pr.n_pairs,
             pr.n_conc, pr.n_disc, pr.n_tie_x, pr.n_tie_y,
             CASE WHEN pr.n_pairs - pr.n_tie_x > 0 AND pr.n_pairs - pr.n_tie_y > 0
                  THEN CAST(pr.n_conc - pr.n_disc AS DOUBLE)
                       / sqrt(CAST(pr.n_pairs - pr.n_tie_x AS DOUBLE)
                              * CAST(pr.n_pairs - pr.n_tie_y AS DOUBLE))
                  ELSE NULL END AS tau_b
      FROM pr JOIN nd USING (type_a, type_b)
      ORDER BY type_a, type_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.queries.Common.D
    val daily = t(spark, dir).events
      .select(expr("(ts div 1000) div 86400000000").as("day"),
        $"event_type".as("typ"), $"value")
      .groupBy($"typ", $"day")
      .agg(floor(sum($"value".cast(D)).cast("double") * 100 + 0.5).cast("long").as("vq"))
      .ckptLazy() // both sides of the type-pair join
    val xy = daily.as("a")
      .join(daily.as("b"), $"b.typ" > $"a.typ" && $"b.day" === $"a.day")
      .select($"a.typ".as("type_a"), $"b.typ".as("type_b"), $"a.day".as("day"),
        $"a.vq".as("x"), $"b.vq".as("y"))
      .ckptLazy() // both sides of the day-pair join + the day count
    val nd = xy.groupBy($"type_a", $"type_b").agg(count(lit(1)).as("n_days"))
    val pr = xy.as("p")
      .join(xy.as("q"),
        $"q.type_a" === $"p.type_a" && $"q.type_b" === $"p.type_b" && $"q.day" > $"p.day")
      .groupBy($"p.type_a".as("type_a"), $"p.type_b".as("type_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(($"p.x" - $"q.x") * ($"p.y" - $"q.y") > 0, 1L).otherwise(0L)).as("n_conc"),
        sum(when(($"p.x" - $"q.x") * ($"p.y" - $"q.y") < 0, 1L).otherwise(0L)).as("n_disc"),
        sum(when($"p.x" === $"q.x", 1L).otherwise(0L)).as("n_tie_x"),
        sum(when($"p.y" === $"q.y", 1L).otherwise(0L)).as("n_tie_y"))
    pr.join(broadcast(nd), Seq("type_a", "type_b"))
      .select($"type_a", $"type_b", $"n_days", $"n_pairs",
        $"n_conc", $"n_disc", $"n_tie_x", $"n_tie_y",
        when($"n_pairs" - $"n_tie_x" > 0 && $"n_pairs" - $"n_tie_y" > 0,
          ($"n_conc" - $"n_disc").cast("double")
            / sqrt(($"n_pairs" - $"n_tie_x").cast("double")
              * ($"n_pairs" - $"n_tie_y").cast("double")))
          .as("tau_b"))
      .orderBy($"type_a", $"type_b")
  }

  /** Wald–Wolfowitz runs test on each event type's daily up/down
    * sequence — the randomness check ("is this metric trending or
    * mean-reverting beyond chance?") a monitoring pipeline runs before
    * alerting on streaks. Day-over-day signs (ties on the quantized
    * value dropped, the standard treatment), R = number of runs,
    * z = (R − μ)/σ with the exact n₁,n₂ moments.
    *
    * Portability: signs come from quantized-integer comparisons; R, n₁,
    * n₂ are exact BIGINTs (lag window PARTITIONED by type,
    * calendar-bounded); μ and σ² are ratios of integer products ≤ 7e10
    * (exact in double), z one fixed IEEE chain, NULL when σ² = 0 or a
    * direction is missing. RAW doubles out, no rounding.
    */
  val qRunsTest: GQuery = GQuery(
    "q_stat_runs",
    Some("""
      WITH daily AS MATERIALIZED (
        SELECT event_type AS typ, epoch_us(ts) // 86400000000 AS day,
               CAST(floor(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) * 100 + 0.5) AS BIGINT) AS vq
        FROM events GROUP BY 1, 2),
      chg AS (
        SELECT typ, day, vq,
               vq - lag(vq) OVER (PARTITION BY typ ORDER BY day) AS d
        FROM daily),
      sgn AS (SELECT typ, day, CASE WHEN d > 0 THEN 1 ELSE 0 END AS s
              FROM chg WHERE d IS NOT NULL AND d != 0),
      runs AS (
        SELECT typ, day, s,
               CASE WHEN lag(s) OVER (PARTITION BY typ ORDER BY day) IS NULL
                         OR lag(s) OVER (PARTITION BY typ ORDER BY day) != s
                    THEN 1 ELSE 0 END AS brk
        FROM sgn),
      agg AS (
        SELECT typ, CAST(SUM(brk) AS BIGINT) AS r,
               CAST(SUM(s) AS BIGINT) AS n_up,
               CAST(COUNT(*) - SUM(s) AS BIGINT) AS n_down
        FROM runs GROUP BY 1)
      SELECT typ AS event_type, r AS n_runs, n_up, n_down,
             CASE WHEN n_up > 0 AND n_down > 0 THEN
               (CAST(r AS DOUBLE)
                - (CAST(2 * n_up * n_down AS DOUBLE) / CAST(n_up + n_down AS DOUBLE) + 1e0))
               / sqrt(CAST(2 * n_up * n_down * (2 * n_up * n_down - n_up - n_down) AS DOUBLE)
                      / (CAST((n_up + n_down) * (n_up + n_down) AS DOUBLE)
                         * CAST(n_up + n_down - 1 AS DOUBLE)))
             ELSE NULL END AS z
      FROM agg
      ORDER BY event_type""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.queries.Common.D
    import org.apache.spark.sql.expressions.Window
    val daily = t(spark, dir).events
      .select(expr("(ts div 1000) div 86400000000").as("day"),
        $"event_type".as("typ"), $"value")
      .groupBy($"typ", $"day")
      .agg(floor(sum($"value".cast(D)).cast("double") * 100 + 0.5).cast("long").as("vq"))
    val wd = Window.partitionBy($"typ").orderBy($"day") // calendar-bounded per type
    val sgn = daily.withColumn("d", $"vq" - lag($"vq", 1).over(wd))
      .filter($"d".isNotNull && $"d" =!= 0)
      .select($"typ", $"day", when($"d" > 0, 1L).otherwise(0L).as("s"))
    val runs = sgn.withColumn("prev", lag($"s", 1).over(wd))
      .withColumn("brk", when($"prev".isNull || $"prev" =!= $"s", 1L).otherwise(0L))
    val agg = runs.groupBy($"typ")
      .agg(sum($"brk").as("r"), sum($"s").as("n_up"),
        (count(lit(1)) - sum($"s")).as("n_down"))
    agg.select($"typ".as("event_type"), $"r".as("n_runs"), $"n_up", $"n_down",
      when($"n_up" > 0 && $"n_down" > 0,
        ($"r".cast("double")
          - ((lit(2L) * $"n_up" * $"n_down").cast("double")
            / ($"n_up" + $"n_down").cast("double") + lit(1.0)))
          / sqrt((lit(2L) * $"n_up" * $"n_down"
            * (lit(2L) * $"n_up" * $"n_down" - $"n_up" - $"n_down")).cast("double")
            / ((($"n_up" + $"n_down") * ($"n_up" + $"n_down")).cast("double")
              * ($"n_up" + $"n_down" - 1).cast("double"))))
        .as("z"))
      .orderBy($"event_type")
  }

  /** Cohen's d effect size between event-type daily series — the
    * MAGNITUDE companion every significance test here (t-shaped
    * qAbTest, qMannWhitney, qWilcoxon) needs: a p-value says a gap
    * exists, d = (x̄ − ȳ)/s_pooled says whether anyone should care
    * (0.2/0.5/0.8 small/medium/large). Per type pair over the
    * day-aligned quantized series.
    *
    * Portability: means and the pooled variance are single IEEE
    * divisions/chains over exact BIGINT moments (Σv, Σv², n ≤ 366,
    * |vq| ≤ 1e8 keeps Σv² < 2^63); d is RAW, NULL when the pooled
    * variance degenerates.
    */
  val qCohensD: GQuery = GQuery(
    "q_stat_cohens_d",
    Some("""
      WITH daily AS MATERIALIZED (
        SELECT event_type AS typ, epoch_us(ts) // 86400000000 AS day,
               CAST(floor(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) * 100 + 0.5) AS BIGINT) AS vq
        FROM events GROUP BY 1, 2),
      xy AS (
        SELECT a.typ AS type_a, b.typ AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a.vq) AS BIGINT) AS sx, CAST(SUM(b.vq) AS BIGINT) AS sy,
               CAST(SUM(a.vq * a.vq) AS BIGINT) AS sxx,
               CAST(SUM(b.vq * b.vq) AS BIGINT) AS syy
        FROM daily a JOIN daily b ON b.typ > a.typ AND b.day = a.day
        GROUP BY 1, 2)
      SELECT type_a, type_b, n,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_a,
             CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_b,
             CASE WHEN n >= 2 AND
                       (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                       + (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) > 0
                  THEN (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                       / sqrt(((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                               + (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
                              / CAST(2 * n - 2 AS DOUBLE))
                  ELSE NULL END AS cohens_d
      FROM xy ORDER BY type_a, type_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.queries.Common.D
    val daily = t(spark, dir).events
      .select(expr("(ts div 1000) div 86400000000").as("day"),
        $"event_type".as("typ"), $"value")
      .groupBy($"typ", $"day")
      .agg(floor(sum($"value".cast(D)).cast("double") * 100 + 0.5).cast("long").as("vq"))
      .ckptLazy() // both sides of the type-pair join
    val xy = daily.as("a")
      .join(daily.as("b"), $"b.typ" > $"a.typ" && $"b.day" === $"a.day")
      .groupBy($"a.typ".as("type_a"), $"b.typ".as("type_b"))
      .agg(count(lit(1)).as("n"),
        sum($"a.vq").as("sx"), sum($"b.vq").as("sy"),
        sum($"a.vq" * $"a.vq").as("sxx"), sum($"b.vq" * $"b.vq").as("syy"))
    val nD = $"n".cast("double")
    val ssa = $"sxx".cast("double") - $"sx".cast("double") * $"sx".cast("double") / nD
    val ssb = $"syy".cast("double") - $"sy".cast("double") * $"sy".cast("double") / nD
    xy.select($"type_a", $"type_b", $"n",
      ($"sx".cast("double") / nD).as("mean_a"),
      ($"sy".cast("double") / nD).as("mean_b"),
      when($"n" >= 2 && ssa + ssb > 0,
        ($"sx".cast("double") / nD - $"sy".cast("double") / nD)
          / sqrt((ssa + ssb) / (lit(2L) * $"n" - 2).cast("double")))
        .as("cohens_d"))
      .orderBy($"type_a", $"type_b")
  }

  /** Mann–Kendall trend test per event-type daily series — the
    * nonparametric monotone-trend detector that pairs with
    * q_ts_theil_sen's slope (MK gives the significance, Theil–Sen the
    * magnitude — the standard hydrology/monitoring duo): S = Σ_{i<j}
    * sign(v_j − v_i) over day pairs, tie-corrected variance, and the
    * continuity-corrected z.
    *
    * Portability: S and the tie term are exact BIGINTs off quantized
    * values (day pairs are calendar-bounded: ≤ 366·365/2 per type);
    * var(S) = [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18 is ONE division of
    * exact integers; z one ÷√ chain, NULL when var degenerates.
    */
  val qMannKendall: GQuery = GQuery(
    "q_ts_mann_kendall",
    Some("""
      WITH daily AS MATERIALIZED (
        SELECT event_type AS typ, epoch_us(ts) // 86400000000 AS day,
               CAST(floor(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) * 100 + 0.5) AS BIGINT) AS vq
        FROM events GROUP BY 1, 2),
      s AS (
        SELECT p.typ,
               CAST(SUM(CASE WHEN q.vq > p.vq THEN 1 WHEN q.vq < p.vq THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        FROM daily p JOIN daily q ON q.typ = p.typ AND q.day > p.day
        GROUP BY 1),
      ties AS (
        SELECT typ, CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        FROM (SELECT typ, vq, CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY 1, 2)
        GROUP BY 1),
      nn AS (SELECT typ, CAST(COUNT(*) AS BIGINT) AS n FROM daily GROUP BY 1)
      SELECT nn.typ AS event_type, nn.n AS n_days, s.s_stat, ties.tie_term,
             CASE WHEN (CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term AS DOUBLE) / 18e0) > 0
                  THEN (CAST(s.s_stat AS DOUBLE)
                        - CASE WHEN s.s_stat > 0 THEN 1e0 WHEN s.s_stat < 0 THEN -1e0 ELSE 0e0 END)
                       / sqrt(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term AS DOUBLE) / 18e0)
                  ELSE NULL END AS z
      FROM nn JOIN s ON s.typ = nn.typ JOIN ties ON ties.typ = nn.typ
      ORDER BY event_type""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.queries.Common.D
    val daily = t(spark, dir).events
      .select(expr("(ts div 1000) div 86400000000").as("day"),
        $"event_type".as("typ"), $"value")
      .groupBy($"typ", $"day")
      .agg(floor(sum($"value".cast(D)).cast("double") * 100 + 0.5).cast("long").as("vq"))
      .ckptLazy() // pair join sides + tie histogram + day counts
    val s = daily.as("p")
      .join(daily.as("q"), $"q.typ" === $"p.typ" && $"q.day" > $"p.day")
      .groupBy($"p.typ".as("typ"))
      .agg(sum(when($"q.vq" > $"p.vq", 1L).when($"q.vq" < $"p.vq", -1L)
        .otherwise(0L)).as("s_stat"))
    val ties = daily.groupBy($"typ", $"vq").agg(count(lit(1)).as("t"))
      .groupBy($"typ")
      .agg(sum($"t" * ($"t" - 1) * (lit(2L) * $"t" + 5)).as("tie_term"))
    val nn = daily.groupBy($"typ").agg(count(lit(1)).as("n"))
    val varD = ($"n" * ($"n" - 1) * (lit(2L) * $"n" + 5) - $"tie_term").cast("double") / lit(18.0)
    nn.join(s, "typ").join(ties, "typ")
      .select($"typ".as("event_type"), $"n".as("n_days"), $"s_stat", $"tie_term",
        when(varD > 0,
          ($"s_stat".cast("double")
            - when($"s_stat" > 0, 1.0).when($"s_stat" < 0, -1.0).otherwise(0.0))
            / sqrt(varD)).as("z"))
      .orderBy($"event_type")
  }

  /** Double-sweep diameter estimate of the co-purchase graph — the
    * classic 2-BFS lower bound (exact on trees, near-exact on real
    * graphs; Magnien–Latapy–Habib): sweep 1 from the max-degree node
    * finds the farthest node u, sweep 2 from u measures ecc(u) — the
    * diameter estimate. The graph-health number (is the giant component
    * shallow or stringy?) that single-source BFS (q_graph_bfs) doesn't
    * expose. All-integer hop counts; both sweeps ride
    * [[graft.operators.Graphs.bfsHops]] and the oracle replays them as
    * two recursive walks with identical deterministic tie-breaks
    * (min hops per node; farthest = max hops, tie → min id).
    */
  val qDiameter: GQuery = GQuery(
    "q_graph_diameter",
    Some("""
      WITH RECURSIVE g AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      e AS (SELECT a.i AS src, b.i AS dst
            FROM g a JOIN g b ON a.g = b.g AND a.i < b.i
            GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      ed AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
      s AS (SELECT src AS s0 FROM (SELECT src, COUNT(*) AS deg FROM ed GROUP BY 1)
            ORDER BY deg DESC, src LIMIT 1),
      w1(node, d) AS (
        SELECT s0, 0 FROM s
        UNION
        SELECT x.dst, w.d + 1 FROM w1 w JOIN ed x ON w.node = x.src WHERE w.d < 30),
      d1 AS MATERIALIZED (SELECT node, CAST(MIN(d) AS BIGINT) AS d FROM w1 GROUP BY 1),
      u AS (SELECT node AS u0, d AS ecc_source FROM d1 ORDER BY d DESC, node LIMIT 1),
      w2(node, d) AS (
        SELECT u0, 0 FROM u
        UNION
        SELECT x.dst, w.d + 1 FROM w2 w JOIN ed x ON w.node = x.src WHERE w.d < 30),
      d2 AS MATERIALIZED (SELECT node, CAST(MIN(d) AS BIGINT) AS d FROM w2 GROUP BY 1)
      SELECT s.s0 AS source, u.u0 AS far_node, u.ecc_source,
             (SELECT MAX(d) FROM d2) AS diameter_lb,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM d1) AS n_reachable
      FROM s, u""")
  ) { (spark, dir) =>
    import spark.implicits._
    val edges = graft.operators.Graphs
      .cooccurrenceEdges(t(spark, dir).lineitem, "l_orderkey", "l_partkey")
      .filter($"weight" >= 2)
      .select($"src", $"dst").ckptLazy() // degree pick + two sweeps
    val sym = edges.union(edges.select($"dst".as("src"), $"src".as("dst"))).distinct()
    val source = sym.groupBy($"src").agg(count(lit(1)).as("deg"))
      .orderBy($"deg".desc, $"src").limit(1).select($"src").as[Long].head()
    val d1 = graft.operators.Graphs.bfsHops(edges, source, maxIter = 30)
      .ckptLazy() // farthest pick + reachable count
    val far = d1.orderBy($"hops".desc, $"node").limit(1)
      .select($"node", $"hops".cast("long")).collect()(0)
    val d2 = graft.operators.Graphs.bfsHops(edges, far.getLong(0), maxIter = 30)
    val nReach = d1.count()
    d2.agg(max($"hops").cast("long").as("diameter_lb"))
      .select(lit(source).as("source"), lit(far.getLong(0)).as("far_node"),
        lit(far.getLong(1)).as("ecc_source"),
        $"diameter_lb", lit(nReach).as("n_reachable"))
  }

  /** Wilcoxon signed-rank test between paired event-type daily series —
    * the PAIRED complement to q_stat_mannwhitney's independent-sample
    * U: per type pair, day-aligned differences d = x − y (zero d
    * dropped, the standard treatment), |d| ranked with tie-averaged
    * ranks, W⁺ = Σ ranks of positive d against the exact normal
    * moments. Detects consistent per-day dominance that unpaired tests
    * dilute.
    *
    * Portability: ranks live in INTEGER 2·rank units (the q_stat_spearman
    * trick — 2·avgrank = 2·|{|d'|<|d|}| + |{|d'|=|d|}| + 1 is exact);
    * W⁺, μ and the tie term are exact BIGINTs (n ≤ 366 keeps every
    * product ≤ 1e8); σ² and z are ONE fixed ÷√ chain. NULL z when the
    * variance degenerates. Scale shape: corpus → (type, day) once, then
    * calendar-bounded rank tables per type pair.
    */
  val qWilcoxon: GQuery = GQuery(
    "q_stat_wilcoxon",
    Some("""
      WITH daily AS MATERIALIZED (
        SELECT event_type AS typ, epoch_us(ts) // 86400000000 AS day,
               CAST(floor(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) * 100 + 0.5) AS BIGINT) AS vq
        FROM events GROUP BY 1, 2),
      dd AS MATERIALIZED (
        SELECT a.typ AS type_a, b.typ AS type_b, a.day, a.vq - b.vq AS d
        FROM daily a JOIN daily b ON b.typ > a.typ AND b.day = a.day
        WHERE a.vq != b.vq),
      ag AS MATERIALIZED (
        SELECT type_a, type_b, abs(d) AS ad,
               CAST(COUNT(*) AS BIGINT) AS t,
               CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS t_pos
        FROM dd GROUP BY 1, 2, 3),
      rk AS (
        SELECT type_a, type_b, ad, t, t_pos,
               2 * (SUM(t) OVER (PARTITION BY type_a, type_b ORDER BY ad) - t)
                 + t + 1 AS r2
        FROM ag),
      agg AS (
        SELECT type_a, type_b,
               CAST(SUM(t) AS BIGINT) AS n,
               CAST(SUM(t_pos * r2) AS BIGINT) AS w2_plus,
               CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
        FROM rk GROUP BY 1, 2)
      SELECT type_a, type_b, n, w2_plus,
             n * (n + 1) // 2 AS mu2,
             CASE WHEN (CAST(n * (n + 1) * (2 * n + 1) AS DOUBLE) / 6e0
                        - CAST(tie_term AS DOUBLE) / 12e0) > 0
                  THEN CAST(w2_plus - n * (n + 1) // 2 AS DOUBLE)
                       / sqrt(CAST(n * (n + 1) * (2 * n + 1) AS DOUBLE) / 6e0
                              - CAST(tie_term AS DOUBLE) / 12e0)
                  ELSE NULL END AS z
      FROM agg ORDER BY type_a, type_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.queries.Common.D
    import org.apache.spark.sql.expressions.Window
    val daily = t(spark, dir).events
      .select(expr("(ts div 1000) div 86400000000").as("day"),
        $"event_type".as("typ"), $"value")
      .groupBy($"typ", $"day")
      .agg(floor(sum($"value".cast(D)).cast("double") * 100 + 0.5).cast("long").as("vq"))
      .ckptLazy() // both sides of the type-pair join
    val dd = daily.as("a")
      .join(daily.as("b"), $"b.typ" > $"a.typ" && $"b.day" === $"a.day")
      .filter($"a.vq" =!= $"b.vq")
      .select($"a.typ".as("type_a"), $"b.typ".as("type_b"), ($"a.vq" - $"b.vq").as("d"))
    val ag = dd.groupBy($"type_a", $"type_b", abs($"d").as("ad"))
      .agg(count(lit(1)).as("t"),
        sum(when($"d" > 0, 1L).otherwise(0L)).as("t_pos"))
    val wr = Window.partitionBy($"type_a", $"type_b").orderBy($"ad") // <=366 distinct |d|
    val rk = ag.withColumn("r2",
      lit(2) * (sum($"t").over(wr) - $"t") + $"t" + 1)
    val agg2 = rk.groupBy($"type_a", $"type_b")
      .agg(sum($"t").as("n"),
        sum($"t_pos" * $"r2").as("w2_plus"),
        sum($"t" * $"t" * $"t" - $"t").as("tie_term"))
    agg2.select($"type_a", $"type_b", $"n", $"w2_plus",
      expr("n * (n + 1) div 2").as("mu2"),
      when(($"n" * ($"n" + 1) * (lit(2) * $"n" + 1)).cast("double") / lit(6.0)
        - $"tie_term".cast("double") / lit(12.0) > 0,
        ($"w2_plus" - expr("n * (n + 1) div 2")).cast("double")
          / sqrt(($"n" * ($"n" + 1) * (lit(2) * $"n" + 1)).cast("double") / lit(6.0)
            - $"tie_term".cast("double") / lit(12.0)))
        .as("z"))
      .orderBy($"type_a", $"type_b")
  }

  /** Weekly-periodicity periodogram per event type: the DFT power at
    * frequency 1/7 over the daily series — THE seasonality detector a
    * metrics pipeline runs before choosing q_ts_seasonal_decompose's
    * period. P(1/7) = (Σ v·cos(2πd/7))² + (Σ v·sin(2πd/7))², plus the
    * mean-removed power share.
    *
    * Portability: the 7 cos/sin weights are transcendental, so they are
    * computed ONCE in the driver JVM and fed to BOTH engines (Spark
    * broadcast table, DuckDB `<w>e0` literals — the
    * TextOps.ndcgWeights convention); each term v·w micro-quantizes to
    * floor(1e6·vq·w + 0.5) so the sums are exact BIGINTs; the closing
    * power is one ×+ chain over those integers. Scale shape: corpus →
    * (type, day) once, then a 7-row broadcast join.
    */
  val qPeriodogram: GQuery = {
    val cosW = Array.tabulate(7)(k => math.cos(2.0 * math.Pi * k / 7.0))
    val sinW = Array.tabulate(7)(k => math.sin(2.0 * math.Pi * k / 7.0))
    val weightRows = (0 until 7)
      .map(k => s"SELECT $k AS dow, ${cosW(k)}e0 AS cw, ${sinW(k)}e0 AS sw")
      .mkString(" UNION ALL ")
    GQuery(
      "q_ts_periodogram",
      Some(s"""
      WITH daily AS MATERIALIZED (
        SELECT event_type AS typ, epoch_us(ts) // 86400000000 AS day,
               CAST(floor(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) * 100 + 0.5) AS BIGINT) AS vq
        FROM events GROUP BY 1, 2),
      w AS ($weightRows),
      terms AS (
        SELECT d.typ,
               CAST(floor(1e6 * CAST(d.vq AS DOUBLE) * w.cw + 0.5) AS BIGINT) AS tc,
               CAST(floor(1e6 * CAST(d.vq AS DOUBLE) * w.sw + 0.5) AS BIGINT) AS ts
        FROM daily d JOIN w ON w.dow = d.day % 7)
      SELECT typ AS event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(tc) AS BIGINT) AS sc_micro,
             CAST(SUM(ts) AS BIGINT) AS ss_micro,
             (CAST(SUM(tc) AS DOUBLE) / 1e6) * (CAST(SUM(tc) AS DOUBLE) / 1e6)
               + (CAST(SUM(ts) AS DOUBLE) / 1e6) * (CAST(SUM(ts) AS DOUBLE) / 1e6)
               AS power_w
      FROM terms GROUP BY 1 ORDER BY event_type""")
    ) { (spark, dir) =>
      import spark.implicits._
      import graft.queries.Common.D
      val daily = t(spark, dir).events
        .select(expr("(ts div 1000) div 86400000000").as("day"),
          $"event_type".as("typ"), $"value")
        .groupBy($"typ", $"day")
        .agg(floor(sum($"value".cast(D)).cast("double") * 100 + 0.5).cast("long").as("vq"))
      val w = (0 until 7).map(k => (k.toLong, cosW(k), sinW(k))).toDF("dow", "cw", "sw")
      val terms = daily.join(broadcast(w), $"day" % 7 === $"dow")
        .select($"typ",
          floor(lit(1e6) * $"vq".cast("double") * $"cw" + 0.5).cast("long").as("tc"),
          floor(lit(1e6) * $"vq".cast("double") * $"sw" + 0.5).cast("long").as("ts"))
      terms.groupBy($"typ".as("event_type"))
        .agg(count(lit(1)).as("n_days"), sum($"tc").as("sc_micro"), sum($"ts").as("ss_micro"))
        .select($"event_type", $"n_days", $"sc_micro", $"ss_micro",
          (($"sc_micro".cast("double") / 1e6) * ($"sc_micro".cast("double") / 1e6)
            + ($"ss_micro".cast("double") / 1e6) * ($"ss_micro".cast("double") / 1e6))
            .as("power_w"))
        .orderBy($"event_type")
    }
  }

  /** 1-D Kalman filter over each event type's daily series — the
    * optimal recursive state estimator (constant-state model, process
    * noise q = 0.25, measurement noise r = 4) every telemetry/metrics
    * pipeline runs for denoised level tracking: per day, P⁻ = P + q,
    * K = P⁻/(P⁻ + r), x̂ ← x̂ + K·(y − x̂), P ← (1−K)·P⁻. Emits the final
    * state, covariance, gain, and the innovation SSE per type.
    *
    * Portability (the [[qHolt]]/[[qViterbi]] lockstep-recursion
    * pattern): daily inputs are DECIMAL-pinned doubles; every filter
    * step is the same fixed `+ − × ÷` IEEE tree evaluated in the same
    * order by the oracle's recursive CTE, so the filtered state is
    * bit-equal — RAW doubles out, no rounding (PARITY.md: rounding is
    * the non-portable step). The noise constants are short decimals
    * (0.25, 4.0 — exactly representable). Scale shape: one corpus
    * aggregation to (type, day), then a per-type fold over a
    * calendar-bounded array.
    */
  val qKalman: GQuery = GQuery(
    "q_ts_kalman",
    Some("""
      WITH RECURSIVE daily AS MATERIALIZED (
        SELECT event_type AS typ, epoch_us(ts) // 86400000000 AS day,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2),
      ser AS MATERIALIZED (
        SELECT typ, list(v ORDER BY day) AS y, CAST(COUNT(*) AS BIGINT) AS n
        FROM daily GROUP BY 1),
      rec AS (
        SELECT typ, y, n, CAST(1 AS BIGINT) AS t,
               y[1] AS x, 1e0 AS p, 0e0 AS k, 0e0 AS sse
        FROM ser
        UNION ALL
        SELECT typ, y, n, t + 1,
               x + ((p + 0.25e0) / ((p + 0.25e0) + 4e0)) * (y[CAST(t + 1 AS INT)] - x),
               (1e0 - ((p + 0.25e0) / ((p + 0.25e0) + 4e0))) * (p + 0.25e0),
               (p + 0.25e0) / ((p + 0.25e0) + 4e0),
               sse + (y[CAST(t + 1 AS INT)] - x) * (y[CAST(t + 1 AS INT)] - x)
        FROM rec WHERE t < n)
      SELECT typ AS event_type, n AS n_days, x AS x_hat, p AS p_cov,
             k AS gain, sse AS sse_innov
      FROM rec WHERE t = n AND n >= 2
      ORDER BY event_type""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.queries.Common.dsum
    val daily = t(spark, dir).events
      .select(expr("(ts div 1000) div 86400000000").as("day"),
        $"event_type".as("typ"), $"value")
      .groupBy($"typ", $"day").agg(dsum($"value").as("v"))
    val ser = daily.groupBy($"typ")
      .agg(array_sort(collect_list(struct($"day", $"v"))).as("sv"))
      .select($"typ",
        transform($"sv", s => s.getField("v")).as("y"),
        size($"sv").cast("long").as("n_days"))
      .filter(size($"y") >= 2) // sequence(2, 1) runs backwards — no fold on 1-day series
    ser.select($"typ".as("event_type"), $"n_days",
      aggregate(
        sequence(lit(2), size($"y")),
        struct(element_at($"y", 1).as("x"), lit(1.0).as("p"),
          lit(0.0).as("k"), lit(0.0).as("sse")),
        (acc, i) => {
          val yv = element_at($"y", i)
          val pp = acc.getField("p") + lit(0.25)
          val k = pp / (pp + lit(4.0))
          val innov = yv - acc.getField("x")
          struct(
            (acc.getField("x") + k * innov).as("x"),
            ((lit(1.0) - k) * pp).as("p"),
            k.as("k"),
            (acc.getField("sse") + innov * innov).as("sse"))
        }).as("st"))
      .select($"event_type", $"n_days", $"st.x".as("x_hat"), $"st.p".as("p_cov"),
        $"st.k".as("gain"), $"st.sse".as("sse_innov"))
      .orderBy($"event_type")
  }

  private val PathCountDepth = 10

  private def pathCountRounds(rounds: Int): String =
    (1 to rounds).map { i =>
      s"""
      l$i AS MATERIALIZED (
        SELECT e.dst AS node, $i AS hops, CAST(SUM(l.sig) AS BIGINT) AS sig
        FROM l${i - 1} l JOIN ed e ON e.src = l.node
        WHERE e.dst NOT IN (SELECT node FROM v${i - 1})
        GROUP BY 1),
      v$i AS MATERIALIZED (SELECT node, hops, sig FROM v${i - 1}
                           UNION ALL SELECT node, hops, sig FROM l$i)"""
    }.mkString(",")

  /** Single-source shortest-path COUNTS over the co-purchase graph
    * ([[graft.operators.Graphs.shortestPathCounts]]) — the σ table of
    * Brandes' betweenness and the path-multiplicity signal plain BFS
    * hops (q_graph_bfs) can't see: two nodes at equal distance differ
    * enormously in how many geodesics reach them (redundancy /
    * robustness of the connection). Source = the max-degree node
    * (tie → min id, replayed exactly). All-integer layered DP; the
    * engine iterates to frontier exhaustion and THROWS past depth
    * ${PathCountDepth} (the oracle's unroll; measured eccentricity
    * ≤ 9 from this source at every SF before registering). σ is
    * bounded by layer-degree products and ANSI overflow fails loudly
    * on both engines.
    */
  val qPathCounts: GQuery = GQuery(
    "q_graph_path_counts",
    Some(s"""
      WITH g AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      e AS (SELECT a.i AS src, b.i AS dst
            FROM g a JOIN g b ON a.g = b.g AND a.i < b.i
            GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      ed AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
      s AS (SELECT src AS s0 FROM (SELECT src, COUNT(*) AS deg FROM ed GROUP BY 1)
            ORDER BY deg DESC, src LIMIT 1),
      l0 AS MATERIALIZED (SELECT s0 AS node, 0 AS hops, CAST(1 AS BIGINT) AS sig FROM s),
      v0 AS MATERIALIZED (SELECT node, hops, sig FROM l0),
      ${pathCountRounds(PathCountDepth)}
      SELECT node, CAST(hops AS INT) AS hops, sig AS n_paths
      FROM v$PathCountDepth ORDER BY node""")
  ) { (spark, dir) =>
    import spark.implicits._
    val edges = graft.operators.Graphs
      .cooccurrenceEdges(t(spark, dir).lineitem, "l_orderkey", "l_partkey")
      .filter($"weight" >= 2)
      .select($"src", $"dst").ckptLazy() // degree pass + BFS reuse
    val sym = edges.union(edges.select($"dst".as("src"), $"src".as("dst"))).distinct()
    val source = sym.groupBy($"src").agg(count(lit(1)).as("deg"))
      .orderBy($"deg".desc, $"src").limit(1)
      .select($"src").as[Long].head() // one driver scalar (source pick)
    graft.operators.Graphs
      .shortestPathCounts(edges, source, maxDepth = PathCountDepth)
      .select($"node", $"hops".cast("int").as("hops"), $"n_paths")
      .orderBy($"node")
  }

  /** Unrolled k-truss peeling rounds for the oracle: round i recounts
    * each surviving edge's common neighbors over round i−1's edge set
    * and keeps support ≥ k−2. Peeling is MONOTONE and idempotent at the
    * fixpoint, so unrolling more rounds than the data needs is a no-op —
    * the engine side throws if its fixpoint took more rounds than the
    * oracle unrolls, so a depth shortfall fails loudly, never silently.
    */
  private def ktrussOracleRounds(rounds: Int, minSupport: Int): String =
    (1 to rounds).map { i =>
      s"""
      sy$i AS MATERIALIZED (SELECT src, dst FROM e${i - 1}
                            UNION ALL SELECT dst, src FROM e${i - 1}),
      e$i AS MATERIALIZED (
        SELECT e.src, e.dst FROM e${i - 1} e
        JOIN sy$i p ON p.src = e.src
        JOIN sy$i q ON q.src = e.dst AND q.dst = p.dst
        GROUP BY 1, 2 HAVING COUNT(*) >= $minSupport)"""
    }.mkString(",")

  private val KtrussRounds = 8

  /** 3-truss of the co-purchase graph ([[graft.operators.Graphs.ktruss]])
    * — every surviving edge sits in ≥ 1 triangle of the surviving
    * subgraph (k = 3 because this corpus's 4-truss is EMPTY at sf ≥
    * 0.01 — measured before registering; a 0-row gate proves nothing),
    * the cohesive-community core that triangle counts alone
    * (q_graph_triangles) can't isolate: support is recounted after each
    * peel, so weakly-attached triangles cascade away. The engine peels
    * to a FIXPOINT (throws past maxRounds, the sssp convention); the
    * oracle unrolls ${KtrussRounds} identical rounds — sufficient
    * because peeling is idempotent at the fixpoint, and any shortfall
    * hash-mismatches. All-integer edge sets: exact. Scale shape:
    * Θ(triangles) per round via the node-ordered enumeration, per-round
    * localCheckpoint, no unbounded state.
    */
  val qKtruss: GQuery = GQuery(
    "q_graph_ktruss",
    Some(s"""
      WITH g AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      e0 AS MATERIALIZED (
        SELECT a.i AS src, b.i AS dst
        FROM g a JOIN g b ON a.g = b.g AND a.i < b.i
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      ${ktrussOracleRounds(KtrussRounds, minSupport = 1)}
      SELECT src, dst FROM e$KtrussRounds ORDER BY src, dst""")
  ) { (spark, dir) =>
    import spark.implicits._
    val edges = graft.operators.Graphs
      .cooccurrenceEdges(t(spark, dir).lineitem, "l_orderkey", "l_partkey")
      .filter($"weight" >= 2)
    // KtrussRounds + 1: the engine spends one extra no-op round CONFIRMING
    // the fixpoint (m == n), so its round capacity must exceed the
    // oracle's unroll depth by one — at exactly KtrussRounds strictly-
    // shrinking peels the old equal budget threw despite the oracle's
    // e$KtrussRounds being the true fixpoint (round-11 ADVICE). The
    // confirming round is idempotent, so the oracle unroll stays valid.
    graft.operators.Graphs.ktruss(edges, k = 3, maxRounds = KtrussRounds + 1)
      .orderBy($"src", $"dst")
  }

  /** Lagged cross-correlation between event-type daily series (lags
    * −7…+7) — the lead/lag detector ("do clicks lead purchases by two
    * days?") that [[qAutocorr]]'s self-ACF can't answer. For each type
    * pair and lag L, Pearson r over the overlap days (a aligned with b
    * shifted by L).
    *
    * Portability: daily values quantize ONCE to centi-units
    * (floor(100·v + 0.5) of engine-identical DECIMAL-pinned doubles),
    * then every moment (n, Σx, Σy, Σxy, Σxx, Σyy) is an exact BIGINT
    * sum — bounded: |vq| ≤ 1e8 keeps each Σ (≤ 366·vq²) < 2^63; a
    * corpus with larger daily mass drops the quantization to deci-units
    * — every n·Σ product (guards included) is then formed in DOUBLE, so
    * no BIGINT product can overflow, and r is one fixed `×−÷√` IEEE
    * chain over those integers (casts
    * of >2^53 integers round deterministically; the assortativity
    * convention). Constant series ⇒ NULL r, not ÷0. Scale shape: one
    * (type, day) corpus aggregation, then a 15-lag explode of the
    * day-count table and a (day+lag)-keyed equi-join — O(types²·days·
    * lags), never corpus-sized.
    */
  val qCrossCorr: GQuery = GQuery(
    "q_ts_cross_correlation",
    Some("""
      WITH daily AS MATERIALIZED (
        SELECT event_type AS typ, epoch_us(ts) // 86400000000 AS day,
               CAST(floor(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) * 100 + 0.5) AS BIGINT) AS vq
        FROM events GROUP BY 1, 2),
      lags AS (SELECT unnest(generate_series(-7, 7)) AS lag),
      m AS (
        SELECT a.typ AS type_a, b.typ AS type_b, l.lag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a.vq) AS BIGINT) AS sx, CAST(SUM(b.vq) AS BIGINT) AS sy,
               CAST(SUM(a.vq * b.vq) AS BIGINT) AS sxy,
               CAST(SUM(a.vq * a.vq) AS BIGINT) AS sxx,
               CAST(SUM(b.vq * b.vq) AS BIGINT) AS syy
        FROM daily a
        CROSS JOIN lags l
        JOIN daily b ON b.typ > a.typ AND b.day = a.day + l.lag
        GROUP BY 1, 2, 3)
      SELECT type_a, type_b, lag, n,
             CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                   AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                  THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                  ELSE NULL END AS r
      FROM m
      ORDER BY type_a, type_b, lag""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.queries.Common.D
    val daily = t(spark, dir).events
      .select(expr("(ts div 1000) div 86400000000").as("day"),
        $"event_type".as("typ"), $"value")
      .groupBy($"typ", $"day")
      .agg(floor(sum($"value".cast(D)).cast("double") * 100 + 0.5).cast("long").as("vq"))
      .ckptLazy() // feeds both sides of the lag join
    val lags = (-7L to 7L).toDF("lag")
    val a = daily.select($"typ".as("type_a"), $"day", $"vq".as("xq"))
      .crossJoin(broadcast(lags))
    val b = daily.select($"typ".as("type_b"), $"day".as("bday"), $"vq".as("yq"))
    val m = a.join(b, $"type_b" > $"type_a" && $"bday" === $"day" + $"lag")
      .groupBy($"type_a", $"type_b", $"lag")
      .agg(count(lit(1)).as("n"),
        sum($"xq").as("sx"), sum($"yq").as("sy"),
        sum($"xq" * $"yq").as("sxy"),
        sum($"xq" * $"xq").as("sxx"),
        sum($"yq" * $"yq").as("syy"))
    // Variance guards computed in DOUBLE like the numerator (round-10
    // ADVICE): the BIGINT form overflows once n*sxx exceeds 2^63, which
    // |vq| ~ 1e8 over 366 days reaches (~1.3e21). The double expression
    // is the same fixed ×/− tree on both engines, so the > 0 test stays
    // bit-portable while the safe range extends to |vq| ~ 1e15.
    m.select($"type_a", $"type_b", $"lag", $"n",
      when(($"n".cast("double") * $"sxx".cast("double")
          - $"sx".cast("double") * $"sx".cast("double")) > 0
        && ($"n".cast("double") * $"syy".cast("double")
          - $"sy".cast("double") * $"sy".cast("double")) > 0,
        ($"n".cast("double") * $"sxy".cast("double")
          - $"sx".cast("double") * $"sy".cast("double"))
          / sqrt(($"n".cast("double") * $"sxx".cast("double")
            - $"sx".cast("double") * $"sx".cast("double"))
            * ($"n".cast("double") * $"syy".cast("double")
              - $"sy".cast("double") * $"sy".cast("double"))))
        .as("r"))
      .orderBy($"type_a", $"type_b", $"lag")
  }

  /** Hampel filter (centered rolling-median ± 3·MAD outlier flag) over
    * each event type's daily series — the ROBUST anomaly detector next
    * to [[qAnomaly]]'s mean/stddev z-score (one wild day inflates a
    * stddev band and masks itself; the median/MAD band is breakdown-
    * point-0.5 immune). Window is the ±3-day centered neighborhood of
    * EXISTING days.
    *
    * Portability: daily values are exact decimal sums cast to double;
    * median and MAD are pure SELECTIONS (lower median — element
    * (n+1) div 2 of the sorted window, integer `div` per the round-10
    * index-arithmetic rule) with zero interpolation arithmetic, and the
    * outlier test |v − med| > 3·MAD is one exact-IEEE chain over those
    * exact doubles — RAW doubles out, nothing rounded (the round-10
    * rounding-portability rule). Scale shape: explode-to-anchor with a
    * bounded 7× expansion (the qRollingMedian shape), window groups
    * collect ≤ 7 values — never a corpus-wide window.
    */
  val qHampel: GQuery = GQuery(
    "q_ts_hampel",
    Some("""
      WITH daily AS MATERIALIZED (
        SELECT event_type AS typ, epoch_us(ts) // 86400000000 AS d,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2),
      con AS MATERIALIZED (
        SELECT m.typ, a.d AS ad, m.v
        FROM daily m JOIN daily a
          ON a.typ = m.typ AND a.d BETWEEN m.d - 3 AND m.d + 3),
      med AS MATERIALIZED (
        SELECT typ, ad, CAST(COUNT(*) AS BIGINT) AS n_win,
               list_extract(list_sort(list(v)), CAST((COUNT(*) + 1) // 2 AS INT)) AS med
        FROM con GROUP BY 1, 2),
      mad AS MATERIALIZED (
        SELECT c.typ, c.ad,
               list_extract(list_sort(list(abs(c.v - m.med))),
                            CAST((COUNT(*) + 1) // 2 AS INT)) AS mad
        FROM con c JOIN med m ON m.typ = c.typ AND m.ad = c.ad
        GROUP BY 1, 2)
      SELECT d.typ AS event_type, d.d AS day_idx, d.v, m.n_win, m.med, a.mad,
             (abs(d.v - m.med) > a.mad * 3) AS is_outlier
      FROM daily d
      JOIN med m ON m.typ = d.typ AND m.ad = d.d
      JOIN mad a ON a.typ = d.typ AND a.ad = d.d
      ORDER BY event_type, day_idx""")
  ) { (spark, dir) =>
    import spark.implicits._
    val daily = t(spark, dir).events
      .select($"event_type".as("typ"),
        expr("(ts div 1000) div 86400000000").as("d"), $"value")
      .groupBy($"typ", $"d").agg(dsum($"value").as("v"))
      .ckptLazy() // feeds members, anchors, and the final join
    val contrib = daily.select($"typ",
      explode(sequence($"d" - 3, $"d" + 3)).as("ad"), $"v")
    val win = contrib
      .join(daily.select($"typ", $"d".as("ad")), Seq("typ", "ad"))
      .ckptLazy() // feeds med AND mad
    val med = win.groupBy($"typ", $"ad").agg(
      count(lit(1)).as("n_win"),
      expr("element_at(sort_array(collect_list(v)), CAST((count(1) + 1) div 2 AS INT))")
        .as("med"))
    val mad = win.join(med.select($"typ", $"ad", $"med"), Seq("typ", "ad"))
      .groupBy($"typ", $"ad").agg(
        expr("element_at(sort_array(collect_list(abs(v - med))), CAST((count(1) + 1) div 2 AS INT))")
          .as("mad"))
    daily
      .join(med.withColumnRenamed("ad", "d"), Seq("typ", "d"))
      .join(mad.withColumnRenamed("ad", "d"), Seq("typ", "d"))
      .select($"typ".as("event_type"), $"d".as("day_idx"), $"v",
        $"n_win", $"med", $"mad",
        (abs($"v" - $"med") > $"mad" * 3).as("is_outlier"))
      .orderBy($"event_type", $"day_idx")
  }

  /** Holt–Winters additive triple exponential smoothing (season m = 7)
    * over each type's daily series — the SEASONAL tier above [[qHolt]]'s
    * level+trend: the smoother that can forecast a weekly-periodic
    * series ([[qPeriodogram]] detects the cycle; this one models it).
    * α = β = γ = 0.5 (exact binary halves); init: level = 7-day head
    * mean, trend = 0, season_i = y_i − level; recursion from t = 8.
    *
    * Portability (the qHolt/qViterbi lockstep-recursion discipline):
    * both engines execute the IDENTICAL sequence of IEEE operations —
    * one `aggregate` fold here, a recursive CTE stepping all types in
    * lockstep there, with every sub-expression inlined in the same
    * order — so level/trend/seasonals/SSE are bit-equal RAW doubles.
    * The seasonal state rides the accumulator as a 7-wide sliding array
    * (the unigram-DP window trick); after the final step s[h] IS the
    * seasonal component of horizon h, so the 7 forecast rows read
    * straight off the state. Series under 8 days are excluded on BOTH
    * sides (also the sequence(8, n) backwards-guard). Scale shape: one
    * corpus aggregation to (type, day) cells, calendar-bounded arrays,
    * row-local fold — zero extra shuffle.
    */
  val qHoltWinters: GQuery = {
    val headMean = "(y[1] + y[2] + y[3] + y[4] + y[5] + y[6] + y[7]) / 7e0"
    // step expressions at t+1 (SQL cannot alias-reference in-SELECT):
    val yT = "y[CAST(t + 1 AS INT)]"
    val lN = s"0.5 * ($yT - s[1]) + 0.5 * (l + b)"
    GQuery(
      "q_ts_holt_winters",
      Some(s"""
      WITH RECURSIVE daily AS MATERIALIZED (
        SELECT event_type AS typ, epoch_us(ts) // 86400000000 AS day,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2),
      ser AS MATERIALIZED (
        SELECT typ, y, n, $headMean AS l0 FROM (
          SELECT typ, list(v ORDER BY day) AS y, CAST(COUNT(*) AS BIGINT) AS n
          FROM daily GROUP BY 1) s0
        WHERE n >= 8),
      rec AS (
        SELECT typ, y, n, CAST(7 AS BIGINT) AS t,
               l0 AS l, 0e0 AS b,
               list_transform(y[1:7], v -> v - l0) AS s, 0e0 AS sse
        FROM ser
        UNION ALL
        SELECT typ, y, n, t + 1,
               $lN,
               0.5 * (($lN) - l) + 0.5 * b,
               s[2:7] || [0.5 * ($yT - l - b) + 0.5 * s[1]],
               sse + ($yT - (l + b + s[1])) * ($yT - (l + b + s[1]))
        FROM rec WHERE t < n),
      fin AS (SELECT typ, n, l, b, s, sse FROM rec WHERE t = n)
      SELECT f.typ AS event_type, f.n AS n_days, CAST(h.h AS BIGINT) AS h,
             f.l AS level, f.b AS trend, f.s[CAST(h.h AS INT)] AS season_h,
             f.l + CAST(h.h AS DOUBLE) * f.b + f.s[CAST(h.h AS INT)] AS forecast,
             f.sse
      FROM fin f, LATERAL (SELECT unnest(generate_series(1, 7)) AS h) h
      ORDER BY event_type, h""")
    ) { (spark, dir) =>
      import spark.implicits._
      import graft.queries.Common.dsum
      val daily = t(spark, dir).events
        .select(expr("(ts div 1000) div 86400000000").as("day"),
          $"event_type".as("typ"), $"value")
        .groupBy($"typ", $"day").agg(dsum($"value").as("v"))
      val ser = daily.groupBy($"typ")
        .agg(array_sort(collect_list(struct($"day", $"v"))).as("sv"))
        .select($"typ",
          transform($"sv", s => s.getField("v")).as("y"),
          size($"sv").cast("long").as("n_days"))
        .filter(size($"y") >= 8)
        .withColumn("l0",
          (element_at($"y", 1) + element_at($"y", 2) + element_at($"y", 3) +
            element_at($"y", 4) + element_at($"y", 5) + element_at($"y", 6) +
            element_at($"y", 7)) / lit(7.0))
      val folded = ser.select($"typ".as("event_type"), $"n_days",
        aggregate(
          sequence(lit(8), size($"y")),
          struct($"l0".as("l"), lit(0.0).as("b"),
            transform(slice($"y", 1, 7), v => v - $"l0").as("s"),
            lit(0.0).as("sse")),
          (acc, t) => {
            val yv = element_at($"y", t)
            val l = acc.getField("l")
            val b = acc.getField("b")
            val s = acc.getField("s")
            val s1 = element_at(s, 1)
            val e = yv - (l + b + s1)
            val lNew = lit(0.5) * (yv - s1) + lit(0.5) * (l + b)
            struct(
              lNew.as("l"),
              (lit(0.5) * (lNew - l) + lit(0.5) * b).as("b"),
              concat(slice(s, 2, 6),
                array(lit(0.5) * (yv - l - b) + lit(0.5) * s1)).as("s"),
              (acc.getField("sse") + e * e).as("sse"))
          }).as("st"))
      folded.select($"event_type", $"n_days",
        explode(sequence(lit(1L), lit(7L))).as("h"),
        $"st.l".as("level"), $"st.b".as("trend"), $"st.s".as("s_arr"),
        $"st.sse".as("sse"))
        .select($"event_type", $"n_days", $"h", $"level", $"trend",
          element_at($"s_arr", $"h".cast("int")).as("season_h"),
          ($"level" + $"h".cast("double") * $"trend" +
            element_at($"s_arr", $"h".cast("int"))).as("forecast"),
          $"sse")
        .orderBy($"event_type", $"h")
    }
  }

  override def queries: Seq[GQuery] =
    Seq(qTransitions, qFunnel, qRetention, qRollingDistinct, qRollingDistinctHll, qTriangles,
      qPagerank, qClustering, qTimeToConvert, qGraphComponents, qSessionize, qDecayAvg,
      qAnomaly, qGraphBfs, qGraphSssp, qGraphKcore, qOhlc, qGraphLabelProp, qRollingMedian,
      qGraphNeighborJaccard, qSeasonalDecompose, qCusum, qGraphModularity, qGraphHits,
      qGraphPpr, qChangepoint, qDegreeDist, qAutocorr, qStreaks, qEventPaths, qPatternMatch,
      qAssortativity, qGraphLinkPredRa, qDtw, qViterbi, qTextRank, qHolt, qCrossCorr,
      qKalman, qKendall, qRunsTest, qKtruss, qPathCounts, qWilcoxon, qPeriodogram,
      qCohensD, qMannKendall, qDiameter, qHampel, qHoltWinters)
}
