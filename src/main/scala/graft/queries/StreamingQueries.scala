package graft.queries

import graft.engine.PlanOnly.syntax._

import org.apache.spark.sql.functions._

import Common._
import graft.functions.GraftFunctions
import graft.serde.AvroConv
import graft.streaming.{StateTable, StreamOps}

/** Batch-verifiable analogs of the streaming layer (SURVEY.md §2.6 rows
  * "Streaming" / "Stateful KV" / "Avro"): the same `window` /
  * `session_window` / upsert / serde expressions run identically on batch
  * DataFrames, which is what lets the DuckDB oracle check their semantics;
  * the streaming-only behaviors (watermark drops, checkpoint recovery,
  * agent lifecycle) are covered by the MemoryStream specs in
  * src/test/scala/graft/streaming/.
  *
  * `events.ts` arrives as ns-since-epoch; both sides truncate to µs (the
  * reference timestamp resolution of Spark) before bucketing so boundary
  * arithmetic agrees exactly.
  */
object StreamingQueries extends QuerySet {

  /** StateTable upsert snapshot: last write per key — reading a compacted
    * changelog topic end-to-end (CTable semantics, table.rs:79-113).
    */
  val qStateSnapshot: GQuery = GQuery(
    "q_state_snapshot",
    Some("""
      SELECT user_id, event_id AS last_event_id, event_type AS last_type, value AS last_value
      FROM (
        SELECT user_id, event_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1
      ORDER BY user_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    StateTable
      .snapshot(t(spark, dir).events, keyCols = Seq("user_id"), orderCols = Seq("ts", "event_id"))
      .select(
        $"user_id",
        $"event_id".as("last_event_id"),
        $"event_type".as("last_type"),
        $"value".as("last_value")
      )
      .orderBy($"user_id")
  }

  /** Tumbling 1-hour event-time window aggregate. */
  val qTumbling: GQuery = GQuery(
    "q_window_tumbling",
    Some(s"""
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket_start,
             event_type,
             COUNT(*) AS n,
             ${sqlSum("value")} AS total
      FROM events
      GROUP BY 1, 2
      ORDER BY 1, 2""")
  ) { (spark, dir) =>
    import spark.implicits._
    val ev = t(spark, dir).events
    StreamOps
      .tumbling(
        ev,
        StreamOps.tsFromNanos($"ts"),
        "1 hour",
        keys = Seq($"event_type"),
        aggs = Seq(count(lit(1)).as("n"), dsum($"value").as("total"))
      )
      .select(
        unix_timestamp($"window.start").as("bucket_start"),
        $"event_type",
        $"n",
        $"total"
      )
      .orderBy($"bucket_start", $"event_type")
  }

  /** Sliding 2-hour window advancing hourly: every event lands in two
    * windows (the oracle materializes both bucket starts explicitly).
    */
  val qSliding: GQuery = GQuery(
    "q_window_sliding",
    Some("""
      SELECT ws AS window_start, event_type, COUNT(*) AS n
      FROM (
        SELECT event_type,
               unnest([b, b - 3600]) AS ws
        FROM (SELECT event_type,
                     CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS b
              FROM events))
      GROUP BY 1, 2
      ORDER BY 1, 2""")
  ) { (spark, dir) =>
    import spark.implicits._
    val ev = t(spark, dir).events
    StreamOps
      .sliding(
        ev,
        StreamOps.tsFromNanos($"ts"),
        "2 hours",
        "1 hour",
        keys = Seq($"event_type"),
        aggs = Seq(count(lit(1)).as("n"))
      )
      .select(unix_timestamp($"window.start").as("window_start"), $"event_type", $"n")
      .orderBy($"window_start", $"event_type")
  }

  /** Session windows per user (30-minute inactivity gap). The oracle
    * reconstructs sessions with the lag-gap-islands technique; both sides
    * compare at µs resolution, and a session breaks when the gap is
    * >= 30 minutes (Spark merges while ts < prevEnd).
    */
  val qSession: GQuery = GQuery(
    "q_window_session",
    Some(s"""
      WITH t AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      brk AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
        FROM t),
      sess AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM brk)
      SELECT user_id,
             CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
             COUNT(*) AS n,
             ${sqlSum("value")} AS total
      FROM sess
      GROUP BY user_id, sid
      ORDER BY user_id, session_start""")
  ) { (spark, dir) =>
    import spark.implicits._
    val ev = t(spark, dir).events
    StreamOps
      .session(
        ev,
        StreamOps.tsFromNanos($"ts"),
        "30 minutes",
        keys = Seq($"user_id"),
        aggs = Seq(count(lit(1)).as("n"), dsum($"value").as("total"))
      )
      .select(
        $"user_id",
        unix_timestamp($"session_window.start").as("session_start"),
        $"n",
        $"total"
      )
      .orderBy($"user_id", $"session_start")
  }

  /** DYNAMIC-gap session window: the inactivity timeout depends on the
    * event itself (purchases hold a session open 30 min, everything else
    * 10 — the "checkout grace period" shape). Spark's
    * `session_window(ts, gapExpr)` merges per-event windows
    * [ts, ts+gap(event)); a fixed-gap LAG check cannot express this — the
    * oracle needs the full interval-merge formulation (running max of
    * window ends, break where the next start clears it), in exact µs
    * integer arithmetic on both sides.
    */
  val qSessionDynamic: GQuery = GQuery(
    "q_window_session_dynamic",
    Some(s"""
      WITH e AS (SELECT user_id, epoch_us(ts) AS us,
                        CASE WHEN event_type = 'purchase'
                             THEN 1800000000 ELSE 600000000 END AS gap,
                        value
                 FROM events),
      m AS (SELECT *, max(us + gap) OVER (PARTITION BY user_id ORDER BY us
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        AS prev_end
            FROM e),
      f AS (SELECT *, CASE WHEN prev_end IS NULL OR us >= prev_end THEN 1 ELSE 0 END AS brk
            FROM m),
      g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                                     ROWS UNBOUNDED PRECEDING) AS sid
            FROM f)
      SELECT user_id,
             MIN(us) AS session_start,
             MAX(us + gap) AS session_end,
             COUNT(*) AS n,
             ${sqlSum("value")} AS total
      FROM g
      GROUP BY user_id, sid
      ORDER BY user_id, session_start""")
  ) { (spark, dir) =>
    import spark.implicits._
    val gap = when($"event_type" === "purchase", lit("30 minutes")).otherwise(lit("10 minutes"))
    t(spark, dir).events
      .withColumn("tts", StreamOps.tsFromNanos($"ts"))
      .groupBy($"user_id", session_window($"tts", gap))
      .agg(count(lit(1)).as("n"), dsum($"value").as("total"))
      .select(
        $"user_id",
        unix_micros($"session_window.start").as("session_start"),
        unix_micros($"session_window.end").as("session_end"),
        $"n",
        $"total")
      .orderBy($"user_id", $"session_start")
  }

  /** Avro datum round-trip: encode each event to raw Avro binary, decode
    * with the declared schema, aggregate the decoded columns. The oracle
    * aggregates the source directly — any serde corruption breaks the
    * hash match.
    */
  val qAvroRoundtrip: GQuery = GQuery(
    "q_avro_roundtrip",
    Some(s"""
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(event_id) AS BIGINT) AS sum_id,
             ${sqlSum("value")} AS total
      FROM events
      GROUP BY event_type
      ORDER BY event_type""")
  ) { (spark, dir) =>
    import spark.implicits._
    val payload = t(spark, dir).events.select($"event_id", $"event_type", $"value")
    val schemaJson = AvroConv.schemaJson(payload.schema)
    payload
      .select(GraftFunctions.toAvro(struct($"event_id", $"event_type", $"value")).as("bin"))
      .select(GraftFunctions.fromAvro($"bin", schemaJson).as("r"))
      .select($"r.event_id".as("event_id"), $"r.event_type".as("event_type"), $"r.value".as("value"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"event_id").as("sum_id"),
        dsum($"value").as("total")
      )
      .orderBy($"event_type")
  }

  /** Avro object-container round-trip (the reference's one-file-per-message
    * wire format): encode purchase events as single-record container files,
    * decode + explode all records, aggregate.
    */
  val qAvroFileRoundtrip: GQuery = GQuery(
    "q_avro_file_roundtrip",
    Some(s"""
      SELECT event_type,
             COUNT(*) AS n,
             ${sqlSum("value")} AS total
      FROM events
      WHERE event_type = 'purchase'
      GROUP BY event_type
      ORDER BY event_type""")
  ) { (spark, dir) =>
    import spark.implicits._
    val payload = t(spark, dir).events
      .filter($"event_type" === "purchase")
      .select($"event_type", $"value")
    val schemaJson = AvroConv.schemaJson(payload.schema)
    payload
      .select(GraftFunctions.toAvroFile(struct($"event_type", $"value")).as("bin"))
      .select(explode(GraftFunctions.fromAvroFile($"bin", schemaJson)).as("r"))
      .select($"r.event_type".as("event_type"), $"r.value".as("value"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total"))
      .orderBy($"event_type")
  }

  /** Per-user hourly resample with forward fill (operators/TimeSeries
    * .scala): dense bucket grid per key via sequence+explode (no driver
    * loop, no global calendar cross join), gaps carry the last seen
    * aggregate forward. Bucket emitted as a formatted string (timestamps
    * hash differently across engines' fetch paths) and values go through
    * the exact DECIMAL(38,6) sum so fill chains match bit-for-bit.
    */
  val qGapFill: GQuery = GQuery(
    "q_ts_gapfill",
    Some(s"""
      WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
                 FROM events WHERE user_id < 20),
      agg AS (SELECT user_id, date_trunc('hour', ts) AS h,
                     ${sqlSum("value")} AS v
              FROM e GROUP BY 1, 2),
      bounds AS (SELECT user_id, min(h) AS mn, max(h) AS mx FROM agg GROUP BY 1),
      grid AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
               FROM bounds),
      joined AS (SELECT g.user_id, g.h, a.v
                 FROM grid g LEFT JOIN agg a ON g.user_id = a.user_id AND g.h = a.h)
      SELECT user_id,
             strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
             v IS NULL AS was_gap
      FROM joined
      ORDER BY user_id, bucket""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.StreamOps.tsFromNanos
    val ev = t(spark, dir).events
      .filter($"user_id" < 20)
      .select($"user_id", tsFromNanos($"ts").as("ts"), $"value")
    graft.operators.TimeSeries
      .gapFill(ev, keyCol = "user_id", tsCol = "ts", valueAgg = dsum, width = "1 HOUR", truncUnit = "hour")
      .select(
        $"user_id",
        date_format($"bucket_ts", "yyyy-MM-dd HH:mm:ss").as("bucket"),
        $"value",
        $"was_gap"
      )
      .orderBy($"user_id", $"bucket")
  }

  /** Hourly grid fill with LINEAR interpolation
    * ([[graft.operators.TimeSeries.interpolate]]): gaps get
    * v_p + (v_n − v_p)·(t − t_p)/(t_n − t_p) from the surrounding
    * observations instead of carry-forward — the resampling prep for
    * ML feature series. Observed buckets aggregate through DECIMAL(38,6);
    * the gap chain is fixed per-row IEEE arithmetic on epoch-µs offsets,
    * so every interpolated value hash-matches the oracle's replay.
    */
  val qInterpolate: GQuery = GQuery(
    "q_ts_interpolate",
    Some(s"""
      WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
                 FROM events WHERE user_id < 20),
      agg AS (SELECT user_id, date_trunc('hour', ts) AS h,
                     ${sqlSum("value")} AS v
              FROM e GROUP BY 1, 2),
      bounds AS (SELECT user_id, min(h) AS mn, max(h) AS mx FROM agg GROUP BY 1),
      grid AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
               FROM bounds),
      joined AS (SELECT g.user_id, g.h, a.v
                 FROM grid g LEFT JOIN agg a ON g.user_id = a.user_id AND g.h = a.h),
      ctx AS (
        SELECT user_id, h, v,
               last_value(v IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
               first_value(v IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY h
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY h
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        FROM joined)
      SELECT user_id,
             strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket,
             CASE WHEN v IS NOT NULL THEN v
                  ELSE pv + (nv - pv)
                       * (CAST(epoch_us(h) - epoch_us(pt) AS DOUBLE)
                          / CAST(epoch_us(nt) - epoch_us(pt) AS DOUBLE))
             END AS value,
             v IS NULL AS was_gap
      FROM ctx
      ORDER BY user_id, bucket""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.streaming.StreamOps.tsFromNanos
    val ev = t(spark, dir).events
      .filter($"user_id" < 20)
      .select($"user_id", tsFromNanos($"ts").as("ts"), $"value")
    graft.operators.TimeSeries
      .interpolate(ev, keyCol = "user_id", tsCol = "ts", valueAgg = dsum, width = "1 HOUR", truncUnit = "hour")
      .select(
        $"user_id",
        date_format($"bucket_ts", "yyyy-MM-dd HH:mm:ss").as("bucket"),
        $"value",
        $"was_gap"
      )
      .orderBy($"user_id", $"bucket")
  }

  /** Changelog replay onto a snapshot: collapse a keyed op log (set/del
    * with sequence numbers) to its latest op per key, then MERGE-upsert it
    * into a base table — the batch form of consuming a compacted changelog
    * topic into a CTable (set: table.rs:93-98, tombstone delete:
    * table.rs:374, compaction contract: ctopic.rs:86-99). Keys 3|k get a
    * set at seq 1, keys 6|k additionally a delete at seq 2 (the delete must
    * win), and fresh keys are inserted — all three MERGE arms exercised.
    */
  val qMergeUpsert: GQuery = GQuery(
    "q_state_merge_upsert",
    Some("""
      WITH ops AS (
        SELECT o_orderkey AS k, 1 AS seq, 'X' AS status,
               o_totalprice + 100.0 AS price, FALSE AS deleted
        FROM orders WHERE o_orderkey % 3 = 0
        UNION ALL
        SELECT o_orderkey, 2, 'D', 0.0, TRUE
        FROM orders WHERE o_orderkey % 6 = 0
        UNION ALL
        SELECT o_orderkey + 50000000, 1, 'N', 1.0, FALSE
        FROM orders WHERE o_orderkey % 1000 = 1),
      latest AS (
        SELECT k, status, price, deleted FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
          FROM ops)
        WHERE rn = 1),
      merged AS (
        SELECT b.o_orderkey AS k, b.o_orderstatus AS status, b.o_totalprice AS price
        FROM orders b LEFT JOIN latest l ON b.o_orderkey = l.k
        WHERE l.k IS NULL
        UNION ALL
        SELECT k, status, price FROM latest WHERE NOT deleted)
      SELECT k, status, price FROM merged ORDER BY k""")
  ) { (spark, dir) =>
    import spark.implicits._
    val ord = t(spark, dir).orders
    val base = ord.select($"o_orderkey".as("k"), $"o_orderstatus".as("status"), $"o_totalprice".as("price"))
    val setOps = ord
      .filter($"o_orderkey" % 3 === 0)
      .select($"o_orderkey".as("k"), lit(1L).as("seq"), lit("X").as("status"),
        ($"o_totalprice" + 100.0).as("price"), lit(false).as("deleted"))
    val delOps = ord
      .filter($"o_orderkey" % 6 === 0)
      .select($"o_orderkey".as("k"), lit(2L).as("seq"), lit("D").as("status"),
        lit(0.0).as("price"), lit(true).as("deleted"))
    val insOps = ord
      .filter($"o_orderkey" % 1000 === 1)
      .select(($"o_orderkey" + 50000000L).as("k"), lit(1L).as("seq"), lit("N").as("status"),
        lit(1.0).as("price"), lit(false).as("deleted"))
    val latest = graft.operators.Joins.collapseChangelog(
      setOps.unionByName(delOps).unionByName(insOps), Seq("k"), "seq")
    graft.operators.Joins
      .mergeUpsert(base, latest, Seq("k"), "deleted")
      .orderBy($"k")
  }

  /** SCD2 history from the event changelog ([[graft.operators.TimeSeries
    * .scd2]]): per user, consecutive runs of the same event_type compress
    * to one version row with `[valid_from, valid_to)` ns-epoch bounds and
    * an `is_current` flag on the open version. The attribute history a
    * keyed upsert discards, materialized as intervals — two window passes
    * over ONE (key, time) sort, no self-join. Interval bounds ship as
    * µs-since-epoch BIGINTs, and the version ORDER is µs too, so both
    * engines sort identical keys (raw TIMESTAMP output is banned by
    * oracle-parity rules, and DuckDB truncates parquet ns to µs on read —
    * ns vs µs physics).
    */
  val qScd2: GQuery = GQuery(
    "q_state_scd2",
    Some("""
      WITH c AS (
        SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS tus, event_id,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev,
               ROW_NUMBER()   OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
        FROM events),
      f AS (SELECT * FROM c WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
      SELECT user_id, event_type AS state, tus AS valid_from,
             lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS valid_to,
             (lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) IS NULL)
               AS is_current
      FROM f
      ORDER BY user_id, valid_from""")
  ) { (spark, dir) =>
    import spark.implicits._
    graft.operators.TimeSeries
      .scd2(
        t(spark, dir).events
          .select($"user_id", expr("ts div 1000").as("ts_us"), $"event_id", $"event_type"),
        keyCol = "user_id",
        attrCol = "event_type",
        seqCols = Seq("ts_us", "event_id"))
      .orderBy($"user_id", $"valid_from")
  }

  /** TEMPORAL enrichment — the USE of an SCD2 history ([[qScd2]] builds
    * it): answer "what state was current AT time t" by as-of-joining
    * probe timestamps against version starts. Because SCD2 intervals tile
    * each key's timeline, the backward as-of match on `valid_from` IS the
    * temporal point-in-interval lookup — no range predicate, no interval
    * explode; the custom sorted-merge as-of exec
    * ([[graft.plans.AsofJoinPlan]]) gets its third consumer. Probes are
    * each event time + 1µs (strictly inside the then-current version).
    * The changelog collapses equal-µs events (arg-max by event_id) first,
    * so versions have strictly increasing starts on both engines.
    */
  val qTemporal: GQuery = GQuery(
    "q_join_temporal",
    Some("""
      WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tus,
                        arg_max(event_type, event_id) AS et
                 FROM events GROUP BY 1, 2),
      c AS (SELECT user_id, et, tus,
                   lag(et) OVER (PARTITION BY user_id ORDER BY tus) AS prev,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY tus) AS rn
            FROM e),
      v AS (SELECT user_id, et AS state, tus AS vt FROM c
            WHERE rn = 1 OR prev IS DISTINCT FROM et),
      p AS (SELECT user_id, tus + 1 AS vt FROM e)
      SELECT p.user_id AS user_id, p.vt AS probe_ts, v.state
      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.vt >= v.vt
      ORDER BY p.user_id, probe_ts""")
  ) { (spark, dir) =>
    import spark.implicits._
    val e = t(spark, dir).events
      .groupBy($"user_id", expr("ts div 1000").as("tus"))
      .agg(max_by($"event_type", $"event_id").as("et"))
    val versions = graft.operators.TimeSeries
      .scd2(e, keyCol = "user_id", attrCol = "et", seqCols = Seq("tus"))
      .select($"user_id", $"state", $"valid_from".as("vt"))
    val probes = e.select($"user_id", ($"tus" + 1).as("vt"))
    graft.operators.Joins
      .asOfJoinNative(probes, versions, key = "user_id", tsCol = "vt", payload = Seq("state"))
      .select($"user_id", $"vt".as("probe_ts"), $"state")
      .orderBy($"user_id", $"probe_ts")
  }

  /** Incremental view maintenance of an AGGREGATE from the changelog:
    * instead of merging the ops into the row store and re-aggregating
    * (q_state_merge_upsert's shape), the maintained path derives per-op
    * DELTAS (update → price diff, delete → −row, insert → +row) and
    * folds them into the previous aggregate — refresh cost ∝ changelog
    * size, NOT corpus size, which is the only viable refresh at 100 TB
    * (the base is touched only by a semi-join on the op keys, to read
    * the old values the deltas need). The query runs BOTH paths and the
    * oracle pins their exact equality per group: all arithmetic is
    * DECIMAL(38,6), so maintained ≡ direct as exact rationals, and the
    * `consistent` booleans are a proven invariant, not a tolerance.
    * Reference analog: the changelog-table contract the reference keeps
    * per CTable (callysto/src/table/table.rs:79-113) — this is what its
    * users would build on top for materialized aggregates.
    */
  val qIncrementalAgg: GQuery = GQuery(
    "q_state_incremental_agg",
    Some("""
      WITH ops AS (
        SELECT o_orderkey AS k, 1 AS seq, NULL AS pri,
               o_totalprice + 100.0 AS price, FALSE AS deleted
        FROM orders WHERE o_orderkey % 3 = 0
        UNION ALL
        SELECT o_orderkey, 2, NULL, 0.0, TRUE
        FROM orders WHERE o_orderkey % 6 = 0
        UNION ALL
        SELECT o_orderkey + 50000000, 1, '1-URGENT', 1.0, FALSE
        FROM orders WHERE o_orderkey % 1000 = 1),
      latest AS (
        SELECT k, pri, price, deleted FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn FROM ops)
        WHERE rn = 1),
      base_agg AS (
        SELECT o_orderpriority AS pri, CAST(COUNT(*) AS BIGINT) AS cnt,
               SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS total
        FROM orders GROUP BY 1),
      deltas AS (
        SELECT b.o_orderpriority AS pri,
               CASE WHEN l.deleted THEN CAST(-1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS dcnt,
               CASE WHEN l.deleted THEN -CAST(b.o_totalprice AS DECIMAL(38,6))
                    ELSE CAST(l.price AS DECIMAL(38,6)) - CAST(b.o_totalprice AS DECIMAL(38,6)) END AS dtotal
        FROM latest l JOIN orders b ON l.k = b.o_orderkey
        UNION ALL
        SELECT l.pri, CAST(1 AS BIGINT), CAST(l.price AS DECIMAL(38,6))
        FROM latest l LEFT JOIN orders b ON l.k = b.o_orderkey
        WHERE b.o_orderkey IS NULL AND NOT l.deleted),
      delta_agg AS (
        SELECT pri, CAST(SUM(dcnt) AS BIGINT) AS dcnt, SUM(dtotal) AS dtotal
        FROM deltas GROUP BY 1),
      maintained AS (
        SELECT COALESCE(b.pri, d.pri) AS pri,
               COALESCE(b.cnt, 0) + COALESCE(d.dcnt, 0) AS cnt,
               COALESCE(b.total, 0) + COALESCE(d.dtotal, 0) AS total
        FROM base_agg b FULL OUTER JOIN delta_agg d ON b.pri = d.pri),
      final_state AS (
        SELECT b.o_orderpriority AS pri, CAST(b.o_totalprice AS DECIMAL(38,6)) AS price
        FROM orders b LEFT JOIN latest l ON b.o_orderkey = l.k WHERE l.k IS NULL
        UNION ALL
        SELECT COALESCE(b.o_orderpriority, l.pri), CAST(l.price AS DECIMAL(38,6))
        FROM latest l LEFT JOIN orders b ON l.k = b.o_orderkey WHERE NOT l.deleted),
      direct AS (
        SELECT pri, CAST(COUNT(*) AS BIGINT) AS cnt, SUM(price) AS total
        FROM final_state GROUP BY 1)
      SELECT m.pri, m.cnt AS cnt_maintained, d.cnt AS cnt_direct,
             CAST(m.total AS DOUBLE) AS total_maintained, CAST(d.total AS DOUBLE) AS total_direct,
             (m.cnt = d.cnt AND m.total = d.total) AS consistent
      FROM maintained m JOIN direct d ON m.pri = d.pri
      ORDER BY m.pri""")
  ) { (spark, dir) =>
    import spark.implicits._
    val D = Common.D
    val ord = t(spark, dir).orders
    val setOps = ord.filter($"o_orderkey" % 3 === 0)
      .select($"o_orderkey".as("k"), lit(1L).as("seq"), lit(null).cast("string").as("pri"),
        ($"o_totalprice" + 100.0).as("price"), lit(false).as("deleted"))
    val delOps = ord.filter($"o_orderkey" % 6 === 0)
      .select($"o_orderkey".as("k"), lit(2L).as("seq"), lit(null).cast("string").as("pri"),
        lit(0.0).as("price"), lit(true).as("deleted"))
    val insOps = ord.filter($"o_orderkey" % 1000 === 1)
      .select(($"o_orderkey" + 50000000L).as("k"), lit(1L).as("seq"), lit("1-URGENT").as("pri"),
        lit(1.0).as("price"), lit(false).as("deleted"))
    val latest = graft.operators.Joins
      .collapseChangelog(setOps.unionByName(delOps).unionByName(insOps), Seq("k"), "seq")
      .ckpt()
    val baseAgg = ord.groupBy($"o_orderpriority".as("pri"))
      .agg(count(lit(1)).as("cnt"), sum($"o_totalprice".cast(D)).as("total"))
    val existing = latest.join(ord, $"k" === $"o_orderkey")
      .select($"o_orderpriority".as("pri"),
        when($"deleted", -1L).otherwise(0L).as("dcnt"),
        when($"deleted", -$"o_totalprice".cast(D))
          .otherwise($"price".cast(D) - $"o_totalprice".cast(D)).as("dtotal"))
    val inserted = latest.join(ord, $"k" === $"o_orderkey", "left")
      .filter($"o_orderkey".isNull && !$"deleted")
      .select($"pri", lit(1L).as("dcnt"), $"price".cast(D).as("dtotal"))
    val deltaAgg = existing.unionByName(inserted)
      .groupBy($"pri").agg(sum($"dcnt").as("dcnt"), sum($"dtotal").as("dtotal"))
    val maintained = baseAgg.as("b").join(deltaAgg.as("d"), Seq("pri"), "full_outer")
      .select($"pri",
        (coalesce($"b.cnt", lit(0L)) + coalesce($"d.dcnt", lit(0L))).as("cnt"),
        (coalesce($"b.total", lit(0).cast(D)) + coalesce($"d.dtotal", lit(0).cast(D))).as("total"))
    val untouched = ord.join(latest, $"o_orderkey" === $"k", "left_anti")
      .select($"o_orderpriority".as("pri"), $"o_totalprice".cast(D).as("price"))
    val fromOps = latest.filter(!$"deleted")
      .join(ord, $"k" === $"o_orderkey", "left")
      .select(coalesce($"o_orderpriority", $"pri").as("pri"), $"price".cast(D).as("price"))
    val direct = untouched.unionByName(fromOps)
      .groupBy($"pri").agg(count(lit(1)).as("cnt"), sum($"price").as("total"))
    maintained.as("m").join(direct.as("d"), Seq("pri"))
      .select($"pri", $"m.cnt".as("cnt_maintained"), $"d.cnt".as("cnt_direct"),
        $"m.total".cast("double").as("total_maintained"),
        $"d.total".cast("double").as("total_direct"),
        ($"m.cnt" === $"d.cnt" && $"m.total" === $"d.total").as("consistent"))
      .orderBy($"pri")
  }

  override def queries: Seq[GQuery] =
    Seq(qStateSnapshot, qTumbling, qSliding, qSession, qSessionDynamic, qAvroRoundtrip,
      qAvroFileRoundtrip, qGapFill, qInterpolate, qMergeUpsert, qScd2, qTemporal,
      qIncrementalAgg)
}
