package graft.queries

import graft.engine.PlanOnly.syntax._

import org.apache.spark.sql.functions._

import Common._
import graft.functions.{GraftFunctions, ZOrder}

/** Data-layout operators: the keys that organize 100 TB on disk.
  *
  * Partitioning ([[graft.sources.Partitioned]]) and bucketing
  * ([[graft.sources.Bucketing]]) organize by ONE key each; the Z-order
  * key here organizes within files by SEVERAL dimensions at once, so
  * min/max row-group statistics stay selective for range filters on any
  * of them (ZOrderSpec measures the file-skipping bound; this query
  * pins the key's exact value cross-engine).
  */
object LayoutQueries extends QuerySet {

  private val zbits = 10

  /** Morton key over (user_id, day-of-month) for every event, exact
    * oracle replay via shift/and/or — the key is a pure bit function, so
    * a hash match proves every interleaved bit. `zbucket` (top 6 bits)
    * is the range-partition id a writer would use: contiguous buckets =
    * contiguous z-ranges = files tight on BOTH dimensions.
    */
  val qZorder: GQuery = GQuery(
    "q_layout_zorder",
    Some(s"""
      WITH ev AS (SELECT event_id, user_id,
                         CAST(strftime(ts, '%d') AS INT) AS day
                  FROM events)
      SELECT event_id, user_id, day,
             CAST(${ZOrder.oracleSql(Seq("user_id", "day"), zbits)} AS BIGINT) AS zkey,
             CAST(${ZOrder.oracleSql(Seq("user_id", "day"), zbits)} >> 14 AS BIGINT) AS zbucket
      FROM ev
      ORDER BY event_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val ev = t(spark, dir).events.select(
      $"event_id",
      $"user_id",
      dayofmonth(graft.streaming.StreamOps.tsFromNanos($"ts")).as("day"))
    ev.select(
        $"event_id",
        $"user_id",
        $"day",
        GraftFunctions.zorder(zbits, $"user_id", $"day").as("zkey"))
      .withColumn("zbucket", shiftright($"zkey", 14).cast("long"))
      .orderBy($"event_id")
  }

  /** Small-file compaction audit + rewrite — the table-maintenance
    * operation every 100 TB lake runs nightly: measure files per
    * partition against a target row-count budget, then compact with a
    * (partition, bucket) repartition whose file count is bounded by the
    * target BY CONSTRUCTION (each (type, bucket = id % target) group
    * lands wholly in one task; same-type groups sharing a task merge
    * into one file — so files_after ≤ target always, without a
    * driver-side loop over partitions).
    *
    * Oracle contract: row counts, id sums, and the target plan are exact
    * and recomputable from `events`; physical file counts are
    * layout-dependent (task parallelism), so the fragmentation and
    * compaction claims ship as ENGINE-MEASURED booleans the oracle pins
    * TRUE (the q_source_file_provenance bound-encoded pattern) — a hash
    * match proves the deliberately fragmented write really was over
    * target and the rewrite really landed at-or-under it, and sum_id
    * proves the rewrite lost nothing.
    */
  val qCompaction: GQuery = GQuery(
    "q_layout_compaction",
    Some("""
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(event_id) AS BIGINT) AS sum_id,
             CAST(ceil(COUNT(*) / 4000.0) AS BIGINT) AS target_files,
             TRUE AS fragmented, TRUE AS compacted_to_target
      FROM events GROUP BY 1 ORDER BY event_type""")
  ) { (spark, dir) =>
    import spark.implicits._
    val root = Scratch.dir("graft_compact")
    val frag = root.resolve("frag").toString
    val tidy = root.resolve("tidy").toString
    t(spark, dir).events
      .select($"event_id", $"event_type", $"value")
      .repartition(32, $"event_id") // deliberate fragmentation: ~32 files/partition
      .write.partitionBy("event_type").mode("overwrite").parquet(frag)
    val before = spark.read.parquet(frag)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("_metadata.file_path")).as("files_before"),
        ceil(count(lit(1)) / lit(4000.0)).cast("long").as("target_files"))
      .ckpt() // pin the audit before the rewrite below
    spark.read.parquet(frag)
      .join(broadcast(before.select($"event_type", $"target_files")), "event_type")
      .withColumn("bucket", pmod($"event_id", $"target_files"))
      .repartition($"event_type", $"bucket")
      .drop("bucket", "target_files")
      .write.partitionBy("event_type").mode("overwrite").parquet(tidy)
    val after = spark.read.parquet(tidy)
      .groupBy($"event_type")
      .agg(
        sum($"event_id").as("sum_id"),
        countDistinct(col("_metadata.file_path")).as("files_after"))
    before.join(after, "event_type")
      .select($"event_type", $"n_rows", $"sum_id", $"target_files",
        ($"files_before" > $"target_files").as("fragmented"),
        ($"files_after" <= $"target_files").as("compacted_to_target"))
      .orderBy($"event_type")
  }

  /** Hilbert-curve key over (user_id, event_id low bits) for every
    * event ([[graft.functions.HilbertIndex]]) — [[qZorder]]'s
    * locality-optimal sibling: every curve step is grid-adjacent, so
    * `hbucket` ranges are contiguous 2-D tiles (Morton buckets jump at
    * power-of-two seams). The oracle replays the EXACT 16-level
    * rotate/reflect walk as a recursive CTE over pure integer ops —
    * a hash match proves every quadrant decision of every row.
    */
  val qHilbert: GQuery = GQuery(
    "q_layout_hilbert",
    Some("""
      WITH RECURSIVE pts AS (
        SELECT event_id, user_id,
               CAST(user_id & 65535 AS BIGINT) AS x0,
               CAST(event_id & 65535 AS BIGINT) AS y0
        FROM events),
      h AS (
        SELECT event_id, x0 AS x, y0 AS y,
               CAST(0 AS BIGINT) AS d, CAST(32768 AS BIGINT) AS s
        FROM pts
        UNION ALL
        SELECT event_id,
               CASE WHEN (y & s) = 0
                    THEN CASE WHEN (x & s) > 0 THEN 65535 - y ELSE y END
                    ELSE x END,
               CASE WHEN (y & s) = 0
                    THEN CASE WHEN (x & s) > 0 THEN 65535 - x ELSE x END
                    ELSE y END,
               d + s * s * xor(3 * (CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END),
                               CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END),
               s // 2
        FROM h WHERE s > 0)
      SELECT p.event_id, p.user_id, p.x0 AS x, p.y0 AS y, h.d AS hkey,
             CAST(h.d >> 22 AS BIGINT) AS hbucket
      FROM pts p JOIN h ON h.event_id = p.event_id AND h.s = 0
      ORDER BY p.event_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val ev = t(spark, dir).events.select(
      $"event_id", $"user_id",
      $"user_id".bitwiseAND(65535).as("x"),
      $"event_id".bitwiseAND(65535).as("y"))
    ev.select($"event_id", $"user_id", $"x", $"y",
      GraftFunctions.hilbert($"x", $"y").as("hkey"))
      .withColumn("hbucket", shiftright($"hkey", 22).cast("long"))
      .orderBy($"event_id")
  }

  override def queries: Seq[GQuery] = Seq(qZorder, qCompaction, qHilbert)
}
