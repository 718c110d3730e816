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

  /** Rendezvous (highest-random-weight) shard assignment vs modulo —
    * the stable-sharding contract an INCREMENTAL 100 TB pipeline needs:
    * when a shard is removed (K → K−1), HRW reassigns ONLY the removed
    * shard's documents, while modulo reshuffles ~(K−1)/K of the corpus
    * (every persisted per-shard index, dedup partition, or cache is
    * invalidated). Both schemes are computed exactly:
    *
    *   - HRW weight = portable 56-bit md5 of `doc_id:s` (56 bits so the
    *     argmax encodes as ONE exact BIGINT w·8 + (7−s) < 2⁵⁹ — integer
    *     MAX is the argmax with ties to the smaller shard, the
    *     q_join_spatial_grid encoding trick);
    *   - output per (scheme, shard): population at K, population at
    *     K−1, and the stay-count — the hash gate pins every assignment
    *     through the three aggregates, and the HRW rows must show
    *     stayed = n_k8 for every surviving shard.
    *
    * Scale shape: two row-local projections and one groupBy — no joins,
    * no windows; exactly how shard assignment runs corpus-wide.
    */
  val qRendezvous: GQuery = GQuery(
    "q_layout_rendezvous_shards",
    Some("""
      WITH a AS (
        SELECT doc_id,
               7 - (MAX(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)), 1, 14))::UBIGINT * 8 + (7 - s)) % 8) AS hrw8,
               7 - (MAX(CASE WHEN s < 7 THEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)), 1, 14))::UBIGINT * 8 + (7 - s) END) % 8) AS hrw7,
               doc_id % 8 AS mod8,
               doc_id % 7 AS mod7
        FROM documents, (SELECT CAST(range AS BIGINT) AS s FROM range(0, 8))
        GROUP BY doc_id),
      u AS (
        SELECT 'hrw' AS scheme, CAST(hrw8 AS BIGINT) AS shard8,
               CAST(hrw7 AS BIGINT) AS shard7 FROM a
        UNION ALL
        SELECT 'mod', CAST(mod8 AS BIGINT), CAST(mod7 AS BIGINT) FROM a)
      SELECT scheme, shard8 AS shard,
             CAST(COUNT(*) AS BIGINT) AS n_k8,
             CAST(SUM(CASE WHEN shard7 = shard8 THEN 1 ELSE 0 END) AS BIGINT) AS stayed
      FROM u GROUP BY 1, 2 ORDER BY scheme, shard""")
  ) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.Column
    def w(s: Column): Column =
      conv(substring(md5(concat($"doc_id".cast("string"), lit(":"), s.cast("string"))), 1, 14), 16, 10)
        .cast("long")
    def hrwShard(k: Int): Column =
      lit(7L) - pmod(
        array_max(transform(sequence(lit(0), lit(k - 1)),
          s => w(s) * 8L + (lit(7L) - s))), lit(8L))
    val a = t(spark, dir).documents.select(
      $"doc_id",
      hrwShard(8).as("hrw8"), hrwShard(7).as("hrw7"),
      pmod($"doc_id", lit(8L)).as("mod8"), pmod($"doc_id", lit(7L)).as("mod7"))
    val u = a.select(lit("hrw").as("scheme"), $"hrw8".as("shard8"), $"hrw7".as("shard7"))
      .unionByName(a.select(lit("mod").as("scheme"), $"mod8".as("shard8"), $"mod7".as("shard7")))
    u.groupBy($"scheme", $"shard8".as("shard"))
      .agg(count(lit(1)).as("n_k8"),
        sum(when($"shard7" === $"shard8", 1L).otherwise(0L)).as("stayed"))
      .orderBy($"scheme", $"shard")
  }

  override def queries: Seq[GQuery] = Seq(qZorder, qCompaction, qHilbert, qRendezvous)
}
