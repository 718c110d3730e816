package graft.queries

import graft.engine.PlanOnly.syntax._


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Common._

/** Batch file-source coverage beyond parquet (SURVEY.md §2.6 Scans/sources
  * row): JSON-lines, CSV, and ORC read+write round-trips. Each query writes
  * a projection of `events` in the target format, reads it back with an
  * explicit schema (schema inference is a scan-the-data tax and a schema
  * drift hazard at 100 TB — never rely on it), and aggregates; the oracle
  * computes the same aggregate straight from parquet, so a hash match
  * proves the format round-trip was lossless.
  *
  * The reference's only wire format is opaque Kafka bytes with user-space
  * serde (callysto/src/kafka/cconsumer.rs:36-122); file formats are part
  * of the Spark-native surface a batch/stream engine needs.
  *
  * Double values survive text formats because Spark writes shortest
  * round-trip representations (Jackson/UTF8String both guarantee
  * read(toString(d)) == d); timestamps are excluded (µs-vs-ns precision
  * is engine-specific — see the verify skill's gotchas).
  */
object SourceQueries extends QuerySet {

  /** Common aggregate on the round-tripped frame; must match [[aggSql]]. */
  private def agg(df: DataFrame): DataFrame =
    df.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("event_id")).as("sum_id"),
        dsum(col("value")).as("total")
      )
      .orderBy(col("event_type"))

  private val aggSql: String = s"""
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(event_id) AS BIGINT) AS sum_id,
             ${sqlSum("value")} AS total
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""

  private def roundtrip(spark: SparkSession, dir: String, format: String): DataFrame = {
    val payload = t(spark, dir).events.select(col("event_id"), col("event_type"), col("value"))
    val out = Scratch.dir(s"graft_src_$format").resolve("events").toString
    payload.write.mode("overwrite").format(format).save(out)
    agg(spark.read.schema(payload.schema).format(format).load(out))
  }

  val qJson: GQuery = GQuery("q_source_json_roundtrip", Some(aggSql)) { (spark, dir) =>
    roundtrip(spark, dir, "json")
  }

  val qCsv: GQuery = GQuery("q_source_csv_roundtrip", Some(aggSql)) { (spark, dir) =>
    roundtrip(spark, dir, "csv")
  }

  val qOrc: GQuery = GQuery("q_source_orc_roundtrip", Some(aggSql)) { (spark, dir) =>
    roundtrip(spark, dir, "orc")
  }

  /** Manifest-committed versioning + time travel
    * ([[graft.sources.Versioned]]): v1 snapshots the even event ids, v2
    * APPENDS the odds (carrying v1's files by reference, rewriting
    * nothing), then BOTH versions are read back — v1 through time travel
    * after v2 exists — and aggregated under a version column. The oracle
    * recomputes both version contents from the raw table, so a hash match
    * proves commits are complete, append carried the old files, and
    * history stayed intact after later writes.
    */
  val qVersioned: GQuery = GQuery(
    "q_source_versioned_time_travel",
    Some(s"""
      SELECT 1 AS version, event_type,
             COUNT(*) AS n,
             CAST(SUM(event_id) AS BIGINT) AS sum_id,
             ${sqlSum("value")} AS total
      FROM events WHERE event_id % 2 = 0
      GROUP BY event_type
      UNION ALL
      SELECT 2 AS version, event_type,
             COUNT(*) AS n,
             CAST(SUM(event_id) AS BIGINT) AS sum_id,
             ${sqlSum("value")} AS total
      FROM events
      GROUP BY event_type
      ORDER BY version, event_type""")
  ) { (spark, dir) =>
    val payload = t(spark, dir).events.select(col("event_id"), col("event_type"), col("value"))
    val out = Scratch.dir("graft_src_versioned").resolve("events").toString
    graft.sources.Versioned.publish(payload.filter(col("event_id") % 2 === 0), out)
    graft.sources.Versioned.append(payload.filter(col("event_id") % 2 =!= 0), out)
    def aggV(v: Int): DataFrame =
      graft.sources.Versioned.read(spark, out, Some(v))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("event_id")).as("sum_id"),
          dsum(col("value")).as("total"))
        .select(lit(v).as("version"), col("event_type"), col("n"), col("sum_id"), col("total"))
    aggV(1).unionAll(aggV(2)).orderBy(col("version"), col("event_type"))
  }

  /** XML round-trip (Spark 4's built-in `xml` source — one `<event>`
    * element per row under a `rowTag`). Same explicit-schema, lossless-
    * aggregate proof as the other text formats: doubles survive because
    * the writer emits shortest round-trip representations. XML is the
    * slowest and bulkiest of the text formats (angle-bracket overhead per
    * FIELD, multi-line records so splittability needs the multiLine
    * reader) — it exists for ingesting feeds that arrive as XML, never as
    * an interchange choice.
    */
  val qXml: GQuery = GQuery("q_source_xml_roundtrip", Some(aggSql)) { (spark, dir) =>
    val payload = t(spark, dir).events.select(col("event_id"), col("event_type"), col("value"))
    val out = Scratch.dir("graft_src_xml").resolve("events").toString
    payload.write.mode("overwrite").option("rowTag", "event").format("xml").save(out)
    agg(spark.read.schema(payload.schema).option("rowTag", "event").format("xml").load(out))
  }

  /** Hive-style partitioned-layout round-trip ([[graft.sources.Partitioned]]):
    * events written as `event_type=<v>/` directories, read back through
    * directory-partition discovery, same lossless-aggregate proof. The
    * partition column's values live in directory NAMES, not file bytes —
    * the layout that makes a filter on event_type prune whole directories
    * at planning time (pruning itself is asserted on the physical plan in
    * PartitionedSpec; this query proves the round-trip loses nothing).
    */
  val qPartitioned: GQuery = GQuery("q_source_partitioned_roundtrip", Some(aggSql)) { (spark, dir) =>
    val payload = t(spark, dir).events.select(col("event_id"), col("event_type"), col("value"))
    val out = Scratch.dir("graft_src_part").resolve("events").toString
    graft.sources.Partitioned.write(payload, out, Seq("event_type"))
    agg(graft.sources.Partitioned.read(spark, out))
  }

  /** DYNAMIC partition pruning over the hive layout — the runtime half of
    * the data-skipping story. [[qPartitioned]] proves PLANNING-time pruning
    * (literal filter on the partition column); here the days to read are
    * only known after filtering a dim table on a NON-join attribute
    * (`day_kind`, a stored column the optimizer cannot rewrite into a
    * static partition predicate), so Spark must inject a
    * DynamicPruningExpression into the fact scan that evaluates the
    * broadcast dim result at RUNTIME and skips the other day directories —
    * at 100 TB, the difference between scanning 30 days and the ~14 the
    * dim selects, with zero static predicate available. PartitionedSpec
    * asserts the `dynamicpruning` filter and the reduced file count on
    * this exact plan shape; this query proves the pruned result is
    * byte-identical to the oracle's unpruned join.
    *
    * The day key is `yyyyMMdd` as INT so directory-name type inference
    * round-trips it exactly (a `yyyy-MM-dd` string would come back as
    * DATE, which the oracle contract bans from outputs); `day_kind` is the
    * first md5 nibble of the day string — deterministic and portable, ~half
    * the days land in the selected set.
    */
  val qPartitionedDpp: GQuery = GQuery(
    "q_source_partitioned_dpp",
    Some(s"""
      WITH ev AS (SELECT event_id, value,
                         CAST(strftime(ts, '%Y%m%d') AS INT) AS day
                  FROM events),
           dim AS (SELECT day, substr(md5(CAST(day AS VARCHAR)), 1, 1) AS day_kind
                   FROM (SELECT DISTINCT day FROM ev)),
           sel AS (SELECT day FROM dim
                   WHERE day_kind IN ('0','1','2','3','4','5','6','7'))
      SELECT ev.day AS day,
             COUNT(*) AS n,
             CAST(SUM(event_id) AS BIGINT) AS sum_id,
             ${sqlSum("value")} AS total
      FROM ev JOIN sel ON ev.day = sel.day
      GROUP BY ev.day
      ORDER BY day""")
  ) { (spark, dir) => dppJoin(spark, dir)._1 }

  /** Builds the partitioned fact + dim layout and the DPP join; returns the
    * aggregated frame plus the raw joined frame PartitionedSpec uses for
    * plan/file-count assertions (same scan, pre-aggregation).
    */
  def dppJoin(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = t(spark, dir).events.select(
      col("event_id"),
      col("value"),
      date_format(graft.streaming.StreamOps.tsFromNanos(col("ts")), "yyyyMMdd")
        .cast("int").as("day"))
    val base = Scratch.dir("graft_src_dpp")
    val factPath = base.resolve("fact").toString
    val dimPath = base.resolve("dim").toString
    graft.sources.Partitioned.write(ev, factPath, Seq("day"))
    ev.select(col("day")).distinct()
      .withColumn("day_kind", substring(md5(col("day").cast("string")), 1, 1))
      .write.mode("overwrite").parquet(dimPath)
    val fact = graft.sources.Partitioned.read(spark, factPath)
    val sel = spark.read.parquet(dimPath)
      .where(col("day_kind").isin("0", "1", "2", "3", "4", "5", "6", "7"))
      .select(col("day"))
    val joined = fact.join(broadcast(sel), Seq("day"))
    val agg = joined
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("event_id")).as("sum_id"),
        dsum(col("value")).as("total"))
      .orderBy(col("day"))
    (agg, joined)
  }

  /** Resilient parsing of DIRTY json-lines input: a deterministic subset
    * of records (doc_id % 7 == 0) is truncated mid-token, and the parse
    * must degrade row-wise (corrupt rows counted, clean rows extracted) —
    * never fail the job, the non-negotiable ingest property at 100 TB
    * where some shard always contains garbage. Both engines build the
    * SAME lines by string concat (engine JSON serializers differ in
    * whitespace), Spark parses with `from_json` (PERMISSIVE: malformed →
    * null struct), the oracle replays with json_valid/json_extract.
    */
  val qDirtyJson: GQuery = GQuery(
    "q_source_dirty_json",
    Some("""
      WITH raw AS (SELECT doc_id, lang,
                          '{"doc_id":' || doc_id || ',"lang":"' || lang || '"}' AS line0
                   FROM documents),
           dirty AS (SELECT doc_id, lang,
                            CASE WHEN doc_id % 7 = 0
                                 THEN substr(line0, 1, length(line0) - 1)
                                 ELSE line0 END AS line
                     FROM raw)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(SUM(CASE WHEN json_valid(line) THEN 0 ELSE 1 END) AS BIGINT) AS n_corrupt,
             CAST(SUM(CASE WHEN json_valid(line)
                           THEN CAST(json_extract(line, '$.doc_id') AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS sum_parsed_ids
      FROM dirty GROUP BY 1 ORDER BY 1""")
  ) { (spark, dir) =>
    import spark.implicits._
    val raw = t(spark, dir).documents.select(
      $"doc_id",
      $"lang",
      concat(lit("{\"doc_id\":"), $"doc_id", lit(",\"lang\":\""), $"lang", lit("\"}")).as("line0"))
    val dirty = raw.select(
      $"doc_id",
      $"lang",
      when($"doc_id" % 7 === 0, expr("substring(line0, 1, length(line0) - 1)"))
        .otherwise($"line0").as("line"))
    dirty
      .withColumn("j", from_json($"line", "doc_id LONG, lang STRING", Map.empty[String, String]))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when($"j.doc_id".isNull, 1L).otherwise(0L)).as("n_corrupt"),
        sum(coalesce($"j.doc_id", lit(0L))).as("sum_parsed_ids"))
      .orderBy($"lang")
  }

  /** Resilient parsing of DIRTY CSV (the sibling of [[qDirtyJson]] for the
    * other ubiquitous text format): a deterministic subset of lines gets a
    * type-corrupt numeric field, and `from_csv` in PERMISSIVE mode must
    * degrade FIELD-wise — the corrupt column nulls out, the remaining
    * columns of the same row still parse, the job never fails. The oracle
    * replays the corruption rule (it knows which rows were damaged) while
    * the engine side exercises the real parser, exactly the dirty-json
    * contract.
    */
  val qDirtyCsv: GQuery = GQuery(
    "q_source_dirty_csv",
    Some("""
      WITH raw AS (SELECT doc_id, lang, n_chars,
                          CASE WHEN doc_id % 7 = 0
                               THEN doc_id || ',' || lang || ',' || n_chars || 'x'
                               ELSE doc_id || ',' || lang || ',' || n_chars END AS line
                   FROM documents)
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(SUM(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
             CAST(SUM(doc_id) AS BIGINT) AS sum_ids_all,
             CAST(SUM(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE n_chars END) AS BIGINT) AS sum_chars_valid
      FROM raw GROUP BY 1 ORDER BY 1""")
  ) { (spark, dir) =>
    import spark.implicits._
    val lines = t(spark, dir).documents.select(
      $"lang",
      concat(
        $"doc_id", lit(","), $"lang", lit(","), $"n_chars",
        when($"doc_id" % 7 === 0, lit("x")).otherwise(lit(""))).as("line"))
    lines
      .withColumn("c",
        from_csv($"line", org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id LONG, lang STRING, n LONG"), Map("mode" -> "PERMISSIVE")))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when($"c.n".isNull, 1L).otherwise(0L)).as("n_corrupt"),
        // field-wise degradation: the OTHER columns of a corrupt row parse
        sum($"c.doc_id").as("sum_ids_all"),
        sum(coalesce($"c.n", lit(0L))).as("sum_chars_valid"))
      .orderBy($"lang")
  }

  /** Change-data feed over the versioned table ([[graft.sources.Versioned
    * .changesBetween]]): v1 publishes the even events, v2 APPENDS the
    * odds, v3 REWRITES to only the high-value rows. The v1→v2 feed must
    * contain exactly the odd rows as inserts (append reads only the new
    * files — the incremental-consumer contract); the v2→v3 feed must
    * emit the whole pre-rewrite table as deletes plus the v3 snapshot as
    * inserts. The oracle restates all three legs from the base table.
    */
  val qVersionedChanges: GQuery = GQuery(
    "q_source_versioned_changes",
    Some(s"""
      SELECT * FROM (
        SELECT '1->2' AS span, 'insert' AS change_type, event_type,
               COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS sum_id
        FROM events WHERE event_id % 2 = 1
        GROUP BY event_type
        UNION ALL
        SELECT '2->3', 'delete', event_type, COUNT(*), CAST(SUM(event_id) AS BIGINT)
        FROM events
        GROUP BY event_type
        UNION ALL
        SELECT '2->3', 'insert', event_type, COUNT(*), CAST(SUM(event_id) AS BIGINT)
        FROM events WHERE value > 90.0
        GROUP BY event_type)
      ORDER BY span, change_type, event_type""")
  ) { (spark, dir) =>
    val payload = t(spark, dir).events.select(col("event_id"), col("event_type"), col("value"))
    val out = Scratch.dir("graft_src_cdc").resolve("events").toString
    graft.sources.Versioned.publish(payload.filter(col("event_id") % 2 === 0), out)
    graft.sources.Versioned.append(payload.filter(col("event_id") % 2 =!= 0), out)
    graft.sources.Versioned.publish(payload.filter(col("value") > 90.0), out)
    def leg(fromV: Int, toV: Int): DataFrame =
      graft.sources.Versioned
        .changesBetween(spark, out, fromV, toV)
        .groupBy(col("_change_type"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_id"))
        .select(
          lit(s"$fromV->$toV").as("span"),
          col("_change_type").as("change_type"),
          col("event_type"), col("n"), col("sum_id"))
    leg(1, 2)
      .unionAll(leg(2, 3))
      .orderBy(col("span"), col("change_type"), col("event_type"))
  }

  /** Schema evolution across parquet generations: generation 1 wrote
    * `(event_id, event_type)` (the even ids), generation 2 added a
    * `value` column (the odds). A `mergeSchema` read unions the file
    * schemas — legacy rows surface the added column as NULL, the lake
    * contract every long-lived 100 TB table depends on (columns are only
    * ever ADDED; readers reconcile). The aggregate counts legacy rows via
    * that NULL and sums the new column, so the oracle (recomputing both
    * generations from the raw table) proves no row was dropped, no value
    * leaked into legacy rows, and the added column round-tripped.
    *
    * (`mergeSchema` lists every file's footer at planning time — fine per
    * query here; at real scale you pin the evolved schema in a metastore
    * or read with an explicit schema instead of paying the listing.)
    */
  val qSchemaEvolution: GQuery = GQuery(
    "q_source_schema_evolution",
    Some(s"""
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(event_id) AS BIGINT) AS sum_id,
             CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_legacy,
             ${sqlSum("CASE WHEN event_id % 2 = 1 THEN value END")} AS total
      FROM events
      GROUP BY event_type
      ORDER BY event_type""")
  ) { (spark, dir) =>
    val ev = t(spark, dir).events.select(col("event_id"), col("event_type"), col("value"))
    val out = Scratch.dir("graft_src_evolve").toString
    val gen1 = s"$out/batch1"
    val gen2 = s"$out/batch2"
    ev.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("event_type"))
      .write.mode("overwrite").parquet(gen1)
    ev.filter(col("event_id") % 2 === 1)
      .write.mode("overwrite").parquet(gen2)
    spark.read.option("mergeSchema", "true").parquet(gen1, gen2)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("event_id")).as("sum_id"),
        count(when(col("value").isNull, 1)).as("n_legacy"),
        dsum(col("value")).as("total"))
      .orderBy(col("event_type"))
  }

  /** RESTORE-style rollback ([[graft.sources.Versioned.rollback]]): v1 =
    * even events, v2 appends the odds, v3 = rollback to v1 (a forward
    * commit re-pointing at v1's files — no data copied). Reading each of
    * the three versions must show the bad append both applied (v2) and
    * undone (v3 ≡ v1), with history intact — the oracle states exactly
    * that from the base table.
    */
  val qVersionedRollback: GQuery = GQuery(
    "q_source_versioned_rollback",
    Some(s"""
      WITH a AS (
        SELECT event_type, COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS sum_id,
               ${sqlSum("value")} AS total
        FROM events WHERE event_id % 2 = 0 GROUP BY event_type),
      b AS (
        SELECT event_type, COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS sum_id,
               ${sqlSum("value")} AS total
        FROM events GROUP BY event_type)
      SELECT * FROM (
        SELECT 1 AS version, * FROM a
        UNION ALL SELECT 2, * FROM b
        UNION ALL SELECT 3, * FROM a)
      ORDER BY version, event_type""")
  ) { (spark, dir) =>
    val payload = t(spark, dir).events.select(col("event_id"), col("event_type"), col("value"))
    val scratch = Scratch.dir("graft_src_rollback")
    val out = scratch.resolve("events").toString
    graft.sources.Versioned.publish(payload.filter(col("event_id") % 2 === 0), out)
    graft.sources.Versioned.append(payload.filter(col("event_id") % 2 =!= 0), out)
    val v3 = graft.sources.Versioned.rollback(spark, out, 1)
    assert(v3 == 3, s"rollback should commit v3, got v$v3")
    def aggV(v: Int): DataFrame =
      graft.sources.Versioned.read(spark, out, Some(v))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("event_id")).as("sum_id"),
          dsum(col("value")).as("total"))
        .select(lit(v).as("version"), col("event_type"), col("n"), col("sum_id"), col("total"))
    val res = aggV(1).unionAll(aggV(2)).unionAll(aggV(3))
      .orderBy(col("version"), col("event_type"))
      .ckpt() // materialize the tiny aggregate so the snapshot can go
    Scratch.purge(scratch)
    res
  }

  /** Deterministic shard-export manifest ([[graft.sources.ExportShards]]):
    * portable md5 shard assignment (pure function of doc_id — stable
    * across reruns/backfills) plus the per-shard audit a trainer reads
    * before consuming shards (row counts, key ranges, payload totals).
    * The oracle replays the 16-bit md5 bucket mod n in DuckDB, so the
    * hash match proves assignment portability; the actual partitioned
    * write (one file per shard, manifest committed after data) is gated
    * by ExportShardsSpec on real files.
    */
  val qExportShards: GQuery = GQuery(
    "q_export_shards",
    Some("""
      SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 4))::UBIGINT % 8 AS INT) AS shard,
             COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             CAST(MIN(doc_id) AS BIGINT) AS min_doc,
             CAST(MAX(doc_id) AS BIGINT) AS max_doc
      FROM documents
      GROUP BY shard
      ORDER BY shard""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).documents
      .select($"doc_id", $"n_chars",
        graft.sources.ExportShards.shardId($"doc_id", 8).as("shard"))
      .groupBy($"shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        min($"doc_id").as("min_doc"),
        max($"doc_id").as("max_doc"))
      .orderBy($"shard")
  }

  /** WebDataset tar-shard round trip ([[graft.sources.TarShards]]): the
    * corpus packed into 8 deterministic POSIX ustar archives (the
    * multimodal-training interchange format), then re-read by the
    * distributed tar parser (header checksums verified per entry) and
    * audited per entry. The oracle never sees the tar bytes — it derives
    * every column (portable shard id, zero-padded entry name, UTF-8 byte
    * size, payload md5) straight from `documents`, so a hash match proves
    * the archive round trip preserved membership, naming, sizes, and
    * content bit-for-bit.
    */
  val qWebdataset: GQuery = GQuery(
    "q_export_webdataset",
    Some("""
      SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 4))::UBIGINT % 8 AS INT) AS shard,
             printf('%08d', doc_id) || '.txt' AS entry,
             CAST(strlen(text) AS BIGINT) AS size,
             md5(text) AS payload_md5
      FROM documents
      ORDER BY shard, entry""")
  ) { (spark, dir) =>
    import spark.implicits._
    val scratch = Scratch.dir("wds")
    graft.sources.TarShards.write(
      t(spark, dir).documents, keyCol = "doc_id", textCol = "text",
      n = 8, outDir = scratch.toString, seed = 7L)
    val res = graft.sources.TarShards.read(spark, scratch.toString)
      .select($"shard", $"entry", $"size", md5($"payload").as("payload_md5"))
      .orderBy($"shard", $"entry")
      .ckpt()
    Scratch.purge(scratch)
    res
  }

  /** FIXED-WIDTH (mainframe/COBOL copybook-style) text ingest: write
    * every order as one 38-char record — zero-padded 10-digit key,
    * 1-char status, zero-padded 12-digit price in cents, 15-char
    * left-justified priority — then parse it back with positional
    * substrings. The legacy-feed format every enterprise lake still
    * ingests, and one no self-describing reader handles: schema lives
    * entirely in the parse spec. The oracle recomputes every field
    * from `orders` directly, so the hash match proves format → write →
    * read → positional parse round-trips losslessly (cents quantize
    * via floor(100·p + 0.5) of the engine-identical double on both
    * sides). Row-local both ways; no shuffle beyond the final sort.
    */
  val qFixedWidth: GQuery = GQuery(
    "q_source_fixed_width",
    Some("""
      SELECT o_orderkey AS orderkey,
             o_orderstatus AS status,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
             trim(o_orderpriority) AS priority,
             38 AS record_len
      FROM orders ORDER BY orderkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    val out = Scratch.dir("graft_src_fixed").resolve("orders").toString
    t(spark, dir).orders
      .select(format_string("%010d%1s%012d%-15s",
        $"o_orderkey", $"o_orderstatus",
        floor($"o_totalprice" * 100 + 0.5).cast("long"),
        $"o_orderpriority").as("value"))
      .write.mode("overwrite").text(out)
    spark.read.text(out)
      .select(
        $"value".substr(1, 10).cast("long").as("orderkey"),
        $"value".substr(11, 1).as("status"),
        $"value".substr(12, 12).cast("long").as("price_cents"),
        trim($"value".substr(24, 15)).as("priority"),
        length($"value").cast("int").as("record_len"))
      .orderBy($"orderkey")
  }

  override def queries: Seq[GQuery] =
    Seq(qJson, qCsv, qOrc, qXml, qDirtyJson, qDirtyCsv, qPartitioned, qPartitionedDpp,
      qVersioned, qVersionedChanges, qSchemaEvolution, qVersionedRollback, qExportShards,
      qWebdataset, qFixedWidth)
}
