package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Common._

/** Raw-corpus ingestion surface: the paths a 100 TB training-data pipeline
  * uses to get loose files INTO the engine, plus the first cleaning step
  * after ingest (HTML/boilerplate strip).
  *
  * The reference ingests only Kafka bytes (callysto/src/kafka/cconsumer.rs:
  * 36-122); file-tree ingestion is part of the Spark-native surface. Two
  * properties matter at scale and are proven here:
  *
  *   - `binaryFile` ingestion: one row per file with content bytes — the
  *     standard way to load image/audio corpora (millions of small opaque
  *     files). Spark packs many small files into one task up to
  *     `spark.sql.files.maxPartitionBytes`, so the file count does not
  *     become the task count; `pathGlobFilter` prunes non-matching files
  *     at LISTING time (never opened). Large files do not split — fine
  *     for media objects, which are consumed whole.
  *   - `_metadata` provenance: every file-source row can carry its origin
  *     file constant-width (`_metadata.file_path`), which is how lineage
  *     survives into downstream tables without a join back to a manifest.
  */
object IngestQueries extends QuerySet {

  /** Fixed HTML skeleton pieces — no quote characters, so the same literal
    * embeds verbatim in both the Scala string and the DuckDB SQL string.
    */
  private val htmlHead: String =
    "<html><head><title>T</title><script type=text/javascript>if (1 < 2) { x = 1; }" +
      "</script><style>p { margin: 0; }</style></head><body><h1 class=t>"
  private val htmlMid: String  = "</h1><p>"
  private val htmlTail: String =
    "</p><div>&amp; &lt;tag&gt;&nbsp;caf&#39;e</div></body></html>"

  /** Write each document as its OWN file — executor-parallel direct file
    * writes, the id carried in the FILENAME (`doc_<id>.txt`, the shape a
    * real media corpus arrives in) — then ingest the tree back through
    * `binaryFile` and prove the bytes survived: per-file length and md5
    * must match what the oracle computes straight from the `documents`
    * table, and the id is recovered from the path with one
    * `regexp_extract` (no manifest join).
    *
    * The FIXTURE is capped at 1000 docs so the bench times the ingest
    * mechanism, not temp-file creation; the read path itself has no such
    * limit (Spark packs small files per task up to maxPartitionBytes, so
    * file count never becomes task count).
    */
  val qBinaryFiles: GQuery = GQuery(
    "q_source_binary_files",
    Some("""
      SELECT doc_id,
             CAST(strlen(text) AS BIGINT) AS n_bytes,
             md5(text) AS digest
      FROM documents
      WHERE doc_id < 1000
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val out = Scratch.dir("graft_binfiles").resolve("docs")
    Files.createDirectories(out)
    val outPath = out.toString
    t(spark, dir).documents
      .filter($"doc_id" < 1000)
      .select($"doc_id", $"text")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outPath, f"doc_${r.getLong(0)}%06d.txt"),
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      }
    spark.read
      .format("binaryFile")
      .option("pathGlobFilter", "*.txt")
      .load(outPath)
      .select(
        regexp_extract($"path", "doc_(\\d+)\\.txt$", 1).cast("long").as("doc_id"),
        $"length".as("n_bytes"),
        lower(md5($"content")).as("digest"))
      .orderBy($"doc_id")
  }

  /** File-provenance columns: write events Hive-partitioned, read back with
    * the constant-width `_metadata.file_path` pseudo-column, and assert —
    * inside the engine, as data — that every row's recorded origin file
    * sits under its own partition directory and that at least one distinct
    * file backs each partition. The booleans are pinned TRUE in the oracle
    * (bound-encoded pattern): a hash match proves provenance is wired, while
    * n/sum_id prove the round-trip lost nothing. File COUNTS are layout-
    * dependent (task parallelism), so only `>= 1` is asserted, not a number.
    */
  val qFileProvenance: GQuery = GQuery(
    "q_source_file_provenance",
    Some("""
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(event_id) AS BIGINT) AS sum_id,
             TRUE AS path_consistent,
             TRUE AS has_files
      FROM events
      GROUP BY event_type
      ORDER BY event_type""")
  ) { (spark, dir) =>
    import spark.implicits._
    val out = Scratch.dir("graft_prov").resolve("events").toString
    t(spark, dir).events
      .select($"event_id", $"event_type", $"value")
      .write
      .partitionBy("event_type")
      .mode("overwrite")
      .parquet(out)
    spark.read
      .parquet(out)
      .select($"event_type", $"event_id", col("_metadata.file_path").as("fp"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"event_id").as("sum_id"),
        bool_and($"fp".contains(concat(lit("event_type="), $"event_type")))
          .as("path_consistent"),
        (countDistinct($"fp") >= 1).as("has_files"))
      .orderBy($"event_type")
  }

  /** HTML/boilerplate strip — the first transform applied to crawled text.
    * Deterministic fixture: each document is wrapped in a fixed HTML
    * skeleton (script + style blocks, attributed tags, entities, the text
    * split into <p> paragraphs), then the strip chain recovers clean text:
    * drop script/style WITH their contents, drop tags, decode entities
    * (after tag removal, so decoded angle brackets stay literal text —
    * standard order), collapse whitespace. The oracle replays both the
    * wrap and the strip in DuckDB, so the hash match proves each regex
    * step behaves identically cross-engine (patterns are kept in the
    * RE2-compatible subset: no lookaround, inline (?s) only).
    *
    * All regexp steps are codegen'd built-ins running in one projection —
    * no UDF, no shuffle; at 100 TB this is a pure map stage. The
    * REGISTERED query runs the production path — the staged-linear-scan
    * expression [[graft.functions.HtmlStripText]] — against the regex
    * chain replayed in the oracle, so the hash match proves the two
    * implementations compute the identical function (ExtensionSpec
    * additionally pins them equal on adversarial fragments).
    */
  val qHtmlStrip: GQuery = GQuery(
    "q_text_html_strip",
    Some(s"""
      WITH h AS (SELECT doc_id,
                        '$htmlHead' || source || '$htmlMid'
                          || regexp_replace(text, chr(10), '</p>' || chr(10) || '<p>', 'g')
                          || '$htmlTail' AS html
                 FROM documents),
      s AS (SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(html, '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
                       '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
                     '<[^>]+>', ' ', 'g') AS t1
            FROM h),
      e AS (SELECT doc_id,
                   replace(replace(replace(replace(replace(t1,
                     '&nbsp;', ' '),
                     '&lt;', '<'),
                     '&gt;', '>'),
                     '&#39;', chr(39)),
                     '&amp;', '&') AS t2
            FROM s)
      SELECT doc_id,
             trim(regexp_replace(t2, '\\s+', ' ', 'g')) AS clean_text,
             CAST(length(trim(regexp_replace(t2, '\\s+', ' ', 'g'))) AS BIGINT) AS n_clean
      FROM e
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val html = concat(
      lit(htmlHead),
      $"source",
      lit(htmlMid),
      regexp_replace($"text", "\n", "</p>\n<p>"),
      lit(htmlTail))
    val stripped = graft.functions.GraftFunctions.htmlStrip(html)
    t(spark, dir).documents
      .select(
        $"doc_id",
        stripped.as("clean_text"),
        length(stripped).cast("long").as("n_clean"))
      .orderBy($"doc_id")
  }

  /** The strip chain on a Column (engine side of [[qHtmlStrip]]); exposed
    * so pipelines can reuse it on real crawled HTML, not just the fixture.
    */
  def htmlToText(html: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " "),
      "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]+>", " ")
    val decoded = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(noTags, "&nbsp;", " "),
            "&lt;", "<"),
          "&gt;", ">"),
        "&#39;", "'"),
      "&amp;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  override def queries: Seq[GQuery] = Seq(qBinaryFiles, qFileProvenance, qHtmlStrip)
}
