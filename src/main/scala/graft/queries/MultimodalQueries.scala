package graft.queries

import org.apache.spark.sql.functions._

import Common._
import graft.operators.Multimodal

/** Multimodal-column inventory: binary payload plumbing + (stubbed)
  * decode metadata + frame sampling. The decode itself is a deterministic
  * fake (no codecs in this container — see Multimodal.fakeDecode); the
  * schema, mapPartitions batch shape, and partition parallelism are real.
  */
object MultimodalQueries extends QuerySet {

  /** Byte-level stats over the binary payload (pure SQL-expressible). */
  val qBytes: GQuery = GQuery(
    "q_multimodal_bytes",
    Some("""
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             md5(text) AS content_md5
      FROM documents
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).documents
      .select(
        $"doc_id",
        octet_length(encode($"text", "UTF-8")).cast("long").as("n_bytes"),
        md5(encode($"text", "UTF-8")).as("content_md5")
      )
      .orderBy($"doc_id")
  }

  /** Decode-metadata pipeline: binary column → mapPartitions decoder →
    * typed metadata. Oracle-checked because the stub decode derives its
    * values from md5(payload) — reproducible in SQL.
    */
  val qMeta: GQuery = GQuery(
    "q_multimodal_meta",
    Some("""
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             64 + CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 1856 AS width,
             64 + (CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) // 1856) % 1016 AS height,
             CASE CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 3
               WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format
      FROM documents
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(spark, t(spark, dir).documents)
    Multimodal
      .decodeMeta(media)
      .select($"doc_id", $"n_bytes", $"width", $"height", $"format")
      .orderBy($"doc_id")
  }

  /** Frame sampling: one row per fixed-stride byte window (stands in for
    * video frame extraction; shows the explode-to-frames shape).
    */
  val qFrames: GQuery = GQuery(
    "q_multimodal_frames",
    Some("""
      SELECT doc_id, COUNT(*) AS n_frames
      FROM (SELECT doc_id, unnest(generate_series(0, (octet_length(encode(text)) - 64) // 64)) AS f
            FROM documents
            WHERE octet_length(encode(text)) >= 64)
      GROUP BY doc_id
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(spark, t(spark, dir).documents)
    Multimodal
      .sampleFrames(media, frameSize = 64, stride = 64)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_frames"))
      .orderBy($"doc_id")
  }

  override def queries: Seq[GQuery] = Seq(qBytes, qMeta, qFrames)
}
