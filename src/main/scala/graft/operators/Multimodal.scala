package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata structs alongside.
  *
  * The Spark-side plumbing — schema, partition-parallel batch decode via
  * mapPartitions, deterministic output shape — is real and tested. The
  * actual byte→pixels/samples decode is a STUB (this container has no
  * image/audio codecs): `fakeDecode` derives metadata deterministically
  * from an MD5 content hash, which keeps the pipeline end-to-end testable
  * and SQL-oracle-able. Swapping in a real codec changes only the body of
  * `fakeDecode`.
  *
  * Scale notes: decode runs once per partition iterator (no per-row setup
  * cost — the place a real codec would be initialized), rows never leave
  * the executor, and output is columnar-friendly primitives.
  */
object Multimodal {

  /** A media row: id + opaque payload bytes. */
  final case class MediaRecord(doc_id: Long, media: Array[Byte])

  /** Decoded (faked) metadata for a media payload. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      width: Long,
      height: Long,
      format: String
  )

  /** Deterministic fake decode: metadata derived from md5(bytes).
    * STUB for a real image decoder — same contract, fake content.
    */
  def fakeDecode(r: MediaRecord): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(r.media).map("%02x".format(_)).mkString
    // first 15 hex chars → 60-bit non-negative long (matches the SQL
    // oracle's CAST('0x'||substr(md5(x),1,15) AS BIGINT))
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    MediaMeta(
      doc_id = r.doc_id,
      n_bytes = r.media.length.toLong,
      width = 64L + h % 1856L,
      height = 64L + (h / 1856L) % 1016L,
      format = if (h % 3 == 0) "jpeg" else if (h % 3 == 1) "png" else "webp"
    )
  }

  /** Batch-decode a media Dataset: one decoder instance per partition,
    * streaming the iterator (never materializes a partition in memory).
    */
  def decodeMeta(ds: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real impl: init codec here, once per partition
      it.map(fakeDecode)
    }
  }

  /** Frame/sample extraction stub: fixed-offset byte slices standing in
    * for frame grabs — shows the explode-to-frames shape (one row per
    * sampled frame, metadata struct alongside the payload slice).
    */
  def sampleFrames(ds: Dataset[MediaRecord], frameSize: Int, stride: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      r.media.grouped(stride).zipWithIndex.collect {
        case (chunk, i) if chunk.length >= frameSize =>
          (r.doc_id, i.toLong, chunk.take(frameSize))
      }
    }.toDF("doc_id", "frame_idx", "frame_bytes")
  }

  /** Lift a text table into a media table (binary payload = UTF-8 bytes):
    * the stand-in media source for this container.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media")).as[MediaRecord]
  }
}
