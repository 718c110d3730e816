package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}

import Multimodal.MediaRecord

/** REAL media codecs on multimodal binary columns — no stub: PNG through
  * the JDK's ImageIO (actual compressed image container, actual pixel
  * decode) and WAV/PCM through a pure RIFF header+sample parser.
  *
  * The driver testdata ships no media files, so [[syntheticImages]] /
  * [[syntheticWavs]] RENDER deterministic real files per doc_id (solid-fill
  * PNG, square-wave WAV). Determinism is what makes the decode
  * oracle-able: the DuckDB oracle recomputes the expected metadata from
  * the same doc_id formulas, so a hash match proves the engine round-
  * tripped real containers — encode, decode, pixel/sample math — not that
  * it echoed inputs.
  *
  * Scale shape: one codec context per partition (mapPartitions), rows
  * stream through, payloads never hit the driver. On a 1000-executor
  * cluster each task decodes its own parquet row-group of blobs —
  * embarrassingly parallel, no shuffle.
  */
object MediaCodec {

  // Headless: executors have no display; ImageIO needs AWT in headless mode.
  System.setProperty("java.awt.headless", "true")
  // ImageIO's default stream cache spools every encode/decode through a
  // DISK temp file — a per-blob fsync tax that dwarfs the codec for small
  // images. Keep streams in memory.
  ImageIO.setUseCache(false)

  final case class ImageMeta(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      format: String,
      mean_luma_milli: Long
  )

  final case class AudioMeta(
      doc_id: Long,
      n_bytes: Long,
      sample_rate: Int,
      channels: Int,
      bits_per_sample: Int,
      n_samples: Long,
      duration_ms: Long,
      rms_amplitude: Long
  )

  // ---- deterministic synthetic sources (real file formats) ----

  /** Image dimensions/fill derived from doc_id; mirrored by the oracle. */
  def imgWidth(id: Long): Int = (16 + id % 48).toInt
  def imgHeight(id: Long): Int = (16 + (id / 48) % 48).toInt
  def imgRgb(id: Long): (Int, Int, Int) =
    ((id % 256).toInt, ((id / 7) % 256).toInt, ((id / 13) % 256).toInt)

  /** Render one real PNG (solid fill) for a doc id. */
  def pngFor(id: Long): Array[Byte] = {
    val (r, g, b) = imgRgb(id)
    val img = new BufferedImage(imgWidth(id), imgHeight(id), BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 64 pattern bits for a pattern class (SplitMix64 finalizer — fixed,
    * engine-independent). Each class is an 8×8 black/white block layout.
    */
  def patternBits(cls: Long): Long = {
    var z = cls + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Render one real PNG whose CONTENT is a pattern class (id % classes)
    * and whose RESOLUTION varies per id: the 8×8 block pattern scales to
    * this id's width×height, so ids sharing a class are the same picture
    * at different sizes — the re-encoded-thumbnail duplicate an image
    * corpus actually contains.
    */
  def patternPngFor(id: Long, classes: Int): Array[Byte] =
    patternImageFor(id, classes, "png")

  /** [[patternPngFor]] through any JDK-shipped ImageIO codec ("png",
    * "jpg", "bmp", "gif"): the same picture through DIFFERENT real
    * compressed containers — the cross-format duplicate (a JPEG re-save
    * of a PNG) that byte-level dedup can never catch and perceptual
    * hashing must. Block patterns survive JPEG's lossy DCT with the
    * cell averages intact, so aHash collapses the pair.
    */
  def patternImageFor(id: Long, classes: Int, format: String): Array[Byte] = {
    val bits = patternBits(id % classes)
    val w = imgWidth(id)
    val h = imgHeight(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val bx = x * 8 / w
        val on = (bits >>> (by * 8 + bx) & 1L) == 1L
        img.setRGB(x, y, if (on) 0xffffff else 0x000000)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  /** Media table of patterned PNGs (duplicate classes at mixed sizes). */
  def syntheticPatternedImages(ids: DataFrame, classes: Int): Dataset[MediaRecord] = {
    import ids.sparkSession.implicits._
    spreadIds(ids).mapPartitions(_.map(id => MediaRecord(id, patternPngFor(id, classes))))
  }

  /** Perceptual average-hash (aHash) from DECODED pixels: partition the
    * image into an 8×8 cell grid, integer-average each cell's luma, set
    * bit (row·8+col) iff the cell beats the global mean. Pure integer
    * math over the real decode, so the hash is deterministic across
    * partitionings and JVMs, and resolution-invariant for block content —
    * the property that makes it a DEDUP key: resized/re-encoded copies
    * collapse to the same 64-bit value, turning image near-dup into the
    * same hash-groupBy shape as text exact dedup (no pairwise pixel
    * comparisons anywhere). A narrow map over the blob column; only
    * (id, hash) ever shuffles.
    */
  def aHash64(ds: Dataset[MediaRecord]): Dataset[(Long, Long)] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val img = ImageIO.read(new ByteArrayInputStream(r.media))
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Long](64)
        val counts = new Array[Long](64)
        var y = 0
        while (y < h) {
          val by = y * 8 / h
          var x = 0
          while (x < w) {
            val bx = x * 8 / w
            val p = img.getRGB(x, y)
            sums(by * 8 + bx) +=
              299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
            counts(by * 8 + bx) += 1
            x += 1
          }
          y += 1
        }
        val cells = Array.tabulate(64)(i => if (counts(i) == 0) 0L else sums(i) / counts(i))
        val mean = cells.sum / 64
        var hash = 0L
        var i = 0
        while (i < 64) {
          if (cells(i) > mean) hash |= 1L << i
          i += 1
        }
        (r.doc_id, hash)
      }
    }
  }

  /** WAV parameters derived from doc_id; mirrored by the oracle. */
  def wavSamples(id: Long): Int = (800 + id % 1600).toInt // 0.1–0.3 s at 8 kHz
  def wavAmplitude(id: Long): Int = (1000 + id % 20000).toInt

  /** Render one real RIFF/WAVE file: 8 kHz mono 16-bit PCM square wave. */
  def wavFor(id: Long): Array[Byte] = {
    val n = wavSamples(id)
    val amp = wavAmplitude(id)
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer
      .allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(1) // mono
    buf.putInt(8000) // sample rate
    buf.putInt(8000 * 2) // byte rate
    buf.putShort(2) // block align
    buf.putShort(16) // bits
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      // period-16 square wave: |sample| == amp for every sample
      buf.putShort(if ((i / 8) % 2 == 0) amp.toShort else (-amp).toShort)
      i += 1
    }
    buf.array()
  }

  /** Codec work is CPU-bound; a small parquet input may arrive as ONE
    * split, which would serialize every decode onto one core, and AQE
    * happily coalesces a DataFrame repartition of a few-KB id column right
    * back to one partition (it sizes by bytes, not downstream CPU). An
    * RDD-level repartition pins the fan-out — at scale this is the
    * explicit spread you do before any per-blob codec pass.
    */
  private def spreadIds(ids: DataFrame): Dataset[Long] = {
    val spark = ids.sparkSession
    import spark.implicits._
    spark.createDataset(
      ids.select("doc_id").as[Long].rdd.repartition(spark.sparkContext.defaultParallelism))
  }

  /** Media table of real PNGs, one per input doc id. */
  def syntheticImages(ids: DataFrame): Dataset[MediaRecord] = {
    import ids.sparkSession.implicits._
    spreadIds(ids).mapPartitions(_.map(id => MediaRecord(id, pngFor(id))))
  }

  /** Media table of real WAVs, one per input doc id. */
  def syntheticWavs(ids: DataFrame): Dataset[MediaRecord] = {
    import ids.sparkSession.implicits._
    spreadIds(ids).mapPartitions(_.map(id => MediaRecord(id, wavFor(id))))
  }

  // ---- real decodes ----

  /** Decode image containers with ImageIO: true dimensions, container
    * format name, and mean per-pixel luma (integer per-mille BT.601:
    * 299R+587G+114B) computed from the DECODED pixels.
    */
  def decodeImages(ds: Dataset[MediaRecord]): Dataset[ImageMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val in = ImageIO.createImageInputStream(new ByteArrayInputStream(r.media))
        val readers = ImageIO.getImageReaders(in)
        require(readers.hasNext, s"no image reader for doc ${r.doc_id}")
        val reader = readers.next()
        reader.setInput(in)
        val format = reader.getFormatName.toLowerCase
        val img = reader.read(0)
        reader.dispose()
        var lumaSum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            lumaSum += 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) + 114L * (p & 0xff)
            x += 1
          }
          y += 1
        }
        val nPx = img.getWidth.toLong * img.getHeight
        ImageMeta(r.doc_id, r.media.length.toLong, img.getWidth, img.getHeight, format,
          lumaSum / nPx)
      }
    }
  }

  /** Resize through a real raster op (Graphics2D bilinear) and re-encode
    * as PNG — the thumbnail stage of an image-training pipeline.
    */
  def resizeImages(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val img = ImageIO.read(new ByteArrayInputStream(r.media))
        val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new ByteArrayOutputStream()
        ImageIO.write(out, "png", bos)
        MediaRecord(r.doc_id, bos.toByteArray)
      }
    }
  }

  /** Parse RIFF/WAVE headers and PCM samples: rate/channels/bits from the
    * fmt chunk, RMS amplitude from the decoded int16 samples (integer
    * exact for square waves).
    */
  def decodeWavs(ds: Dataset[MediaRecord]): Dataset[AudioMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val buf = java.nio.ByteBuffer.wrap(r.media).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def tag(): String = {
          val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
        }
        require(tag() == "RIFF", s"doc ${r.doc_id}: not RIFF")
        buf.getInt // riff size
        require(tag() == "WAVE", s"doc ${r.doc_id}: not WAVE")
        var rate = 0; var channels = 0; var bits = 0
        var nSamples = 0L; var sumSq = 0.0
        while (buf.remaining() >= 8) {
          val chunk = tag()
          val len = buf.getInt
          chunk match {
            case "fmt " =>
              val end = buf.position() + len
              buf.getShort // audio format
              channels = buf.getShort.toInt
              rate = buf.getInt
              buf.getInt // byte rate
              buf.getShort // block align
              bits = buf.getShort.toInt
              buf.position(end)
            case "data" =>
              val n = len / 2
              var i = 0
              while (i < n) {
                val s = buf.getShort.toDouble
                sumSq += s * s
                i += 1
              }
              nSamples += n
            case _ => buf.position(buf.position() + len)
          }
          // RIFF chunks are word-aligned: odd-length chunks carry a pad
          // byte that is NOT counted in len — skipping it keeps the next
          // tag read aligned (real-world LIST/INFO chunks are often odd)
          if (len % 2 == 1 && buf.remaining() > 0) buf.position(buf.position() + 1)
        }
        val rms = math.round(math.sqrt(sumSq / math.max(1L, nSamples)))
        AudioMeta(r.doc_id, r.media.length.toLong, rate, channels, bits, nSamples,
          nSamples * 1000L / math.max(1, rate), rms)
      }
    }
  }
}
