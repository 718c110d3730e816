package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shard export: the corpus packed into `n` POSIX
  * ustar archives, one entry per sample — the de-facto interchange format
  * for streaming multimodal training data (a trainer reads shard tars
  * sequentially; no random access, no parquet dependency). The writer is
  * fully deterministic (fixed mode/uid/mtime, entries sorted by key, the
  * portable [[ExportShards.shardId]] assignment), so reruns produce
  * byte-identical shards.
  *
  * Reference analog: none — callysto leaves layout to its sinks
  * (SURVEY §2.3); shard packaging is part of the batch surface a training
  * pipeline needs.
  *
  * Scale shape: one hash shuffle on the shard id, then each task streams
  * its shard's rows straight to the archive via plain NIO (the
  * foreachPartition + nio discipline — a dynamic-partition commit of n
  * files would pay the commit protocol per shard). Headers are 512-byte
  * blocks; the writer never buffers more than one entry.
  *
  * No tar library exists in this container, so the 512-byte ustar header
  * is emitted field by field (name/mode/uid/gid/size/mtime/checksum/
  * magic), and [[read]] re-parses it, VERIFYING each header checksum —
  * the round trip plus the content oracle proves the format end to end.
  */
object TarShards {

  private val Block = 512

  private def octal(v: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(v)
    val padded = ("0" * (width - 1 - s.length)) + s + "\u0000"
    padded.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }

  private def header(name: String, size: Long): Array[Byte] = {
    val h = new Array[Byte](Block)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    def put(off: Int, bytes: Array[Byte]): Unit =
      System.arraycopy(bytes, 0, h, off, bytes.length)
    require(name.getBytes(ascii).length <= 100, s"entry name too long: $name")
    put(0, name.getBytes(ascii))          // name[100]
    put(100, octal(420, 8))               // mode 0644
    put(108, octal(0, 8))                 // uid
    put(116, octal(0, 8))                 // gid
    put(124, octal(size, 12))             // size
    put(136, octal(0, 12))                // mtime (fixed: determinism)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum field = spaces
    h(156) = '0'                          // typeflag: regular file
    put(257, "ustar\u0000".getBytes(ascii))
    put(263, "00".getBytes(ascii))
    val sum = h.foldLeft(0L)((a, b) => a + (b & 0xff))
    put(148, octal(sum, 7))               // 6 octal digits + NUL
    h(155) = ' '.toByte
    h
  }

  /** Write one tar per shard under `outDir` as `shard-<i>.tar`. Entries
    * are `<key zero-padded to 8>.txt` holding the UTF-8 payload, sorted
    * by key within the shard. Returns the number of shards written.
    */
  def write(
      df: DataFrame,
      keyCol: String,
      textCol: String,
      n: Int,
      outDir: String,
      seed: Long = 0L
  ): Int = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    df
      .select(col(keyCol).cast("long").as("k"), col(textCol).as("t"),
        ExportShards.shardId(col(keyCol), n, seed).as("shard"))
      .repartition(n, col("shard"))
      .sortWithinPartitions(col("shard"), col("k"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        // write-to-temp + atomic rename: a retried or speculative task
        // attempt can never leave a torn final archive. The temp name
        // carries the task ATTEMPT id — with a shared temp path a
        // speculative attempt racing a retry would interleave writes
        // into one file and the atomic move could publish a corrupt
        // archive; per-attempt temps make last-rename-wins safe (both
        // attempts produce byte-identical archives by determinism).
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        var out: java.io.OutputStream = null
        var tmp: java.nio.file.Path = null
        var fin: java.nio.file.Path = null
        var current = -1
        def sealCurrent(): Unit = if (out != null) {
          out.write(new Array[Byte](2 * Block)); out.close(); out = null
          java.nio.file.Files.move(tmp, fin,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        try {
          rows.foreach { r =>
            val shard = r.getAs[Int]("shard")
            if (shard != current) { // rows sorted: one stream per shard run
              sealCurrent()
              current = shard
              fin = java.nio.file.Paths.get(outDir, f"shard-$shard%05d.tar")
              tmp = java.nio.file.Paths.get(outDir, f".shard-$shard%05d.tar.$attempt%d.tmp")
              // reap temp files a killed/lost EARLIER attempt left behind —
              // they never rename, so nothing else cleans them. Only temps
              // that are BOTH from a lower attempt id (speculative twins
              // and retries launch later, so a live concurrent attempt is
              // never lower) AND cold by mtime (a zombie lower attempt
              // still writing keeps its mtime fresh) are deleted: unlinking
              // a live attempt's temp would make its later rename throw and
              // burn a failure toward spark.task.maxFailures (round-9
              // advice), instead of the benign lost-twin rename race.
              val staleMs = 60000L
              val now = System.currentTimeMillis()
              val stale = java.nio.file.Files.newDirectoryStream(
                java.nio.file.Paths.get(outDir), f".shard-$shard%05d.tar.*.tmp")
              try stale.forEach { p =>
                val otherAttempt = p.getFileName.toString
                  .stripSuffix(".tmp").split('.').lastOption
                  .flatMap(s => scala.util.Try(s.toLong).toOption)
                val cold = scala.util.Try(
                  java.nio.file.Files.getLastModifiedTime(p).toMillis < now - staleMs
                ).getOrElse(false)
                if (p != tmp && otherAttempt.exists(_ < attempt) && cold)
                  java.nio.file.Files.deleteIfExists(p)
              } finally stale.close()
              out = java.nio.file.Files.newOutputStream(tmp)
            }
            // fail loudly on null keys/payloads (getAs[Long] on a null
            // cell NPEs with no context; an entry can't be unnamed)
            require(!r.isNullAt(r.fieldIndex("k")),
              s"null $keyCol: every tar entry needs a key")
            require(!r.isNullAt(r.fieldIndex("t")),
              s"null $textCol for key ${r.getAs[Long]("k")}")
            val payload = r.getAs[String]("t")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            out.write(header(f"${r.getAs[Long]("k")}%08d.txt", payload.length.toLong))
            out.write(payload)
            val pad = (Block - payload.length % Block) % Block
            if (pad > 0) out.write(new Array[Byte](pad))
          }
          sealCurrent()
        } finally {
          if (out != null) { // failure path: drop the torn temp file
            out.close()
            java.nio.file.Files.deleteIfExists(tmp)
          }
        }
      }
    n
  }

  /** Parse every `*.tar` under `dir` back into (shard, entry, size,
    * payload) rows, verifying each ustar header checksum (fail-loud on
    * corruption). Distributed: Spark's binaryFile source assigns whole
    * archives to tasks — the WebDataset read pattern.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // directory load + glob filter (a bare "$dir/*.tar" glob throws at
    // listing time if it matches nothing — the directory always exists)
    spark.read.format("binaryFile").option("pathGlobFilter", "*.tar").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val ascii = java.nio.charset.StandardCharsets.US_ASCII
        val shard = "shard-(\\d+)\\.tar$".r.findFirstMatchIn(path)
          .map(_.group(1).toInt)
          .getOrElse(throw new IllegalArgumentException(s"not a shard tar: $path"))
        val entries = Iterator.unfold(0) { off =>
          if (off + Block > bytes.length) None
          else {
            val h = java.util.Arrays.copyOfRange(bytes, off, off + Block)
            if (h.forall(_ == 0)) None // end-of-archive marker
            else {
              val stored = new String(
                java.util.Arrays.copyOfRange(h, 148, 155), ascii).trim
              java.util.Arrays.fill(h, 148, 156, ' '.toByte)
              val computed = h.foldLeft(0L)((a, b) => a + (b & 0xff))
              require(java.lang.Long.parseLong(stored, 8) == computed,
                s"tar checksum mismatch in $path at offset $off")
              val nameEnd = h.indexOf(0.toByte)
              val name = new String(h, 0, if (nameEnd < 0) 100 else nameEnd, ascii)
              val size = java.lang.Long.parseLong(
                new String(java.util.Arrays.copyOfRange(h, 124, 135), ascii).trim, 8)
              // truncation guard: copyOfRange silently ZERO-PADS beyond
              // the source length — a truncated archive must fail loudly,
              // not round-trip a zero-padded payload tail
              require(off + Block + size <= bytes.length,
                s"truncated tar $path: entry at offset $off declares $size " +
                  s"bytes but archive ends at ${bytes.length}")
              val payload = java.util.Arrays.copyOfRange(
                bytes, off + Block, off + Block + size.toInt)
              val next = off + Block + ((size.toInt + Block - 1) / Block) * Block
              Some(((shard, name, size, payload), next))
            }
          }
        }
        entries.toSeq
      }
      .toDF("shard", "entry", "size", "payload")
  }
}
