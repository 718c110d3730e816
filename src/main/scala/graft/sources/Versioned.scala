package graft.sources

import java.io.IOException
import java.nio.charset.StandardCharsets

import scala.util.Using

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-committed table versioning: every write produces an immutable
  * VERSION, readers pick any version (time travel), and publication is a
  * single-file atomic rename — the lake-format commit protocol in
  * miniature, for the corpus-versioning workflow
  * ([[graft.operators.Diagnostics.diff]] compares two of these versions;
  * a training run pins one and stays reproducible while ingest keeps
  * appending).
  *
  * Layout:
  * {{{
  *   path/data/v00001/part-*.parquet   // version-private data directories
  *   path/_manifests/v00001.list      // newline-separated relative files
  * }}}
  *
  * Commit protocol: data files are written FIRST (invisible — readers only
  * ever list files from manifests), then the manifest is written to a
  * `.tmp` sibling and renamed into place. Single-file rename is atomic on
  * HDFS-like filesystems, so a version either exists completely or not at
  * all; a crash leaves at worst an orphan data directory that [[vacuum]]
  * collects. Contrast [[Swap]], which maintains ONE live directory —
  * here every historical version stays readable until vacuumed.
  *
  * [[append]] writes only the new rows' files and lists the previous
  * version's files PLUS the new ones — incremental ingest never rewrites
  * history (file reuse across manifests is why vacuum must compute the
  * referenced set before deleting anything).
  *
  * Single-writer by design, like the reference's one-owner topics
  * (callysto/src/kafka/ctopic.rs:36-119 — partition ownership, not
  * multi-writer commit arbitration). Concurrent writers would need a
  * lock service or conditional rename; out of scope here.
  *
  * Scale notes: a manifest is O(files) text — kilobytes for thousands of
  * files; reads pass the exact file list to the parquet source so
  * planning never LISTs the data tree (the classic object-store listing
  * tax at 100 TB); data directories are normal parquet, so column
  * pruning/pushdown are unchanged.
  */
object Versioned {

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(path: String) = new Path(path, "_manifests")

  private def manifestPath(path: String, v: Int) =
    new Path(manifestDir(path), f"v$v%05d.list")

  private val ManifestName = """v(\d{5})\.list""".r

  /** All committed versions, ascending (empty for a fresh path). */
  def versions(spark: SparkSession, path: String): Seq[Int] = {
    val dir = manifestDir(path)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) Seq.empty
    else
      fs.listStatus(dir)
        .iterator
        .map(_.getPath.getName)
        .collect { case ManifestName(n) => n.toInt }
        .toSeq
        .sorted
  }

  def latestVersion(spark: SparkSession, path: String): Option[Int] =
    versions(spark, path).lastOption

  private def readManifest(spark: SparkSession, path: String, v: Int): Seq[String] = {
    val mp = manifestPath(path, v)
    val fs = fsOf(spark, mp)
    if (!fs.exists(mp)) throw new IOException(s"version $v not found under $path")
    Using.resource(fs.open(mp)) { in =>
      new String(in.readAllBytes(), StandardCharsets.UTF_8)
        .split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
    }
  }

  private def writeManifest(spark: SparkSession, path: String, v: Int, files: Seq[String]): Unit = {
    val mp = manifestPath(path, v)
    val fs = fsOf(spark, mp)
    fs.mkdirs(mp.getParent)
    val tmp = new Path(mp.getParent, s".${mp.getName}.tmp")
    Using.resource(fs.create(tmp, true)) { out =>
      out.write(files.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
    if (fs.exists(mp) || !fs.rename(tmp, mp))
      throw new IOException(s"version $v already committed or rename failed: $mp")
  }

  /** Write `df` as version-private data files; return their RELATIVE paths. */
  private def writeData(df: DataFrame, path: String, v: Int): Seq[String] = {
    val rel = f"data/v$v%05d"
    val dataDir = new Path(path, rel)
    df.write.mode("overwrite").parquet(dataDir.toString)
    val fs = fsOf(df.sparkSession, dataDir)
    fs.listStatus(dataDir)
      .iterator
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
      .map(n => s"$rel/$n")
      .toSeq
      .sorted
  }

  /** Commit `df` as a full-snapshot version; returns the new version. */
  def publish(df: DataFrame, path: String): Int = {
    val spark = df.sparkSession
    val v = latestVersion(spark, path).getOrElse(0) + 1
    writeManifest(spark, path, v, writeData(df, path, v))
    v
  }

  /** Commit `df` as an APPEND version: previous files stay referenced,
    * only the new rows are written. Returns the new version.
    */
  def append(df: DataFrame, path: String): Int = {
    val spark = df.sparkSession
    val prev = latestVersion(spark, path)
    val v = prev.getOrElse(0) + 1
    val carried = prev.map(readManifest(spark, path, _)).getOrElse(Seq.empty)
    writeManifest(spark, path, v, carried ++ writeData(df, path, v))
    v
  }

  /** Restore the table to the state of version `toV` by committing a NEW
    * version whose manifest is a copy of `toV`'s — rollback as a forward
    * commit, the Delta RESTORE shape: history stays intact (the bad
    * versions remain queryable for forensics), no data file is copied or
    * moved (manifests are KB-sized file lists), and ref-counted vacuum
    * keeps the restored files live. Returns the new version number.
    */
  def rollback(spark: SparkSession, path: String, toV: Int): Int = {
    val latest = latestVersion(spark, path).getOrElse(
      throw new IOException(s"no committed versions under $path"))
    require(toV >= 1 && toV <= latest, s"cannot roll back to v$toV (latest is v$latest)")
    val v = latest + 1
    writeManifest(spark, path, v, readManifest(spark, path, toV))
    v
  }

  /** Read a version (default: latest). The exact manifest file list goes
    * to the reader — no directory listing of the data tree.
    */
  def read(spark: SparkSession, path: String, version: Option[Int] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, path)).getOrElse(
      throw new IOException(s"no committed versions under $path"))
    val files = readManifest(spark, path, v).map(f => new Path(path, f).toString)
    spark.read.parquet(files: _*)
  }

  /** File-granular change feed between two committed versions (the
    * Delta-CDF-shaped read): rows in files the `to` manifest added are
    * emitted as `insert`, rows in files it dropped as `delete`, under a
    * `_change_type` column. Because [[append]] carries prior files
    * forward by reference, an append version's change feed reads ONLY
    * the new files — the incremental-consumer contract: cost scales with
    * the delta, never the table. A [[publish]] rewrite shows up as
    * full-table delete + full-snapshot insert, which is exactly what a
    * downstream sync must apply when lineage was broken by a rewrite.
    *
    * File-set diff on manifest STRINGS (driver-side, KBs); no data file
    * is opened for the diff itself.
    */
  def changesBetween(spark: SparkSession, path: String, fromV: Int, toV: Int): DataFrame = {
    require(fromV < toV, s"need fromV < toV, got $fromV >= $toV")
    val from = readManifest(spark, path, fromV).toSet
    val to = readManifest(spark, path, toV).toSet
    def side(files: Seq[String], kind: String): Option[DataFrame] =
      if (files.isEmpty) None
      else
        Some(
          spark.read
            .parquet(files.map(f => new Path(path, f).toString): _*)
            .withColumn("_change_type", org.apache.spark.sql.functions.lit(kind)))
    val parts =
      side((to -- from).toSeq.sorted, "insert").toSeq ++
        side((from -- to).toSeq.sorted, "delete").toSeq
    parts match {
      case Seq() =>
        // identical manifests: empty frame, but with the table's schema
        read(spark, path, Some(toV))
          .withColumn("_change_type", org.apache.spark.sql.functions.lit("insert"))
          .limit(0)
      case seq => seq.reduce(_ unionAll _)
    }
  }

  /** Drop all but the last `keepLast` versions, then delete every data
    * file referenced by NO surviving manifest (incl. orphans from crashed
    * writes). Referenced-set first, delete second — files shared across
    * manifests via [[append]] survive as long as any survivor lists them.
    */
  def vacuum(spark: SparkSession, path: String, keepLast: Int): Unit = {
    require(keepLast >= 1, "must keep at least one version")
    val all = versions(spark, path)
    val (drop, keep) = all.splitAt((all.size - keepLast).max(0))
    val fs = fsOf(spark, new Path(path))
    drop.foreach(v => fs.delete(manifestPath(path, v), false))
    val referenced = keep.flatMap(readManifest(spark, path, _)).toSet
    val dataRoot = new Path(path, "data")
    if (fs.exists(dataRoot)) {
      fs.listStatus(dataRoot).foreach { dirStatus =>
        val dirName = dirStatus.getPath.getName
        fs.listStatus(dirStatus.getPath).foreach { f =>
          // only data files: checksum/_SUCCESS markers ride along with
          // their directory and die with it, never individually
          if (f.getPath.getName.endsWith(".parquet") &&
            !referenced.contains(s"data/$dirName/${f.getPath.getName}"))
            fs.delete(f.getPath, false)
        }
        if (!fs.listStatus(dirStatus.getPath).exists(_.getPath.getName.endsWith(".parquet")))
          fs.delete(dirStatus.getPath, true)
      }
    }
  }
}
