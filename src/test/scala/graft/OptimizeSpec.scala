package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import org.apache.spark.sql.functions._

import graft.sources.Optimize

/** OPTIMIZE rewrite contract ([[Optimize.rewrite]]): controlled file
  * count, lossless content, multi-dimensional pruning from the z-order
  * clustering, and blooms present for the un-clustered point-lookup key —
  * all measured on the written files, not asserted from theory.
  */
class OptimizeSpec extends SparkSpec {
  import spark.implicits._

  test("rewrite: file count, losslessness, worst-dim pruning, blooms") {
    val s = spark
    val nFiles = 16
    val ev = graft.sources.Tables(s, sf).events
      .select($"event_id", ($"user_id" % 1024).as("u"),
        dayofmonth(graft.streaming.StreamOps.tsFromNanos($"ts")).as("day"), $"value")
    val path = Files.createTempDirectory("graft-optimize").resolve("t").toString

    Optimize.rewrite(ev, path, zorderCols = Seq("u", "day"), bits = 10,
      nFiles = nFiles, bloomCols = Seq("event_id"), bloomNdv = 100000L)

    val out = s.read.parquet(path)
    // file count controlled (range partitioner may merge empty tails)
    assert(out.inputFiles.length <= nFiles && out.inputFiles.length >= nFiles / 2,
      s"expected ~$nFiles files, got ${out.inputFiles.length}")
    // content lossless (schema minus layout artifacts is unchanged)
    assert(out.columns.sorted.toSeq == ev.columns.sorted.toSeq)
    val (c0, s0) = (ev.count(), ev.agg(sum($"event_id")).head.getLong(0))
    assert(out.count() == c0 && out.agg(sum($"event_id")).head.getLong(0) == s0)

    // worst-dimension pruning: an eighth-width box on each z-dimension
    // must skip files on BOTH dims (the multi-dim clustering contract)
    def touched(dim: String, lo: Long, hi: Long): Int =
      out.inputFiles.count { f =>
        val r = s.read.parquet(f)
          .agg(min(col(dim)).cast("long"), max(col(dim)).cast("long")).head
        r.getLong(0) <= hi && r.getLong(1) >= lo
      }
    val n = out.inputFiles.length
    assert(touched("u", 256, 383) < n, "u-range filter prunes nothing")
    assert(touched("day", 10, 13) < n, "day-range filter prunes nothing")

    // every file's footer carries the event_id bloom
    out.inputFiles.foreach { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f), new Configuration()))
      try {
        val block = reader.getRowGroups.asScala.head
        val col = block.getColumns.asScala.find(_.getPath.toDotString == "event_id").get
        assert(col.getBloomFilterOffset > 0, s"no bloom in $f")
      } finally reader.close()
    }
  }
}
