package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import graft.sources.BloomWrite

/** Bloom-filter layout contract ([[BloomWrite]]):
  *   1. the written footer actually carries a bloom filter for the column;
  *   2. present keys always probe positive (no false negatives — the
  *      correctness half of the skip guarantee);
  *   3. absent keys overwhelmingly probe negative (the efficiency half:
  *      a reader skips a row group exactly when the probe is negative);
  *   4. a Spark filtered read over the bloom'd file is exact.
  */
class BloomLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("footer carries the bloom; probes split present/absent; reads stay exact") {
    val dir = Files.createTempDirectory("graft-bloom").resolve("t").toString
    // unsorted high-cardinality keys — the min/max-stats-useless case
    val keys = (0L until 20000L).map(i => (i * 2654435761L) % 1000003L).distinct
    // one part file: each file's bloom covers only its own rows, and the
    // probes below must target the file whose footer we open
    val df = keys.map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
    BloomWrite.write(df, dir, Seq("k"), ndv = keys.size.toLong)

    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .head
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(part.getAbsolutePath), new Configuration()))
    try {
      val block = reader.getRowGroups.asScala.head
      val col = block.getColumns.asScala.find(_.getPath.toDotString == "k").get
      assert(col.getBloomFilterOffset > 0, "no bloom filter offset recorded in the footer")
      val bloom = reader.getBloomFilterDataReader(block).readBloomFilter(col)
      assert(bloom != null, "bloom filter not readable from the footer")

      val sample = keys.take(500)
      assert(sample.forall(k => bloom.findHash(bloom.hash(k))),
        "present key probed negative — bloom false negatives break correctness")

      val absent = (1L to 500L).map(i => 2000003L + i) // all beyond the key domain
      val falsePos = absent.count(k => bloom.findHash(bloom.hash(k)))
      assert(falsePos <= 25, // 5% on a filter sized for 1% fpp — generous
        s"absent keys probed positive $falsePos/500 times; filter is not selective")
    } finally reader.close()

    // filtered read correctness over the bloom'd file
    val probe = keys(37)
    val got = spark.read.parquet(dir).filter($"k" === probe).as[(Long, String)].collect()
    assert(got.toList == List((probe, s"v$probe")))
    assert(spark.read.parquet(dir).filter($"k" === 999999999L).count() == 0L)
  }
}
