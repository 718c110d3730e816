package graft

import graft.operators.MediaCodec

/** Perceptual average-hash over the real PNG codec path
  * (operators/MediaCodec.scala `aHash64`).
  */
class MediaHashSpec extends SparkSpec {
  import spark.implicits._

  test("aHash of a patterned PNG equals the pattern bits at every resolution") {
    // ids 3, 53, 103 share class 3 (mod 50) at three different sizes
    val ids = Seq(3L, 53L, 103L)
    val recs = ids.map(id => graft.operators.Multimodal.MediaRecord(id, MediaCodec.patternPngFor(id, 50)))
    val hashes = MediaCodec.aHash64(spark.createDataset(recs)).collect().toMap
    val expected = MediaCodec.patternBits(3L)
    ids.foreach { id =>
      assert(hashes(id) == expected,
        s"id $id (${MediaCodec.imgWidth(id)}x${MediaCodec.imgHeight(id)}): " +
          s"hash ${hashes(id)} != pattern bits $expected")
    }
  }

  test("distinct pattern classes produce distinct hashes (50-class corpus)") {
    val recs = (0L until 50L).map(id =>
      graft.operators.Multimodal.MediaRecord(id, MediaCodec.patternPngFor(id, 50)))
    val hashes = MediaCodec.aHash64(spark.createDataset(recs)).collect().map(_._2)
    assert(hashes.distinct.length == 50, "pattern classes collided in aHash space")
  }
}
