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

  test("cross-FORMAT duplicates collapse: a JPEG re-save hashes like its PNG original") {
    // ids 0..9 as PNG, ids 100..109 as JPEG — same 10 pattern classes at
    // different resolutions THROUGH DIFFERENT LOSSY/LOSSLESS CODECS.
    // aHash must group each class's PNG with its JPEG re-encode.
    val classes = 10
    val recs =
      (0L until 10L).map(id => graft.operators.Multimodal.MediaRecord(
        id, MediaCodec.patternImageFor(id, classes, "png"))) ++
      (100L until 110L).map(id => graft.operators.Multimodal.MediaRecord(
        id, MediaCodec.patternImageFor(id, classes, "jpg")))
    val hashed = MediaCodec.aHash64(spark.createDataset(recs)).collect().toMap
    (0L until 10L).foreach { id =>
      val png = hashed(id)
      val jpg = hashed(id + 100) // same class: (id+100) % 10 == id % 10
      assert(png === jpg,
        s"class ${id % classes}: PNG hash $png != JPEG hash $jpg — lossy re-encode escaped dedup")
    }
    // and the 10 classes stay distinct across the mixed-format corpus
    assert(hashed.values.toSeq.distinct.length === classes)
  }

  test("four-codec collapse: PNG, JPEG, GIF and BMP re-saves of one image share a hash") {
    // The full JDK-shipped codec matrix: truecolor lossless (png),
    // lossy DCT (jpg), palette-indexed (gif — the encoder quantizes to a
    // color table), and raw bitmap (bmp). A crawl corpus carries all
    // four; perceptual dedup must see through every container.
    val classes = 10
    val formats = Seq("png", "jpg", "gif", "bmp")
    val recs = formats.zipWithIndex.flatMap { case (fmt, f) =>
      (0L until 10L).map(id => graft.operators.Multimodal.MediaRecord(
        f * 1000L + id, MediaCodec.patternImageFor(id, classes, fmt)))
    }
    val hashed = MediaCodec.aHash64(spark.createDataset(recs)).collect().toMap
    (0L until 10L).foreach { id =>
      val perFormat = formats.indices.map(f => hashed(f * 1000L + id)).distinct
      assert(perFormat.length == 1,
        s"class $id: formats hash apart (${formats.zip(formats.indices.map(f => hashed(f * 1000L + id)))})")
    }
    assert(hashed.values.toSeq.distinct.length === classes,
      "classes collided across the four-codec corpus")
  }

  test("MJPEG-in-AVI: frame walk decodes, and frames hash like still images of the same pattern") {
    // three videos at three resolutions; the RIFF walker must return
    // exactly the declared frames with true JPEG-decoded dimensions
    val ids = Seq(7L, 101L, 250L)
    val recs = ids.map(id => graft.operators.Multimodal.MediaRecord(id, MediaCodec.aviFor(id)))
    val frames = MediaCodec.decodeAviFrames(spark.createDataset(recs))
      .collect().groupBy(_.doc_id)
    ids.foreach { id =>
      val fs = frames(id).sortBy(_.frame_idx)
      assert(fs.length == MediaCodec.aviFrameCount(id),
        s"video $id: walked ${fs.length} frames, header declares ${MediaCodec.aviFrameCount(id)}")
      assert(fs.forall(_.n_frames_declared == MediaCodec.aviFrameCount(id)))
      assert(fs.forall(f => f.width == MediaCodec.aviWidth(id) && f.height == MediaCodec.aviHeight(id)),
        s"video $id: decoded dims disagree with the fixture formula")
      // the lossy in-container JPEG hashes EXACTLY to the pattern bits —
      // the same invariant the still-image codecs satisfy — so a video
      // frame dedups against a PNG still of the same picture
      fs.foreach { f =>
        assert(f.ahash == MediaCodec.patternBits((f.frame_idx % MediaCodec.AviFrameClasses).toLong),
          s"video $id frame ${f.frame_idx}: hash escaped the pattern class")
      }
      // within-video duplicate structure: frames 3+ repeat classes 0..2
      val byClass = fs.groupBy(_.frame_idx % MediaCodec.AviFrameClasses)
      byClass.foreach { case (_, g) => assert(g.map(_.ahash).distinct.length == 1) }
      assert(fs.map(_.ahash).distinct.length == MediaCodec.AviFrameClasses)
    }
    // cross-container: a PNG STILL of pattern class 0 collapses with every
    // video's class-0 frames (imgWidth sizes differ from aviWidth sizes)
    val still = MediaCodec.aHash64(spark.createDataset(Seq(
      graft.operators.Multimodal.MediaRecord(0L, MediaCodec.patternPngFor(0L, 50))))).collect()(0)._2
    assert(still == MediaCodec.patternBits(0L))
  }

  test("JPEG aHash equals the pattern bits across the ENTIRE AVI resolution grid") {
    // q_multimodal_video_dedup's oracle predicts clusters in closed form,
    // which requires every frame class's JPEG encode to hash to its
    // pattern bits at EVERY resolution aviFor can emit (aviWidth 64..111
    // × aviHeight 64..111). Exhaustive driver-side sweep (3 classes ×
    // 2,304 resolutions of ≤111px images) so a future JDK JPEG encoder
    // drift fails HERE, localized to the exact (class, w, h) cell, not as
    // a confusing corpus hash mismatch (round-11 ADVICE).
    import java.io.ByteArrayInputStream
    import javax.imageio.ImageIO
    for (c <- 0 until MediaCodec.AviFrameClasses) {
      val bits = MediaCodec.patternBits(c.toLong)
      for (w <- 64 to 111; h <- 64 to 111) {
        val got = MediaCodec.aHashOf(ImageIO.read(new ByteArrayInputStream(
          MediaCodec.patternImageBytes(bits, w, h, "jpg"))))
        assert(got == bits, s"class $c escaped its pattern bits at ${w}x$h")
      }
    }
  }
}
