package graft

import graft.sources.{Tables, TarShards}
import org.apache.spark.sql.functions._

/** WebDataset tar shard export: the archive bytes themselves (not just
  * the parsed view) must be deterministic, the round trip lossless, and
  * header corruption loud.
  */
class TarShardsSpec extends SparkSpec {
  import spark.implicits._

  private def writeTo(dir: java.nio.file.Path): Unit =
    TarShards.write(Tables(spark, sf).documents, "doc_id", "text",
      n = 4, outDir = dir.toString, seed = 3L)

  test("round trip preserves membership, names, sizes, and content") {
    val dir = java.nio.file.Files.createTempDirectory("tar_rt")
    try {
      writeTo(dir)
      val back = TarShards.read(spark, dir.toString)
        .select($"entry", $"size", md5($"payload").as("h"))
        .as[(String, Long, String)].collect().toSet
      val expected = Tables(spark, sf).documents
        .select(
          concat(lpad($"doc_id".cast("string"), 8, "0"), lit(".txt")),
          octet_length(encode($"text", "UTF-8")).cast("long"),
          md5(encode($"text", "UTF-8")))
        .as[(String, Long, String)].collect().toSet
      assert(back == expected)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }

  test("shard archives are byte-identical across reruns and input partitionings") {
    val d1 = java.nio.file.Files.createTempDirectory("tar_a")
    val d2 = java.nio.file.Files.createTempDirectory("tar_b")
    try {
      writeTo(d1)
      TarShards.write(Tables(spark, sf).documents.repartition(7), "doc_id", "text",
        n = 4, outDir = d2.toString, seed = 3L)
      val files1 = d1.toFile.listFiles().map(_.getName).sorted
      val files2 = d2.toFile.listFiles().map(_.getName).sorted
      assert(files1.nonEmpty && files1.sameElements(files2))
      files1.foreach { f =>
        val a = java.nio.file.Files.readAllBytes(d1.resolve(f))
        val b = java.nio.file.Files.readAllBytes(d2.resolve(f))
        assert(java.util.Arrays.equals(a, b), s"$f differs between runs")
      }
    } finally {
      Seq(d1, d2).foreach { d =>
        d.toFile.listFiles().foreach(_.delete()); d.toFile.delete()
      }
    }
  }

  test("reaper deletes only cold lower-attempt temps; live twins survive") {
    // round-9 advice: unlinking a LIVE concurrent attempt's temp makes
    // its rename throw and burns a task failure. The reaper must delete
    // a cold (old-mtime) LOWER-attempt leftover, but spare (a) a
    // higher-attempt temp regardless of age and (b) any fresh temp.
    val dir = java.nio.file.Files.createTempDirectory("tar_reap")
    try {
      val deadCold = dir.resolve(".shard-00000.tar.0.tmp")
      val liveTwin = dir.resolve(".shard-00000.tar.999999999999.tmp")
      java.nio.file.Files.write(deadCold, Array[Byte](1))
      java.nio.file.Files.write(liveTwin, Array[Byte](2))
      java.nio.file.Files.setLastModifiedTime(deadCold,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 300000))
      // liveTwin keeps its fresh mtime AND a higher attempt id
      writeTo(dir)
      assert(!java.nio.file.Files.exists(deadCold), "cold lower-attempt temp not reaped")
      assert(java.nio.file.Files.exists(liveTwin), "live higher-attempt twin was unlinked")
      assert(java.nio.file.Files.exists(dir.resolve("shard-00000.tar")))
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }

  test("a corrupted header byte fails the checksum loudly") {
    val dir = java.nio.file.Files.createTempDirectory("tar_c")
    try {
      writeTo(dir)
      val f = dir.toFile.listFiles().minBy(_.getName).toPath
      val bytes = java.nio.file.Files.readAllBytes(f)
      bytes(0) = (bytes(0) + 1).toByte // flip a name byte in the first header
      java.nio.file.Files.write(f, bytes)
      val e = intercept[org.apache.spark.SparkException] {
        TarShards.read(spark, dir.toString).count()
      }
      assert(e.getMessage.contains("checksum") ||
        Option(e.getCause).exists(_.getMessage.contains("checksum")))
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }
}
