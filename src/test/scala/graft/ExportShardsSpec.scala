package graft

import org.apache.spark.sql.functions._

import graft.sources.{ExportShards, Tables}

/** File-level contract of the shard export ([[ExportShards.write]]):
  * fixed shard-dir count, ONE data file per shard (the trainer-friendly
  * layout), lossless read-back, directory assignment equal to the
  * recomputed portable hash, and a manifest that accounts for every row.
  * The portable-assignment VALUES are oracle-gated by q_export_shards;
  * this spec covers what SQL can't see — the files.
  */
class ExportShardsSpec extends SparkSpec {
  import spark.implicits._

  test("shard export: one file per shard, lossless, assignment stable, manifest complete") {
    val docs = Tables(spark, sf).documents.select($"doc_id", $"n_chars")
    val total = docs.count()
    val n = 4
    val scratch = graft.queries.Scratch.dir("graft-shards")
    val out = scratch.resolve("docs").toString

    val manifest = ExportShards.write(docs, "doc_id", n, out)

    // layout: exactly n shard dirs, exactly one parquet data file in each
    val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard="))
    assert(dirs.length == n, s"expected $n shard dirs, got ${dirs.map(_.getName).toSeq}")
    for (d <- dirs) {
      val files = d.listFiles().filter(f => f.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: expected 1 data file, got ${files.length}")
    }

    // lossless + assignment matches the recomputed portable hash
    val back = spark.read.parquet(out)
    assert(back.count() == total)
    assert(back.filter(col("shard") =!= ExportShards.shardId(col("doc_id"), n)).count() == 0)
    assert(
      back.select("doc_id").except(docs.select("doc_id")).count() == 0 &&
        docs.select("doc_id").except(back.select("doc_id")).count() == 0)

    // manifest accounts for every row and matches the data dirs
    val m = spark.read.parquet(s"$out/_manifest")
    assert(m.agg(sum("n_rows")).head.getLong(0) == total)
    assert(m.count() == manifest.count())

    // rerun stability: a second export assigns every doc the same shard
    val again = docs.select($"doc_id", ExportShards.shardId($"doc_id", n).as("s2"))
    assert(back.join(again, "doc_id").filter(col("shard") =!= col("s2")).count() == 0)

    graft.queries.Scratch.purge(scratch)
  }
}
