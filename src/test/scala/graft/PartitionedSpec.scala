package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Partitioned

/** Partitioned-layout contract: directory-level partition pruning (the
  * planning-time data skipping that makes a one-day query on a 100 TB
  * table read one day), and dynamic partition overwrite (incremental
  * reload of one partition without touching the rest).
  */
class PartitionedSpec extends SparkSpec {

  test("filter on the partition column prunes directories at planning time") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("graft-part-prune").resolve("ev").toString
    val ev = s.read.parquet(s"$sf/events.parquet")
      .select($"event_id", $"event_type", $"value")
    Partitioned.write(ev, path, Seq("event_type"))

    val all = Partitioned.read(s, path)
    val one = all.filter($"event_type" === "click")

    val allFiles = Partitioned.filesRead(all)
    val oneFiles = Partitioned.filesRead(one)
    assert(allFiles >= 5, s"expected >=5 partition dirs with files, got $allFiles")
    assert(oneFiles < allFiles,
      s"pruned scan must read fewer files ($oneFiles vs $allFiles)")
    assert(Partitioned.partitionFilters(one).nonEmpty,
      "filter on the partition column must become a PartitionFilter, not a data filter")

    // Pruning must not change semantics: counts agree with a full scan.
    val expected = ev.filter($"event_type" === "click").count()
    assert(one.count() === expected)
  }

  test("compaction collapses a many-small-files layout without changing the data") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("graft-compact").resolve("t").toString
    val ev = s.read.parquet(s"$sf/events.parquet").select($"event_id", $"value")
    ev.repartition(32).write.parquet(path) // the streaming-ingest dribble
    val before = Partitioned.dataFileCount(s, path)
    assert(before >= 32, s"expected >=32 small files, got $before")
    val sumBefore = s.read.parquet(path).agg(org.apache.spark.sql.functions.sum($"event_id"))
      .head.getLong(0)

    Partitioned.compact(s, path, targetFiles = 2)

    assert(Partitioned.dataFileCount(s, path) === 2L)
    val back = s.read.parquet(path)
    assert(back.count() === ev.count())
    assert(back.agg(org.apache.spark.sql.functions.sum($"event_id")).head.getLong(0) === sumBefore)
  }

  test("compaction of a PARTITIONED layout preserves directories and pruning") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("graft-compact-part").resolve("t").toString
    val ev = s.read.parquet(s"$sf/events.parquet")
      .select($"event_id", $"event_type", $"value")
    // dribble: many files per partition directory
    ev.repartition(8).write.partitionBy("event_type").parquet(path)
    val before = Partitioned.dataFileCount(s, path)
    assert(before >= 20, s"expected a file dribble across partition dirs, got $before")

    Partitioned.compact(s, path, targetFiles = 5, partitionCols = Seq("event_type"))

    val after = Partitioned.dataFileCount(s, path)
    assert(after <= 5, s"compaction should collapse to ~1 file per partition, got $after")
    // layout survived: pruning still works and data is intact
    val one = Partitioned.read(s, path).filter($"event_type" === "click")
    assert(Partitioned.partitionFilters(one).nonEmpty, "pruning lost after compaction")
    assert(one.count() === ev.filter($"event_type" === "click").count())
  }

  test("partitionFilters sees through AQE wrapping (joins/aggregates over the scan)") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("graft-part-aqe").resolve("ev").toString
    val ev = s.read.parquet(s"$sf/events.parquet")
      .select($"event_id", $"event_type", $"value")
    Partitioned.write(ev, path, Seq("event_type"))

    // An aggregate forces AdaptiveSparkPlanExec to wrap the scan; the
    // pruning report must still find the PartitionFilters inside it.
    val agg = Partitioned.read(s, path)
      .filter($"event_type" === "click")
      .groupBy($"event_type").agg(sum($"value"))
    agg.collect() // materialize so AQE finalizes the plan
    assert(Partitioned.partitionFilters(agg).nonEmpty,
      "partitionFilters must unwrap AdaptiveSparkPlanExec like filesRead does")
  }

  test("dim-attribute filter triggers DYNAMIC partition pruning on the fact scan") {
    val s = spark
    // The registered q_source_partitioned_dpp shape: fact partitioned by
    // day, dim filtered on day_kind (a stored attribute — no static
    // predicate on the join key exists for the optimizer to propagate).
    // The fact scan must carry a runtime DynamicPruningExpression and
    // read strictly fewer files than the full layout.
    val (_, joined) = graft.queries.SourceQueries.dppJoin(s, sf)
    joined.collect() // finalize AQE so the pruned file count is real
    val filters = Partitioned.partitionFilters(joined)
    assert(filters.exists(_.toLowerCase.contains("dynamicpruning")),
      s"fact scan must be pruned by a runtime subquery, filters: $filters")
    val report = Partitioned.dynamicPruningReport(joined)
    assert(report.nonEmpty, "no scan reported dynamic-pruning metrics")
    report.foreach { case (read, static) =>
      assert(read < static,
        s"dynamic pruning must skip day directories at runtime ($read vs $static)")
    }
  }

  test("compact recovers a crashed swap: backup restored, stranded side dir dropped") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("graft-compact-crash").resolve("t").toString
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v")
    df.repartition(4).write.parquet(path)
    val conf = s.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)

    // Simulate death between rename(path -> backup) and rename(tmp -> path):
    // the table directory is GONE, the old data sits at __backup, and a
    // half-written compacted copy is stranded at __compacting.
    assert(fs.rename(p, new org.apache.hadoop.fs.Path(path + "__backup")))
    df.limit(1).write.parquet(path + "__compacting")
    assert(!fs.exists(p), "precondition: table lost mid-swap")

    Partitioned.compact(s, path, targetFiles = 1)

    val back = s.read.parquet(path)
    assert(back.count() === 3L, "recovery must restore the FULL pre-crash table")
    assert(back.agg(sum($"v")).head.getDouble(0) === 60.0)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__backup")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__compacting")))
  }

  test("dynamic partition overwrite replaces only the partitions in the incoming frame") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("graft-part-dyn").resolve("t").toString
    val v1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "b", 30.0))
      .toDF("id", "k", "v")
    Partitioned.write(v1, path, Seq("k"))

    // Reload ONLY partition k=b with new contents; k=a must survive.
    val v2 = Seq((9L, "b", 99.0)).toDF("id", "k", "v")
    Partitioned.overwritePartitions(v2, path, Seq("k"))

    val back = Partitioned.read(s, path)
      .select($"id", $"k", $"v").orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toList
    assert(back === List((1L, "a", 10.0), (9L, "b", 99.0)),
      s"k=a untouched, k=b replaced; got $back")
  }
}
