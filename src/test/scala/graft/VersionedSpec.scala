package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.Versioned

/** Manifest-committed versioning: snapshot/append commits, time travel,
  * crash-orphan invisibility, and reference-counted vacuum.
  */
class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_versioned").resolve("t").toString

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select($"id").as[Long].collect().toSet

  test("publish/append commit monotonic versions; every version stays readable") {
    val path = freshTable()
    val v1 = Versioned.publish(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), path)
    val v2 = Versioned.append(Seq((3L, "c")).toDF("id", "s"), path)
    val v3 = Versioned.publish(Seq((9L, "z")).toDF("id", "s"), path)
    assert((v1, v2, v3) == (1, 2, 3))
    assert(Versioned.versions(spark, path) == Seq(1, 2, 3))
    assert(ids(Versioned.read(spark, path, Some(1))) == Set(1L, 2L))
    assert(ids(Versioned.read(spark, path, Some(2))) == Set(1L, 2L, 3L)) // append carried v1
    assert(ids(Versioned.read(spark, path, Some(3))) == Set(9L))         // snapshot replaced
    assert(ids(Versioned.read(spark, path)) == Set(9L))                  // latest default
  }

  test("uncommitted data directory is invisible to readers") {
    val path = freshTable()
    Versioned.publish(Seq((1L, "a")).toDF("id", "s"), path)
    // simulate a crashed writer: data files exist, no manifest
    Seq((99L, "junk")).toDF("id", "s")
      .write.parquet(new Path(path, "data/v00099").toString)
    assert(Versioned.versions(spark, path) == Seq(1))
    assert(ids(Versioned.read(spark, path)) == Set(1L))
  }

  test("vacuum drops old versions and orphans but keeps files shared via append") {
    val path = freshTable()
    Versioned.publish(Seq((1L, "a")).toDF("id", "s"), path) // v1
    Versioned.append(Seq((2L, "b")).toDF("id", "s"), path)  // v2 = v1 files + new
    Seq((99L, "junk")).toDF("id", "s")                       // orphan (no manifest)
      .write.parquet(new Path(path, "data/v00099").toString)
    Versioned.vacuum(spark, path, keepLast = 1)
    assert(Versioned.versions(spark, path) == Seq(2))
    // v2 still reads BOTH rows: its manifest references v1's data files,
    // so vacuum must not have deleted them
    assert(ids(Versioned.read(spark, path)) == Set(1L, 2L))
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(path, "data/v00099")), "orphan dir survived vacuum")
    intercept[java.io.IOException](Versioned.read(spark, path, Some(1)))
  }

  test("vacuum keeping all versions deletes nothing") {
    val path = freshTable()
    Versioned.publish(Seq((1L, "a")).toDF("id", "s"), path)
    Versioned.publish(Seq((2L, "b")).toDF("id", "s"), path)
    Versioned.vacuum(spark, path, keepLast = 5)
    assert(Versioned.versions(spark, path) == Seq(1, 2))
    assert(ids(Versioned.read(spark, path, Some(1))) == Set(1L))
  }

  test("reading an empty or missing version fails loudly") {
    val path = freshTable()
    intercept[java.io.IOException](Versioned.read(spark, path))
    Versioned.publish(Seq((1L, "a")).toDF("id", "s"), path)
    intercept[java.io.IOException](Versioned.read(spark, path, Some(7)))
  }

  test("changesBetween: append feeds only the delta, rewrite feeds delete+insert, no-op feeds nothing") {
    val path = freshTable()
    Versioned.publish(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), path)
    Versioned.append(Seq((3L, "c")).toDF("id", "s"), path)
    // append leg: ONLY the appended row, as insert — and only the new
    // files are scanned (the plan's read path lists exactly the v2 delta)
    val feed12 = Versioned.changesBetween(spark, path, 1, 2)
    assert(
      feed12.select($"id", $"_change_type").as[(Long, String)].collect().toSet ==
        Set((3L, "insert")))
    val scanned = feed12.queryExecution.executedPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.inputFiles.toSeq
    }.flatten
    assert(scanned.nonEmpty && scanned.forall(_.contains("data/v00002")),
      s"append feed scanned beyond the delta: $scanned")

    // rewrite leg: everything deleted, new snapshot inserted
    Versioned.publish(Seq((2L, "b"), (9L, "z")).toDF("id", "s"), path)
    val feed23 = Versioned.changesBetween(spark, path, 2, 3)
      .select($"id", $"_change_type").as[(Long, String)].collect().toSet
    assert(feed23 == Set((1L, "delete"), (2L, "delete"), (3L, "delete"),
      (2L, "insert"), (9L, "insert")))

    // identical manifests (self-diff span): empty with the table schema
    Versioned.append(spark.emptyDataset[(Long, String)].toDF("id", "s"), path)
    val feed34 = Versioned.changesBetween(spark, path, 3, 4)
    assert(feed34.count() == 0)
    assert(feed34.columns.toSeq == Seq("id", "s", "_change_type"))

    intercept[IllegalArgumentException](Versioned.changesBetween(spark, path, 2, 2))
  }

  test("rollback restores an old version as a new commit; history and vacuum stay sound") {
    val s = spark
    import s.implicits._
    val path = freshTable()
    Versioned.publish(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), path)
    Versioned.append(Seq((3L, "c")).toDF("id", "s"), path)
    assert(Versioned.rollback(spark, path, 1) == 3)
    // v3 content == v1 content; v2 still queryable
    assert(Versioned.read(spark, path, Some(3)).as[(Long, String)].collect().sorted.toSeq
      == Seq((1L, "a"), (2L, "b")))
    assert(Versioned.read(spark, path, Some(2)).count() == 3)
    // the rollback commit's change feed is exactly "delete the bad append"
    val feed = Versioned.changesBetween(spark, path, 2, 3)
    assert(feed.collect().map(r => (r.getLong(0), r.getString(2))).toSet == Set((3L, "delete")))
    // vacuuming to the latest version must keep v1's files (referenced by v3)
    Versioned.vacuum(spark, path, keepLast = 1)
    assert(Versioned.read(spark, path).as[(Long, String)].collect().sorted.toSeq
      == Seq((1L, "a"), (2L, "b")))
    intercept[IllegalArgumentException](Versioned.rollback(spark, path, 99))
  }
}
