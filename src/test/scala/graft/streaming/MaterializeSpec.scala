package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Materialized snapshot maintenance: a changelog stream folds into a
  * queryable parquet KV table across micro-batches (CTable visible to
  * batch readers), and replaying a batch changes nothing.
  */
class MaterializeSpec extends SparkSpec {

  test("changelog stream folds into a parquet snapshot; replay is idempotent") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val snap = Files.createTempDirectory("graft-mat").resolve("state").toString
    val in = MemoryStream[(String, Double, Long, Boolean)]
    val app = new GraftApp(s, "mat-app", Files.createTempDirectory("graft-mat-ck").toString)
    app.agent(
      "materializer",
      () => in.toDF(),
      GraftSink.ForeachBatch(
        Materialize.snapshotWriter(snap, keys = Seq("k"), seqCol = "seq", deleteCol = "del")),
      outputMode = "append"
    )(_.toDF("k", "v", "seq", "del"))

    app.start("materializer")
    in.addData(("a", 1.0, 1L, false), ("b", 2.0, 2L, false))
    app.processAllAvailable("materializer")

    def state(): Map[String, Double] =
      s.read.parquet(snap).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(state() === Map("a" -> 1.0, "b" -> 2.0))

    // batch 2: update a, tombstone b, insert c — and within-batch churn on
    // c (seq decides the winner)
    in.addData(("a", 5.0, 3L, false), ("b", 0.0, 4L, true),
      ("c", 9.0, 6L, false), ("c", 7.0, 5L, false))
    app.processAllAvailable("materializer")
    assert(state() === Map("a" -> 5.0, "c" -> 9.0))
    app.stop("materializer")

    // at-least-once replay: re-applying batch 2's rows must change nothing
    val replay = Seq(("a", 5.0, 3L, false), ("b", 0.0, 4L, true),
      ("c", 9.0, 6L, false), ("c", 7.0, 5L, false)).toDF("k", "v", "seq", "del")
    Materialize.snapshotWriter(snap, Seq("k"), "seq", "del")(replay, 99L)
    assert(state() === Map("a" -> 5.0, "c" -> 9.0))

    // another agent (or any batch query) reads the snapshot directly —
    // the CTable visibility the reference gets from compacted topics
    assert(s.read.parquet(snap).count() === 2)
  }

  test("a crash mid-swap does not lose prior keyed state (backup restored before merge)") {
    val s = spark
    import s.implicits._

    val snap = Files.createTempDirectory("graft-mat-crash").resolve("state").toString
    def write(rows: Seq[(String, Double, Long, Boolean)], batch: Long): Unit =
      Materialize.snapshotWriter(snap, Seq("k"), "seq", "del")(
        rows.toDF("k", "v", "seq", "del"), batch)
    def state(): Map[String, Double] =
      s.read.parquet(snap).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    write(Seq(("a", 1.0, 1L, false), ("b", 2.0, 2L, false)), 0L)
    assert(state() === Map("a" -> 1.0, "b" -> 2.0))

    // Simulate the worst crash point: the old snapshot was renamed away
    // (to __backup) but the merged copy never landed — plus a stranded
    // partial __merging dir. The snapshot path does NOT exist now; the
    // old code's !fs.exists branch would rebuild from only the next
    // batch, silently dropping key b.
    val p = new org.apache.hadoop.fs.Path(snap)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(fs.rename(p, new org.apache.hadoop.fs.Path(snap + "__backup")))
    Seq(("junk", 0.0, 0L, false)).toDF("k", "v", "seq", "del")
      .write.parquet(snap + "__merging")
    assert(!fs.exists(p), "precondition: snapshot lost mid-swap")

    // the uncommitted batch is redelivered (at-least-once)
    write(Seq(("a", 5.0, 3L, false)), 1L)
    assert(state() === Map("a" -> 5.0, "b" -> 2.0),
      "prior state must survive a mid-swap crash; b was silently dropped before the fix")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(snap + "__backup")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(snap + "__merging")))
  }

  test("scd2Writer maintains version history incrementally; replay is a no-op") {
    val s = spark
    import s.implicits._

    val hist = Files.createTempDirectory("graft-scd2").resolve("history").toString
    def write(rows: Seq[(Long, Long, Long, String)], batch: Long): Unit =
      Materialize.scd2Writer(hist, "k", "attr", Seq("t", "seq"))(
        rows.toDF("k", "t", "seq", "attr"), batch)
    def state(): Set[(Long, String, Long, Option[Long], Boolean)] =
      s.read.parquet(hist).collect().map(r => (
        r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4))).toSet

    // batch 1: k1 holds X (with an in-batch duplicate run), then Y
    write(Seq((1L, 10L, 1L, "X"), (1L, 20L, 2L, "X"), (1L, 30L, 3L, "Y")), 0L)
    assert(state() === Set(
      (1L, "X", 10L, Some(30L), false),
      (1L, "Y", 30L, None, true)))

    // batch 2: k1 re-reports Y (continuation — must NOT split the run),
    // then moves to Z; k2 appears for the first time
    val batch2 = Seq((1L, 40L, 4L, "Y"), (1L, 50L, 5L, "Z"), (2L, 45L, 6L, "W"))
    write(batch2, 1L)
    val expected = Set(
      (1L, "X", 10L, Some(30L), false),
      (1L, "Y", 30L, Some(50L), false),
      (1L, "Z", 50L, None, true),
      (2L, "W", 45L, None, true))
    assert(state() === expected)

    // at-least-once: the same batch redelivered changes nothing
    write(batch2, 1L)
    assert(state() === expected, "replayed batch must be absorbed")

    // a straggler older than the open version is ignored (watermark analog)
    write(Seq((1L, 35L, 7L, "Q")), 2L)
    assert(state() === expected, "pre-open-version straggler must not rewrite history")

    // a NULL attribute is a real state for a NEW key (no spurious collapse)
    write(Seq((3L, 60L, 8L, null)), 3L)
    assert(state().contains((3L, null, 60L, None, true)))
  }
}
