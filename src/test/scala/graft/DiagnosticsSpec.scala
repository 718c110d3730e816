package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Observation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Diagnostics
import graft.streaming.{GraftApp, GraftSink}

/** In-flight metrics (`Dataset.observe`): quality gates aggregated during
  * the consuming job itself — no second scan — read back via Observation
  * (batch) and StreamingQueryProgress.observedMetrics (per micro-batch).
  */
class DiagnosticsSpec extends SparkSpec {

  test("batch observe aggregates metrics during the job, no extra pass") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a"), (2L, null), (3L, "c"))
      .toDF("id", "name")
    val obs = Observation("gate")
    val ms = Diagnostics.qualityMetrics(Seq("name"))
    val out = df.observe(obs, ms.head, ms.tail: _*)
    assert(out.count() === 3)
    val m = obs.get
    assert(m("n_rows") === 3L)
    assert(m("name_nulls") === 1L)
  }

  test("streaming observe surfaces metrics in every micro-batch's progress") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val in = MemoryStream[(Long, String)]
    val app = new GraftApp(s, "obs-app", Files.createTempDirectory("graft-obs").toString)
    app.agent(
      "audited",
      () => Diagnostics.observed(
        in.toDF().toDF("id", "name"),
        "gate",
        Diagnostics.qualityMetrics(Seq("name")): _*),
      GraftSink.Memory("obs_out"),
      outputMode = "append"
    )(identity)

    app.start("audited")
    in.addData((1L, "a"), (2L, null), (3L, "c"))
    app.processAllAvailable("audited")

    val gate = app.progress("audited")
      .flatMap(p => Option(p.observedMetrics).map(_.asScala))
      .flatMap(_.get("gate"))
    assert(gate.isDefined, "observed metrics 'gate' absent from the last progress")
    assert(gate.get.getAs[Long]("n_rows") === 3L)
    assert(gate.get.getAs[Long]("name_nulls") === 1L)
    app.stop("audited")
  }

  test("expectations: NULL rule results count as violations; uniqueness counts dup rows") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some(5.0), "a"),
      (2L, Some(-1.0), "b"), // violates positive
      (3L, None, "c"),       // NULL -> rule unknown -> counted as violation
      (3L, Some(2.0), "d")   // duplicate id
    ).toDF("id", "v", "tag")

    val report = Diagnostics.expectations(
      df,
      rowRules = Seq(
        "v_positive" -> ($"v" > 0),
        "tag_not_null" -> $"tag".isNotNull),
      uniqueRules = Seq("id_unique" -> Seq("id"))
    ).collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

    assert(report("v_positive") === ((2L, 4L, false)), "NULL must fail a row rule")
    assert(report("tag_not_null") === ((0L, 4L, true)))
    // both rows of the duplicated key count as violating rows
    assert(report("id_unique") === ((2L, 4L, false)))
  }

  test("kAnonymize: released quasi-id groups all have >= k members, payload untouched") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "en", "web"), (2L, "en", "web"), (3L, "en", "web"),
      (4L, "fr", "web"), (5L, "fr", "book"), (6L, "de", "book")
    ).toDF("id", "lang", "source")
    val out = Diagnostics.kAnonymize(df, Seq("lang", "source"), k = 3)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3)))
    // the en/web group of 3 survives; every other combination is masked
    assert(rows.filter(!_._4).map(_._1).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(rows.filter(_._4).forall(r => r._2 == "*" && r._3 == "*"))
    // k-anonymity holds on the release: every (lang, source) bucket >= 3
    val released = rows.groupBy(r => (r._2, r._3)).map(_._2.length)
    assert(released.forall(_ >= 3), s"release buckets: $released")
    assert(rows.map(_._1).sorted.toSeq == (1L to 6L), "ids must pass through")
  }
}
