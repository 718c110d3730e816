package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming TEMPORAL enrichment: compose the SCD2 history maintained by
  * [[Materialize.scd2Writer]] with the broadcast as-of join — each
  * micro-batch of lookups is answered with the state that was current AT
  * the lookup's own event time, against the history as of the previous
  * batches. The streaming form of q_join_temporal: the plan dimension
  * (user → plan changelog) and the lookup stream are decoupled; late
  * lookups about EARLIER times still get the historically-correct
  * version, which a latest-only snapshot (snapshotWriter) cannot answer.
  */
class StreamTemporalSpec extends SparkSpec {

  test("lookups are answered with the version current at their event time") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val histDir = Files.createTempDirectory("graft-temporal").resolve("hist").toString

    // maintain the SCD2 history from a changelog stream
    val changes = MemoryStream[(Long, Long, Long, String)] // (user, t, seq, plan)
    val histApp = new GraftApp(s, "hist-app", Files.createTempDirectory("graft-temporal-ck1").toString)
    histApp.agent(
      "hist",
      () => changes.toDF().toDF("user_id", "t", "seq", "plan"),
      GraftSink.ForeachBatch(Materialize.scd2Writer(histDir, "user_id", "plan", Seq("t", "seq"))),
      outputMode = "append"
    )(identity)

    // answer lookups against the history: backward as-of on version starts
    val lookups = MemoryStream[(Long, Long)] // (user, at_time)
    val answers = mutable.ArrayBuffer.empty[(Long, Long, String)]
    val lookApp = new GraftApp(s, "look-app", Files.createTempDirectory("graft-temporal-ck2").toString)
    lookApp.agent(
      "lookups",
      () => lookups.toDF().toDF("user_id", "vt"),
      GraftSink.ForeachBatch((batch, _) => {
        val hist = s.read.parquet(histDir)
          .select(col("user_id"), col("valid_from").as("vt"), col("state"))
        val enriched = graft.operators.Joins.asOfJoinBroadcast(
          batch, hist, key = "user_id", tsCol = "vt", payload = Seq("state"))
        answers.synchronized {
          answers ++= enriched.collect().map(r =>
            (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getString(2)))
        }
      }),
      outputMode = "append"
    )(identity)

    // history: user 1 on "free" from t=10, "pro" from t=50
    histApp.start("hist")
    changes.addData((1L, 10L, 1L, "free"), (1L, 50L, 2L, "pro"))
    histApp.processAllAvailable("hist")

    lookApp.start("lookups")
    lookups.addData((1L, 30L), (1L, 60L), (1L, 5L))
    lookApp.processAllAvailable("lookups")

    // the plan changes again; an old-time lookup must STILL see history
    changes.addData((1L, 80L, 3L, "enterprise"))
    histApp.processAllAvailable("hist")
    lookups.addData((1L, 70L), (1L, 90L), (1L, 20L))
    lookApp.processAllAvailable("lookups")

    histApp.stop("hist"); lookApp.stop("lookups")

    val got = answers.synchronized(answers.toSet)
    assert(got === Set(
      (1L, 30L, "free"),       // mid-first-version
      (1L, 60L, "pro"),        // mid-second-version
      (1L, 5L, null),          // before any version: no state yet
      (1L, 70L, "pro"),        // historically correct DESPITE later change
      (1L, 90L, "enterprise"), // current version
      (1L, 20L, "free")        // late lookup about an old time
    ), s"temporal answers wrong: $got")
  }
}
