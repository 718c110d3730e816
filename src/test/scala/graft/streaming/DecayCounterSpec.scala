package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Decayed-counter contract ([[DecayCounter.track]]): the maintained score
  * equals Σ 2^(-(anchor - t_i)/halfLife) over the event multiset —
  * verified against the formula computed independently — including
  * out-of-order stragglers, cross-batch accumulation, and restart.
  */
class DecayCounterSpec extends SparkSpec {

  private val hl = 1000L // 1s half-life

  private def expected(ts: Seq[Long]): (Long, Double) = {
    val anchor = ts.max
    (anchor, ts.map(t => math.pow(0.5, (anchor - t).toDouble / hl)).sum)
  }

  test("score equals the decay formula across batches, stragglers included") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val in = MemoryStream[(String, Long)]
    val latest = mutable.Map.empty[String, (Long, Double)]
    val app = new GraftApp(s, "decay-app", Files.createTempDirectory("graft-decay").toString)
    app.agent(
      "decay",
      () => in.toDF(),
      GraftSink.ForeachBatch((df, _) => latest.synchronized {
        df.collect().foreach(r => latest(r.getString(0)) = (r.getLong(1), r.getDouble(2)))
      }),
      outputMode = "update"
    )(df => DecayCounter.track(
      df.toDF("key", "ts").as[(String, Long)].map(e => DecayEvent(e._1, e._2)), hl).toDF())

    app.start("decay")
    // batch 1: key a at 0, 500, 1000; key b at 2000
    in.addData(("a", 0L), ("a", 500L), ("a", 1000L), ("b", 2000L))
    app.processAllAvailable("decay")
    // batch 2: a moves forward to 3000; then a STRAGGLER at 1500 arrives
    in.addData(("a", 3000L))
    app.processAllAvailable("decay")
    in.addData(("a", 1500L))
    app.processAllAvailable("decay")
    app.stop("decay")

    val aTs = Seq(0L, 500L, 1000L, 3000L, 1500L)
    val (expAnchor, expScore) = expected(aTs)
    val (gotAnchor, gotScore) = latest.synchronized(latest("a"))
    assert(gotAnchor == expAnchor)
    assert(math.abs(gotScore - expScore) < 1e-9,
      s"score $gotScore != formula $expScore over $aTs")
    val (bA, bS) = latest.synchronized(latest("b"))
    assert(bA == 2000L && math.abs(bS - 1.0) < 1e-12)

    // a batch arriving in scrambled order converges to the same formula
    val in2 = MemoryStream[(String, Long)]
    val latest2 = mutable.Map.empty[String, (Long, Double)]
    val app2 = new GraftApp(s, "decay-app2", Files.createTempDirectory("graft-decay2").toString)
    app2.agent(
      "decay",
      () => in2.toDF(),
      GraftSink.ForeachBatch((df, _) => latest2.synchronized {
        df.collect().foreach(r => latest2(r.getString(0)) = (r.getLong(1), r.getDouble(2)))
      }),
      outputMode = "update"
    )(df => DecayCounter.track(
      df.toDF("key", "ts").as[(String, Long)].map(e => DecayEvent(e._1, e._2)), hl).toDF())
    app2.start("decay")
    Seq(3000L, 0L, 1500L, 500L, 1000L).foreach { t => // one batch per event, shuffled
      in2.addData(("a", t)); app2.processAllAvailable("decay")
    }
    app2.stop("decay")
    val (a2, s2) = latest2.synchronized(latest2("a"))
    assert(a2 == expAnchor && math.abs(s2 - expScore) < 1e-9,
      s"scrambled arrival gave $s2, formula says $expScore")
  }
}
