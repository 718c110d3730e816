package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Continuous Misra–Gries heavy hitters ([[StreamHeavyHitters.track]]):
  * bounded state per bucket, the MG survival + undercount guarantees
  * across micro-batches, and checkpoint-restart continuity of the sketch.
  */
class StreamHeavyHittersSpec extends SparkSpec {

  // capacity 8, one bucket: error bound is total/9
  private val nBuckets = 1
  private val capacity = 8

  test("planted hitters survive batches; counts respect the MG bound; state stays bounded") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val in = MemoryStream[String]
    val latest = mutable.Map.empty[String, (Long, Long)] // item -> (minCount, total)

    val app = new GraftApp(s, "hh-app", Files.createTempDirectory("graft-hh").toString)
    app.agent(
      "hh",
      () => in.toDF(),
      GraftSink.ForeachBatch((df, _) => latest.synchronized {
        // update-mode changelog: the last emission per item wins
        df.collect().foreach(r => latest(r.getString(1)) = (r.getLong(2), r.getLong(3)))
      }),
      outputMode = "update"
    )(df => StreamHeavyHitters.track(df.as[String], nBuckets, capacity).toDF())

    // true counts: hot=60, warm=30, plus 90 singleton noise items over 3 batches
    val hot = Seq.fill(20)("hot"); val warm = Seq.fill(10)("warm")
    def noise(b: Int) = (0 until 30).map(i => s"n${b}_$i")
    app.start("hh")
    for (b <- 0 until 3) {
      in.addData(scala.util.Random.shuffle(hot ++ warm ++ noise(b)): _*)
      app.processAllAvailable("hh")
    }
    app.stop("hh")

    val (total, snapshot) = latest.synchronized {
      (latest.values.map(_._2).max, latest.toMap)
    }
    assert(total == 180L, s"bucket total must count every arrival, got $total")
    val bound = total / (capacity + 1) // 20
    // survival guarantee: true count 60 and 30 both exceed the bound
    assert(snapshot.contains("hot") && snapshot.contains("warm"),
      s"planted hitters missing from ${snapshot.keys}")
    // undercount at most total/(c+1); never overcount
    val hotC = snapshot("hot")._1
    val warmC = snapshot("warm")._1
    assert(hotC <= 60 && hotC >= 60 - bound, s"hot count $hotC outside [${60 - bound}, 60]")
    assert(warmC <= 30 && warmC >= 30 - bound, s"warm count $warmC outside [${30 - bound}, 30]")
  }

  test("sketch state survives a checkpoint restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val ckpt = Files.createTempDirectory("graft-hh-ck").toString
    val in = MemoryStream[String]
    val seen = mutable.Map.empty[String, Long]

    def mkApp(src: MemoryStream[String]): GraftApp = {
      val app = new GraftApp(s, "hh-restart", ckpt)
      app.agent(
        "hh",
        () => src.toDF(),
        GraftSink.ForeachBatch((df, _) => seen.synchronized {
          df.collect().foreach(r => seen(r.getString(1)) = r.getLong(2))
        }),
        outputMode = "update"
      )(df => StreamHeavyHitters.track(df.as[String], nBuckets, capacity).toDF())
      app
    }

    val app1 = mkApp(in)
    app1.start("hh")
    in.addData(Seq.fill(12)("sticky") ++ (0 until 5).map(i => s"x$i"): _*)
    app1.processAllAvailable("hh")
    app1.stop("hh")
    assert(seen.synchronized(seen("sticky")) == 12L)

    // same checkpoint, fresh source: MemoryStream offsets restart at 0, so
    // re-add the FIRST batch (replayed, then ignored as committed) before
    // the genuinely new one
    val in2 = MemoryStream[String]
    in2.addData(Seq.fill(12)("sticky") ++ (0 until 5).map(i => s"x$i"): _*)
    val app2 = mkApp(in2)
    app2.start("hh")
    in2.addData(Seq.fill(3)("sticky"): _*)
    app2.processAllAvailable("hh")
    app2.stop("hh")

    assert(seen.synchronized(seen("sticky")) == 15L,
      s"restarted sketch must resume at 12 and add 3, got ${seen.synchronized(seen.get("sticky"))}")
  }
}
