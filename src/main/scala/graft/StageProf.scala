package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-query job/stage profile: `runMain graft.StageProf <sfDir> q_a[,q_b] [runs]`.
  *
  * The bench container runs with the Spark UI disabled, so the guide's
  * "open the Stages tab" step (optimization guide §1.1/§7.1) has no UI to
  * open. This main is the headless equivalent: it executes each named
  * registry query through the SAME noop-sink methodology as
  * [[graft.Bench]] and prints, per Spark job, the wall time, stage count,
  * task-time sum, and shuffle read/write bytes a UI would show — enough
  * to tell "many small sequential jobs" (checkpoint/action overhead) from
  * "one shuffle-heavy job" (data cost), which is THE distinction that
  * decides whether an optimization should cut barriers or bytes.
  *
  * Diagnostic only: never run by the driver, adds no query, changes no
  * result.
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val runs = if (args.length > 2) args(2).toInt else 1
    val spark = graft.engine.Graft.session("graft-stageprof")

    final case class JobRec(
        desc: String,
        var start: Long = 0L,
        var end: Long = 0L,
        var stages: Int = 0,
        var tasks: Int = 0,
        var taskTimeMs: Long = 0L,
        var shufRead: Long = 0L,
        var shufWrite: Long = 0L,
        var input: Long = 0L)

    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.synchronized {
          jobs(e.jobId) = JobRec(desc, start = e.time)
          e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        jobs.synchronized {
          stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
            j.stages += 1
            j.tasks += si.numTasks
            j.taskTimeMs += si.taskMetrics.executorRunTime
            j.shufRead += si.taskMetrics.shuffleReadMetrics.totalBytesRead
            j.shufWrite += si.taskMetrics.shuffleWriteMetrics.bytesWritten
            j.input += si.taskMetrics.inputMetrics.bytesRead
          }
        }
      }
    }

    // untimed warmup, mirroring Bench
    try SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    catch { case e: Throwable => System.err.println(s"[prof] warmup failed: $e") }

    spark.sparkContext.addSparkListener(listener)
    for (name <- names; r <- 1 to runs) {
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      spark.catalog.clearCache()
      // listener events are posted async; give the bus a moment to drain
      Thread.sleep(300)
      val snap = jobs.synchronized { jobs.values.toVector }
      println(f"== $name run $r wall=$wall%.2fs jobs=${snap.size} " +
        f"stages=${snap.map(_.stages).sum} tasks=${snap.map(_.tasks).sum} " +
        f"taskTime=${snap.map(_.taskTimeMs).sum / 1e3}%.2fs " +
        f"shufW=${snap.map(_.shufWrite).sum / 1e6}%.1fMB")
      snap.zipWithIndex.foreach { case (j, i) =>
        println(f"  job#$i%-3d ${(j.end - j.start) / 1e3}%6.2fs stages=${j.stages}%-3d " +
          f"tasks=${j.tasks}%-4d taskTime=${j.taskTimeMs / 1e3}%6.2fs " +
          f"in=${j.input / 1e6}%7.1fMB sr=${j.shufRead / 1e6}%7.1fMB " +
          f"sw=${j.shufWrite / 1e6}%7.1fMB")
      }
    }
    spark.stop()
  }
}
