package graft

import java.nio.file.{Files, Paths}

/** Plan-evidence dump for the optimization rounds:
  * `runMain graft.PlanDump <sfDir> <outDir> <suffix> q_a[,q_b,...]`
  * writes `<outDir>/<query>_<suffix>.txt` with `.explain("formatted")`
  * output for each named registry query.
  *
  * Unlike [[PlanProbe]] this does NOT run in plan-only mode: builders may
  * execute driver scalars / eager checkpoints while constructing, so the
  * captured plan is exactly the one the bench executes (checkpointed
  * subtrees appear as materialized leaves, as in production). Intended
  * for the small SFs where construction costs seconds.
  *
  * Diagnostic only: never run by the driver, adds no query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = graft.engine.Graft.session("graft-plan-dump")
    Files.createDirectories(Paths.get(outDir))
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(s"$outDir/${name}_$suffix.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: $e")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
