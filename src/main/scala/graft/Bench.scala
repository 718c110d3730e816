package graft

import graft.engine.Graft

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver.
  *
  * Measurement contract:
  *   - results are forced through a `noop`-format write, which consumes the
  *     FULL row (every computed column is evaluated — a bare `.count()`
  *     would let Catalyst prune all projections and benchmark the scan);
  *   - a failing query records -1 and is listed in "failed" — errors are
  *     never silently swallowed into a fast-looking time;
  *   - the session comes from Graft.session, the same config (AQE, skew
  *     join, broadcast threshold) every other entry point uses;
  *   - operator-internal caches/localCheckpoints are dropped between
  *     queries so no query is billed for (or subsidized by) another's state.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session("graft-bench")
    // Untimed warmup: JVM/codegen/parquet-footer warmup shouldn't be billed
    // to whichever query happens to run first.
    try SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val sec =
        try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            -1.0
        }
      spark.catalog.clearCache()
      name -> sec
    }
    val ok = results.filter(_._2 >= 0)
    val failed = results.collect { case (n, s) if s < 0 => "\"" + n + "\"" }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""failed":[${failed.mkString(",")}],"sf":"$sfDir"}"""
    )
    spark.stop()
  }
}
