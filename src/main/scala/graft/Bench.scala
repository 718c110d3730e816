package graft

import graft.engine.Graft

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver — guaranteed to be the LAST stdout
  * line (loggers are turned off before it is printed, so Spark shutdown
  * hooks can't write after it), and also written to `BENCH_LAST.json` so
  * a log-tailing harness has a structured fallback.
  *
  * Measurement contract:
  *   - results are forced through a `noop`-format write, which consumes the
  *     FULL row (every computed column is evaluated — a bare `.count()`
  *     would let Catalyst prune all projections and benchmark the scan);
  *   - each query is timed SPARK_GRAFT_BENCH_RUNS times (default 3) and
  *     reported as the per-query MEDIAN ("queries") plus max ("queries_p95")
  *     — container-load noise on a single run otherwise masquerades as a
  *     regression (the round-3 phantom set-ops slowdown);
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
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = Graft.session("graft-bench")
    // Untimed warmup: JVM/codegen/parquet-footer warmup shouldn't be billed
    // to whichever query happens to run first.
    try SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }

    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the run (iteration aid)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // run-major order: every query sees the same cache temperature in run k
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (r <- 1 to runs; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val sec =
        try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED (run $r): $e")
            -1.0
        }
      spark.catalog.clearCache()
      samples(name) = samples(name) :+ sec
    }

    def median(xs: Vector[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val failed = names.filter(n => samples(n).exists(_ < 0))
    val p50 = names.map(n => n -> (if (failed.contains(n)) -1.0 else median(samples(n))))
    val p95 = names.map(n => n -> (if (failed.contains(n)) -1.0 else samples(n).max))
    val total = p50.collect { case (_, s) if s >= 0 => s }.sum
    def jmap(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // Full per-query detail goes to BENCH_LAST.json; the stdout line stays
    // COMPACT (totals only) — at 229 queries the per-query map outgrew the
    // driver's 2 KB log-tail capture, so BENCH_r04 recorded parsed:null.
    // boot id stamps which container lifetime measured this run — medians
    // drift ±10-13% ACROSS restarts (round-10 finding: sub-second
    // fixture-floor queries move ≥1.5× together); a artifact-vs-artifact
    // diff with DIFFERENT boot ids is drift-suspect before it is a
    // regression.
    val bootId =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/sys/kernel/random/boot_id")),
        java.nio.charset.StandardCharsets.UTF_8).trim
      catch { case _: Throwable => "unknown" }
    val detail =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(p50)},""" +
        s""""queries_p95":${jmap(p95)},"runs":$runs,"boot_id":"$bootId",""" +
        s""""failed":[${failed.map("\"" + _ + "\"").mkString(",")}],"sf":"$sfDir"}"""
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${names.size},""" +
        s""""runs":$runs,"failed":[${failed.map("\"" + _ + "\"").mkString(",")}],"sf":"$sfDir"}"""

    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_LAST.json"),
      (detail + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    // Nothing may print after the JSON line: kill all logging (including
    // the JVM shutdown hooks') before emitting it.
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.OFF)
    println(compact)
    System.out.flush()
  }
}
