package graft

/** Plan-only probe: build an operator's DataFrame against an arbitrary
  * table directory and print the INITIAL physical plan (no execution) —
  * the diagnostic for join-strategy regressions at synthesized tiers
  * where executing just to see the plan costs 15 minutes and 80 GB of
  * spill (the round-12 prefix-filter decade-2 investigation).
  *
  * Usage: runMain graft.PlanProbe <dir> [op]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val op = if (args.length > 1) args(1) else "prefix_filter"
    val spark = graft.engine.Graft.session("graft-plan-probe")
    // plan-only: .ckpt() checkpoints no-op, so the probe never
    // materializes corpus-scaled intermediates (the printed plan shows
    // raw Catalyst estimates where production would have exact
    // checkpointed sizes — see graft.engine.PlanOnly)
    val plan = graft.engine.PlanOnly.planOnly {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val df = op match {
        case "prefix_filter" =>
          graft.operators.Dedup.prefixFilterPairs(docs, "doc_id", "text",
            shingleN = 3, threshold = 0.5)
        case other =>
          // any registered query name probes against the directory
          SparkEntry.queries.getOrElse(other, sys.error(s"unknown op $other"))(spark, dir)
      }
      df.queryExecution.executedPlan.toString
    }
    // scalastyle:off println
    println(plan)
    // scalastyle:on println
    spark.stop()
  }
}
