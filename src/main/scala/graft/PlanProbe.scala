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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val df = op match {
      case "prefix_filter" =>
        graft.operators.Dedup.prefixFilterPairs(docs, "doc_id", "text",
          shingleN = 3, threshold = 0.5)
      case other => sys.error(s"unknown op $other")
    }
    // executedPlan materializes localCheckpoints in the operator builder
    // (unavoidable — the operator eagerly checkpoints); joins above them
    // are what we care about
    // scalastyle:off println
    println(df.queryExecution.executedPlan.toString)
    // scalastyle:on println
    spark.stop()
  }
}
