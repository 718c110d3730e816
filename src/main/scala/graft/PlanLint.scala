package graft

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

/** Broadcast-misestimate lint (round-12 verdict #2, institutionalizing
  * the PlanProbe diagnostic): build the INITIAL physical plan of every
  * heavy registry query against a synthesized-tier directory — plan
  * only, no execution, localCheckpoints no-oped via
  * [[graft.engine.PlanOnly]] — and FAIL on any `BroadcastExchange`
  * whose build subtree scans a corpus-scaled table. That is the exact
  * signature that killed the prefix-filter decade-2 runs twice
  * (rounds 11/12): Catalyst size ESTIMATES under-shoot on
  * aggregate/filter-derived sides, elect a broadcast in the initial
  * plan, and AQE never demotes a non-shuffle build subtree — the plan
  * then dies on driver memory at scale instead of shuffling linearly.
  *
  * Plan-only conservatism: with checkpoints no-oped the planner sees
  * raw estimates where production sees exact checkpointed sizes, so a
  * hit here is "an estimate-elected broadcast is REACHABLE in this
  * plan shape". Queries whose broadcast side is bounded BY
  * CONSTRUCTION (explicit `broadcast()` of an intrinsically bounded
  * aggregate — codebooks, brand vocabularies, d×d moment matrices)
  * are waived by name with the bound stated, mirroring PlanSpec's
  * bounded-window allowlist.
  *
  * Usage: runMain graft.PlanLint <dir> [q_a,q_b,...]
  * (default roster = every query whose sf0.1 closing-bench median
  * exceeded ~3 s in BENCH_r12_queries.json — refresh when that set
  * moves). Queries reading tables the tier does not synthesize are
  * reported as SKIP. Exits 1 on any unwaived hit.
  */
object PlanLint {

  /** Queries whose corpus-derived broadcast is bounded by construction.
    * Every entry states the bound — an entry without a real bound is a
    * lint bypass, not a waiver.
    */
  val Waived: Map[String, String] = Map(
    "q_rec_slopeone" ->
      ("items / deviation matrix broadcasts are p_brand-keyed: the item " +
        "vocabulary is intrinsically bounded (25 brands; dev matrix ≤ 25² rows)"),
    "q_embed_pca" ->
      "projection broadcast is the d×d moment matrix (d = embedding dim, corpus-independent)",
    "q_text_unigram_segment" ->
      "piece-weight broadcast is the trained model (≤ chars + 160 pieces by the maxVocab cap)",
    "q_text_bpe_apply" ->
      "merge-table broadcast is the trained BPE model (bounded merge count)",
    "q_text_bpe_fertility" ->
      "merge-table broadcast is the trained BPE model (bounded merge count)"
  )

  /** sf0.1 closing-bench medians > ~3 s (BENCH_r12_queries.json) plus
    * the rostered pair joins just under the line.
    */
  val DefaultRoster: Seq[String] = Seq(
    "q_graph_hits", "q_graph_ppr", "q_rec_itemcf", "q_mining_dbscan_1d",
    "q_embed_pca", "q_stat_fdr_bh", "q_graph_sssp", "q_pipeline_semdedup",
    "q_dedup_cluster_stats", "q_dedup_representative", "q_text_classifier",
    "q_graph_bfs", "q_dedup_prefix_filter", "q_quality_calibration",
    "q_graph_modularity", "q_text_phrase", "q_quality_length_bias",
    "q_graph_diameter", "q_text_classifier_sweep", "q_dedup_span",
    "q_graph_labelprop", "q_agg_weighted_median", "q_graph_assortativity",
    "q_dedup_connected", "q_dedup_minhash_bbit", "q_profile_fd",
    "q_text_bpe_fertility", "q_text_bpe_apply", "q_text_textrank",
    "q_graph_ktruss", "q_rec_slopeone", "q_graph_path_counts",
    "q_join_spatial_grid", "q_text_unigram_segment")

  /** Tables that are corpus-scaled at the 100 TB design point — a scan
    * of any of these under a broadcast build subtree is the failure
    * signature. (nation/region are genuinely constant-size dimensions.)
    */
  val CorpusTables: Set[String] = Set(
    "documents", "embeddings", "lineitem", "orders", "events",
    "customer", "supplier", "part")

  private def corpusScans(p: SparkPlan): Seq[String] = p.collect {
    case f: FileSourceScanExec =>
      f.relation.location.rootPaths.map(_.toString)
        .filter(path => CorpusTables.exists(t => path.contains(s"/$t.parquet")))
  }.flatten.distinct

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanLint <dir> [q_a,q_b,...]")
    val dir = args(0)
    val names =
      if (args.length > 1) args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else DefaultRoster
    val spark = graft.engine.Graft.session("graft-plan-lint")
    var bad = 0; var waived = 0; var skipped = 0; var clean = 0
    // scalastyle:off println
    for (name <- names) {
      Try(graft.engine.PlanOnly.planOnly {
        SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
      }) match {
        case Failure(e) =>
          skipped += 1
          val msg = Option(e.getMessage).getOrElse(e.toString).linesIterator
            .take(1).mkString
          println(s"[planlint] SKIP  $name ($msg)")
        case Success(plan) =>
          val root = plan match {
            case a: AdaptiveSparkPlanExec => a.inputPlan
            case p => p
          }
          val hits = root.collect { case b: BroadcastExchangeExec =>
            (b, corpusScans(b))
          }.filter(_._2.nonEmpty)
          if (hits.isEmpty) { clean += 1; println(s"[planlint] OK    $name") }
          else if (Waived.contains(name)) {
            waived += 1
            println(s"[planlint] WAIVE $name — ${Waived(name)}")
          } else {
            bad += 1
            println(s"[planlint] FAIL  $name — BroadcastExchange over corpus-scaled scan(s):")
            hits.foreach { case (b, scans) =>
              scans.foreach(s => println(s"[planlint]          scan: $s"))
              println(b.treeString.linesIterator.take(12).map("[planlint]     " + _).mkString("\n"))
            }
          }
      }
    }
    println(s"[planlint] summary: ${names.size} probed — $clean ok, $waived waived, $skipped skipped, $bad FAILED")
    // scalastyle:on println
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
