package graft

/** Plan-shape regression guards: the properties that make the headline
  * queries scale are asserted on the optimized physical plan, so a future
  * edit can't silently trade them away (a filter that stops reaching the
  * parquet scan, a broadcast that degrades to a shuffle, a pruned column
  * set that widens).
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q6: filters are pushed into the parquet scan and the read schema is pruned") {
    val p = planOf("q6_forecast_revenue")
    assert(p.contains("PushedFilters:"), "no pushdown section in scan")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "shipdate range not pushed to scan")
    assert(p.contains("LessThan(l_quantity"), "quantity filter not pushed to scan")
    // projection pruning: 4 of 16 lineitem columns read
    assert(
      p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate"),
      s"lineitem scan is not pruned to the 4 needed columns")
  }

  test("q5: every dimension join is broadcast (no shuffle joins at dimension size)") {
    val p = planOf("q5_local_supplier_volume")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins")
    assert(!p.contains("SortMergeJoin"), "a dimension join degraded to sort-merge")
  }

  test("q1: aggregation is partial (map-side combine) with only agg + sort shuffles") {
    val p = planOf("q1_pricing_summary")
    assert(p.contains("partial_sum"), "no map-side partial aggregation")
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected <=2 exchanges (agg, sort), found $exchanges")
  }

  test("brute-force ANN broadcasts the query side") {
    val p = planOf("q_ann_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "query side is not broadcast")
  }

  test("similarity scoring runs the codegen'd cosine expression, not HOF folds") {
    val p = planOf("q_ann_bruteforce")
    assert(p.contains("graft_cosine"), "custom CosineSimilarity expression not in plan")
  }

  test("as-of join plans through the custom exec with one shuffle per side") {
    val p = planOf("q_join_asof")
    assert(p.contains("AsofJoin"), "custom AsofJoinExec not in plan")
    // events scan feeds both sides; the click side's tie-collapse groupBy
    // shuffles on (user_id, ts) then re-clusters on user_id, the purchase
    // side shuffles once, and the final orderBy adds one range exchange —
    // nothing else may shuffle
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 4, s"expected <=4 exchanges (agg + 2 sides + sort), found $exchanges")
  }

  test("top-k per group uses Spark's map-side WindowGroupLimit before the shuffle") {
    // rank-limit pushdown (SPARK-37099): only k rows per group per input
    // partition survive to the shuffle — the built-in operator our top-k
    // queries rely on at 100 TB, guarded here so a query rewrite can't
    // silently lose it
    val p = planOf("q_window_topk_per_group")
    assert(p.contains("WindowGroupLimit"), "WindowGroupLimit missing from top-k plan")
    assert(p.contains("Partial"), "expected a partial (map-side) WindowGroupLimit")
  }

  test("salted skew join stays an equi-join on (key, salt) — no cartesian, no nested loop") {
    val p = planOf("q_join_salted_skew")
    assert(!p.contains("CartesianProduct"), "salting degraded to a cartesian product")
    assert(!p.contains("BroadcastNestedLoopJoin"), "salting degraded to a nested-loop join")
  }

  test("pivot aggregates map-side (partial) like any other aggregate") {
    val p = planOf("q_agg_pivot")
    assert(p.contains("partial_"), "pivot lost map-side partial aggregation")
  }

  test("gap fill keeps its exchange budget (bucket agg, bounds, grid join, fill window)") {
    val p = planOf("q_ts_gapfill")
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 5, s"gap fill grew extra shuffles: $exchanges")
    assert(!p.contains("CartesianProduct"), "grid generation must not cross join")
  }

  test("ivf-cell near-dup pairs by equi-join on the cell — never a cartesian") {
    val p = planOf("q_dedup_embedding_ivf")
    assert(!p.contains("CartesianProduct"), "cell blocking degraded to a cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"), "cell blocking degraded to a nested loop")
    assert(p.contains("graft_cosine"), "pair scoring must run the codegen cosine")
  }

  test("domain cap pushes its rank limit map-side (partial WindowGroupLimit)") {
    val p = planOf("q_sample_domain_cap")
    assert(p.contains("WindowGroupLimit"), "domain cap lost WindowGroupLimit pushdown")
    assert(p.contains("Partial"), "expected a partial (map-side) WindowGroupLimit")
  }

  test("binned range join is an equi-join on the bin id — never a nested loop") {
    // the naive keyless range join can ONLY plan as BNLJ/cartesian; the
    // binned rewrite must hand Catalyst an equi condition
    val p = planOf("q_join_range_binned")
    assert(!p.contains("CartesianProduct"), "binned range join degraded to a cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"), "binned range join degraded to a nested loop")
  }

  test("binned interval-overlap join is an equi-join on the bin id — never a nested loop") {
    // interval x interval overlap has no natural equi key either; the
    // double-explode + canonical-bin rewrite must stay equi
    val p = planOf("q_join_interval_overlap")
    assert(!p.contains("CartesianProduct"), "binned overlap join degraded to a cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"), "binned overlap join degraded to a nested loop")
  }

  test("rolling 7-day distinct (exact + HLL) is explode-to-window equi-shuffle, never BNLJ") {
    // the naive days×pairs BETWEEN join can only plan as a broadcast
    // nested loop; the explode-to-window rewrite must stay equi
    for (q <- Seq("q_seq_rolling_distinct", "q_seq_rolling_distinct_hll")) {
      val p = planOf(q)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q degraded to a nested loop")
      assert(!p.contains("CartesianProduct"), s"$q went cartesian")
    }
  }

  test("incremental fuzzy gate: banded equi-joins only, never BNLJ/cartesian") {
    val p = planOf("q_dedup_incremental_fuzzy")
    assert(!p.contains("BroadcastNestedLoopJoin"), "fuzzy gate degraded to a nested loop")
    assert(!p.contains("CartesianProduct"), "fuzzy gate went cartesian")
  }

  test("contamination probe is one shingle-keyed equi-join, no cartesian") {
    val p = planOf("q_pipeline_contamination")
    assert(!p.contains("CartesianProduct"), "contamination probe went quadratic")
    assert(!p.contains("BroadcastNestedLoopJoin"), "contamination probe went nested-loop")
  }

  test("sequence packing windows partition by shard (no single global sort task)") {
    val p = planOf("q_pipeline_pack")
    assert(p.contains("hashpartitioning(shard"), "pack window lost its shard partitioning")
  }

  test("lateral subquery decorrelates into a ranked join, not per-row re-execution") {
    val p = planOf("q_subquery_lateral")
    assert(!p.contains("CartesianProduct"), "lateral stayed correlated/cartesian")
  }

  test("bloom semi-join probes the sketch directly on the fact scan, before any exchange") {
    val p = planOf("q_join_bloom_semi")
    assert(p.contains("graft_bloom_might_contain"), "bloom probe expression not in plan")
    // find the operator id of the Filter that carries the probe, then
    // assert the tree shows its child is the parquet scan itself — the
    // probe runs in the scan stage, upstream of every shuffle
    val probeId = """\((\d+)\) Filter""".r
      .findAllMatchIn(p)
      .map(_.group(1))
      .find { id =>
        val detail = p.split("\n\n").find(_.startsWith(s"($id) Filter"))
        detail.exists(_.contains("graft_bloom_might_contain"))
      }
    assert(probeId.isDefined, "no Filter operator carries the bloom probe")
    val tree = p.split("\n\n").head.linesIterator.toSeq
    val probeLine = tree.indexWhere(_.contains(s"Filter (${probeId.get})"))
    assert(probeLine >= 0, s"Filter (${probeId.get}) not in plan tree")
    assert(tree(probeLine + 1).contains("Scan parquet"),
      s"probe filter's child is not the fact scan:\n${tree.mkString("\n")}")
  }

  test("q5 is join-strategy invariant: identical rows under sort-merge as under broadcast") {
    // at 100x the data AQE will pick shuffle joins for what broadcasts
    // today; results must not depend on that choice
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    val broadcast = SparkEntry.queries("q5_local_supplier_volume")(spark, sf).collect().toSeq
    try {
      spark.conf.set(key, "-1")
      val df = SparkEntry.queries("q5_local_supplier_volume")(spark, sf)
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "expected shuffle joins with broadcast disabled")
      assert(df.collect().toSeq === broadcast, "join strategy changed the result")
    } finally spark.conf.set(key, prev)
  }

  test("z-score scaling broadcasts the per-group stats back — no second shuffle of events") {
    val p = planOf("q_norm_zscore")
    assert(p.contains("BroadcastHashJoin"), "stats table not broadcast back")
    assert(!p.contains("SortMergeJoin"), "events re-shuffled for a <=#groups-row join")
  }

  test("column profile never plans the multi-distinct Expand; distinct scans are single-column") {
    val p = planOf("q_profile_columns")
    // five exact COUNT DISTINCTs fused into one aggregate would plan a
    // row-multiplying Expand (6 projections of the scan); the profile
    // splits them into per-column partial-distinct aggregates instead —
    // one wide stats scan plus five NARROW scans that each read exactly
    // one column (columnar IO ≈ the single all-column scan, none of the
    // Expand CPU)
    assert(!p.contains("Expand"), "profile re-fused multi-column distinct into an Expand")
    val tree = p.split("\n\n").head
    val scans = tree.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 6, s"expected 1 stats + 5 distinct scans, found $scans")
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    val narrow = readSchemas.count(s => s.count(_ == ':') == 1)
    assert(narrow >= 5, s"distinct scans must read ONE column, schemas: $readSchemas")
  }

  test("funnel cascade never degrades to a cartesian or nested-loop join") {
    val p = planOf("q_seq_funnel")
    assert(!p.contains("CartesianProduct"), "funnel stage join went cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"), "funnel stage join lost its equi-key")
  }

  test("Q17's correlated scalar average decorrelates — no per-row subquery") {
    val df = SparkEntry.queries("q17_small_quantity_revenue")(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("scalar-subquery"),
      "correlated scalar subquery survived optimization (per-row re-execution)")
    assert(df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size >= 2, "expected the decorrelated per-part average aggregate + the outer sum")
  }

  test("Q4's EXISTS plans as one semi join — orders never multiplied by lines") {
    val p = planOf("q4_order_priority")
    assert(p.contains("LeftSemi"), s"expected a left-semi join, got:\n$p")
  }

  test("cdc_pairs df-caps boilerplate chunks BEFORE the pair self-join") {
    // same contract as invertedIndex's df pre-pass: the hot-chunk anti-join
    // must sit BELOW the pair-generating equi-join, so a chunk in half the
    // corpus never enumerates its quadratic pair set
    val df = graft.queries.Registry.all.find(_.name == "q_dedup_cdc_pairs").get
      .run(spark, sf)
    val plan = df.queryExecution.optimizedPlan
    val pairJoins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.Inner &&
            j.condition.exists(_.toString.contains("doc_id")) => j
    }
    assert(pairJoins.nonEmpty, "expected the chunk-pair self-join in the plan")
    pairJoins.foreach { j =>
      val antiBelow = j.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Join
            if a.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => a
      }
      assert(antiBelow.nonEmpty,
        s"hot chunks must be anti-joined out BELOW the pair join; got:\n$j")
    }
  }

  test("registry-wide lint: no unpartitioned Window over corpus-growing input") {
    // A WindowExec with an empty partitionSpec funnels its WHOLE input
    // through one task — the classic 100 TB scale-killer (round-6 verdict
    // found six). Allowed ONLY over inputs that are intrinsically bounded
    // regardless of corpus size; each allowlisted name carries the bound.
    val bounded: Map[String, String] = Map(
      // day-grain series: rows = days in the fixture window, not corpus size
      "q_ts_cusum" -> "day-grain series",
      "q_ts_seasonal_decompose" -> "day-grain series",
      "q_ts_changepoint" -> "day-grain series",
      "q_ts_autocorrelation" -> "day-grain series",
      // fixed-cardinality replicate table
      "q_stat_bootstrap" -> "32 bootstrap replicates",
      // 5 stage-count rows (one per funnel gate), not corpus-scaled
      "q_pipeline_attrition" -> "5 funnel-stage counts",
      // |sources| rows (a handful of crawl names) — the Gini rank window
      // runs over the per-source aggregate, never the corpus
      "q_audit_domain_gini" -> "per-source aggregate (|sources| rows)",
      // rank windows run on the two top-100 candidate lists (a `limit`
      // sits directly below each window), never the corpus
      "q_text_rank_fusion" -> "top-100 candidate lists (limit below)",
      // running max over the 64-cell price grid aggregate
      "q_agg_skyline" -> "64-cell price-grid aggregate",
      // (q_agg_exact_kth no longer appears here: its recursive grid
      // selection runs eagerly in the builder — Selection.kthSmallest's
      // windows are bounded to <=65,536 grid cells / <=CellSortMax rows
      // by construction and never reach the registered plan)
      // BH ranking over the m-row p-value table (m = |groups|-1 tests)
      "q_stat_fdr_bh" -> "m per-group tests (schema constant)",
      // Page's hypothesized-position index over the k-row rank-sum table
      "q_stat_page_trend" -> "k per-type rank sums (schema constant)"
    )
    val offenders = graft.queries.Registry.all.flatMap { q =>
      // a query that fails to BUILD here is itself an offense — swallowing
      // the throw would let a broken query silently pass this lint
      try {
        val hits = q.run(spark, sf).queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }.size
        if (hits > 0 && !bounded.contains(q.name)) Some(q.name -> s"$hits unpartitioned Window(s)")
        else None
      } catch { case e: Throwable => Some(q.name -> s"FAILED TO PLAN: $e") }
    }
    assert(offenders.isEmpty,
      s"unpartitioned Window over unbounded input (fix or justify in the bounded map): $offenders")
  }

  test("registry-wide lint: every collect_list/collect_set is capped or bounded") {
    // An uncapped collect over a corpus-scaled grouping key materializes
    // an unbounded array in one aggregation buffer — the row-size analog
    // of the unpartitioned Window (round-7 found two by hand; round-8
    // verdict asked to make the class unrepresentable). A collect passes
    // when (a) a rank-cap Filter or a df-cap LeftAnti join sits BELOW it
    // in the same subtree, or (b) the query is allowlisted with the
    // intrinsic bound stated. Rank caps are detected STRUCTURALLY
    // (round-10 verdict #4): either the WindowGroupLimit node the
    // optimizer plants for rank<=k filters, or a Filter conjunct
    // comparing a row_number/rank/dense_rank window output attribute to
    // a literal — no column-name conventions to dodge or allowlist.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, Window => LWindow, WindowGroupLimit}
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    import org.apache.spark.sql.catalyst.expressions.aggregate.{CollectList, CollectSet}
    import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, BinaryComparison, DenseRank, Expression, Literal, Rank, RowNumber, WindowExpression}
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def isRankCapFilter(f: Filter): Boolean = {
      val rankIds = f.child.collect {
        case w: LWindow => w.windowExpressions.collect {
          case al @ Alias(WindowExpression(fn, _), _)
              if fn.isInstanceOf[RowNumber] || fn.isInstanceOf[Rank] ||
                fn.isInstanceOf[DenseRank] => al.exprId
        }
      }.flatten.toSet
      rankIds.nonEmpty && conjuncts(f.condition).exists {
        case BinaryComparison(a: AttributeReference, _: Literal) => rankIds(a.exprId)
        case BinaryComparison(_: Literal, a: AttributeReference) => rankIds(a.exprId)
        case _ => false
      }
    }
    val bounded: Map[String, String] = Map(
      // 25-nation / 5-region dimension table: group count AND group size
      // are schema constants, not corpus-scaled
      "q_agg_collect" -> "nation dim table (25 rows, 5 groups)",
      // per-doc collects: group key is doc_id, array length bounded by
      // the document's own length (pieces / paragraphs / ~64-char CDC
      // chunks) — the intrinsically-bounded class the Window lint also
      // allows
      "q_text_bpe_apply" -> "per-doc BPE pieces",
      "q_dedup_paragraph" -> "per-doc paragraphs",
      "q_dedup_cdc_chunks" -> "per-doc CDC chunks (~len/64)",
      // per-type daily profiles: array length is CALENDAR-bounded (one
      // cell per day regardless of corpus size; the corpus-scaled work
      // is the upstream (type, day) aggregation)
      "q_ts_dtw" -> "per-type daily profile (calendar-bounded)",
      "q_ts_holt" -> "per-type daily profile (calendar-bounded)",
      "q_ts_holt_winters" -> "per-type daily profile (calendar-bounded)",
      "q_ts_kalman" -> "per-type daily profile (calendar-bounded)",
      // stopword-delimited runs group on (doc, run): doc-length-bounded
      "q_text_rake" -> "per-doc stopword-delimited runs",
      // ±3-day centered window groups: ≤7 values per (type, anchor-day)
      // regardless of corpus size (calendar-bounded, the qRollingMedian
      // explode-to-anchor shape)
      "q_ts_hampel" -> "±3-day window (≤7 values, calendar-bounded)",
      // per-doc shingle-hash array for the PPJoin verify: array length is
      // the document's own shingle count (doc-length-bounded)
      "q_dedup_prefix_filter" -> "per-doc shingle-hash array"
    )
    val offenders = graft.queries.Registry.all.flatMap { q =>
      try {
        val plan = q.run(spark, sf).queryExecution.optimizedPlan
        val uncapped = plan.collect {
          case a: Aggregate if a.aggregateExpressions.exists(_.exists {
            case _: CollectList | _: CollectSet => true
            case _ => false
          }) => a
        }.filterNot { a =>
          val hasAnti = a.child.collectFirst {
            case j: Join if j.joinType == LeftAnti => j
          }.isDefined
          val hasGroupLimit = a.child.collectFirst {
            case g: WindowGroupLimit => g
          }.isDefined
          val hasRankCap = a.child.collectFirst {
            case f: Filter if isRankCapFilter(f) => f
          }.isDefined
          hasAnti || hasGroupLimit || hasRankCap
        }
        if (uncapped.nonEmpty && !bounded.contains(q.name))
          Some(q.name -> s"${uncapped.size} uncapped collect aggregate(s)")
        else None
      } catch { case e: Throwable => Some(q.name -> s"FAILED TO PLAN: $e") }
    }
    assert(offenders.isEmpty,
      s"uncapped collect over a corpus-scaled key (cap it or justify in the bounded map): $offenders")
  }

  test("registry-wide lint: NO registered query plans a CartesianProduct") {
    // The one classic scale-killer no operator may ever reintroduce. Even
    // the explicit cross join must plan as a BROADCAST nested loop (bounded
    // side), never a full shuffle cartesian.
    val offenders = graft.queries.Registry.all.flatMap { q =>
      val p =
        try q.run(spark, sf).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLANNING FAILED: $e" }
      if (p.contains("CartesianProduct") || p.startsWith("PLANNING FAILED"))
        Some(q.name -> p.linesIterator.find(l =>
          l.contains("CartesianProduct") || l.startsWith("PLANNING FAILED")).getOrElse(""))
      else None
    }
    assert(offenders.isEmpty, s"cartesian/unplannable queries: $offenders")
  }
}
