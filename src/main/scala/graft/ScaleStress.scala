package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.engine.Graft

/** Dedup-family scale stress: run the pair-generating dedup queries
  * across sf0.001 / sf0.01 / sf0.1 (a 100× input spread), recording wall
  * time and TOTAL SHUFFLE WRITE BYTES per query, and fit the observed
  * scaling exponent between the two largest scale factors — converting
  * "the plan is banded/blocked so it scales" into a measured
  * sub-quadratic curve (a quadratic operator would show exponent ≈ 2 in
  * bytes; the banded plans must stay near-linear in the corpus).
  *
  * Shuffle bytes are the scale-honest metric here: wall time at these
  * sizes carries a multi-second fixed planning/JVM floor per query that
  * flattens exponents, while shuffle volume is exactly the quantity that
  * explodes when a pair join degenerates at 100 TB.
  */
object ScaleStress {

  private class ShuffleMeter extends SparkListener {
    val write = new AtomicLong(0)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      ()
    }
  }

  /** Synthesize a 10× tier above sf0.1 (500k-doc-equivalent territory is
    * out of reach in this container; 50k docs / 150k customers / 20k
    * embeddings extends the measured curve another decade). Each copy is
    * PERTURBED so cross-copy rows are NOT near-duplicates — every token
    * gets a copy tag, embedding signs flip per copy — keeping dup DENSITY
    * constant as the corpus grows: without this, 10 verbatim copies make
    * every doc a 10-clique and the measured growth is the (real, wanted)
    * output pair set, not plan behavior.
    */
  /** Spectrum-preserving document synthesis (round-12 verdict #6,
    * SPARK_GRAFT_SCALE_SPECTRUM=1): the default tag mode multiplies the
    * token VOCABULARY ~11× per decade, which shifts df spectra and makes
    * time exponents read high on token-keyed plans even when shuffle
    * stays linear. This mode instead perturbs copy c by a per-copy
    * BIJECTION on the token vocabulary — the permutation induced by
    * sorting the vocab on md5(token:copy:tier):
    *
    *   - token vocabulary (and per-copy token AND shingle df spectra)
    *     are EXACTLY scale-invariant — a bijection maps base shingles to
    *     image shingles 1:1, so posting-list length distributions repeat
    *     per copy and a linear plan must show exp_time ≈ exp_shuffle;
    *   - within-copy similarity is preserved EXACTLY (bijections
    *     preserve set intersections), so base-corpus dup DENSITY is
    *     constant across tiers;
    *   - cross-copy SHINGLE overlap collapses: independent hash
    *     permutations scramble n-gram composition (note the fixture's
    *     token-SET similarity is ~1 for ALL doc pairs already — its
    *     docs draw ~300 tokens from a 31-token vocabulary — so the
    *     dedup-relevant geometry lives in shingle space on every tier);
    *   - doc LENGTHS are untouched (no deletion-shrink confound).
    *
    * Hash-induced permutations rather than rank rotations because the
    * fixture vocabulary is TINY (31 tokens): only |V| distinct rotations
    * exist, so the 100 composed decade-1 × decade-2 copies would
    * collide mod 31 into verbatim duplicates; 100 independent random
    * permutations of even a 31-element set are pairwise distinct w.h.p.
    * (and tier keys differ, so decade-2 maps never invert decade-1's).
    * Copy 0 is the identity (split/join roundtrip preserves even
    * run-of-space tokenization exactly).
    */
  private def spectrumDocs(
      docs: org.apache.spark.sql.DataFrame,
      copies: org.apache.spark.sql.DataFrame,
      nDocs: Long,
      tier: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(
      col("doc_id"), col("lang"), col("source"), col("n_chars"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    // global vocab rank: synthesis-only utility (one bounded vocab sort,
    // not a registered-query plan)
    val vocab = toks.select("tok").distinct()
      .withColumn("r",
        row_number().over(Window.orderBy("tok")).cast("long") - 1)
      .localCheckpoint() // probed twice (rank lookup + inverse lookup)
    // per-copy hash permutation: this copy's token at hash-rank k maps
    // to the token at alphabetical rank k (ties on tok — total order)
    val perms = vocab.select(col("tok")).crossJoin(copies)
      .withColumn("k", md5(concat(col("tok"), lit(":"), col("copy"), lit(":"), lit(tier))))
      .withColumn("r2",
        row_number().over(Window.partitionBy(col("copy")).orderBy(col("k"), col("tok")))
          .cast("long") - 1)
      .localCheckpoint()
    toks
      .crossJoin(copies)
      .join(broadcast(perms), Seq("tok", "copy"))
      .join(broadcast(vocab.select(col("r").as("r2"), col("tok").as("tok2"))), Seq("r2"))
      .select(col("doc_id"), col("copy"), col("pos"),
        col("lang"), col("source"), col("n_chars"),
        when(col("copy") === 0, col("tok")).otherwise(col("tok2")).as("tk"))
      .groupBy((col("doc_id") + col("copy") * nDocs).as("doc_id"),
        col("lang"), col("source"), col("n_chars"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("tk")))),
          s => s.getField("tk")), " ").as("text"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
  }

  private def synthesize(
      spark: org.apache.spark.sql.SparkSession, from: String,
      spectrum: Boolean): String = {
    import org.apache.spark.sql.functions._
    val suffix = if (spectrum) "_spec" else ""
    val dir = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_sf1syn$suffix"
    // v3: also synthesizes events (KS / Mann-Whitney prefix-scan tier)
    // v4: lineitem carries l_suppkey (HITS bipartite tier)
    // v5: orders (itemcf custkey→basket join tier; offsets match lineitem)
    // v6: supplier + part (spatial-grid / Slope One decade tiers,
    //     round-12 verdict #1); spectrum document mode
    if (new java.io.File(s"$dir/_SYNTH_OK6").exists()) return dir
    val docs = spark.read.parquet(s"$from/documents.parquet")
    val nDocs = docs.agg(max("doc_id")).head.getLong(0) + 1
    val copies = spark.range(10).toDF("copy")
    val synthDocs =
      if (spectrum) spectrumDocs(docs, copies, nDocs, tier = "t1")
      else docs.crossJoin(copies)
        .select(
          (col("doc_id") + col("copy") * nDocs).as("doc_id"),
          when(col("copy") === 0, col("text"))
            .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("c"), col("copy"), lit("_$1"))))
            .as("text"),
          col("lang"), col("source"), col("n_chars"))
    synthDocs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cust = spark.read.parquet(s"$from/customer.parquet")
    val nCust = cust.agg(max("c_custkey")).head.getLong(0) + 1
    cust.crossJoin(copies)
      .select(
        (col("c_custkey") + col("copy") * nCust).as("c_custkey"),
        when(col("copy") === 0, col("c_name"))
          .otherwise(concat(col("c_name"), lit("#"), col("copy"))).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val emb = spark.read.parquet(s"$from/embeddings.parquet")
    val nEmb = emb.agg(max("vec_id")).head.getLong(0) + 1
    emb.crossJoin(copies)
      .select(
        (col("vec_id") + col("copy") * nEmb).as("vec_id"),
        when(col("copy") === 0, col("embedding"))
          .otherwise(zip_with(
            col("embedding"),
            transform(col("embedding"), (_, i) => pmod(xxhash64(col("copy"), i), lit(2))),
            (x, flip) => when(flip === 0, x).otherwise(-x)))
          .as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // lineitem: 10 disjoint copies of the co-purchase graph (orderkeys AND
    // partkeys offset per copy) — component structure repeats per copy, so
    // edge/component density stays constant as the corpus grows, the same
    // constant-density contract as the perturbed documents.
    val li = spark.read.parquet(s"$from/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val nOrd  = li.agg(max("l_orderkey")).head.getLong(0) + 1
    val nPart = li.agg(max("l_partkey")).head.getLong(0) + 1
    val nSupp = li.agg(max("l_suppkey")).head.getLong(0) + 1
    li.crossJoin(copies)
      .select(
        (col("l_orderkey") + col("copy") * nOrd).as("l_orderkey"),
        (col("l_partkey") + col("copy") * nPart).as("l_partkey"),
        (col("l_suppkey") + col("copy") * nSupp).as("l_suppkey"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // orders: orderkey offset MUST equal lineitem's (max keys align in the
    // fixtures — asserted), custkey offset MUST equal customer's, so the
    // order→basket and customer→basket joins stay within-copy.
    val ord = spark.read.parquet(s"$from/orders.parquet")
    require(ord.agg(max("o_orderkey")).head.getLong(0) + 1 == nOrd,
      "orders/lineitem max orderkey drifted; itemcf synth offsets would split baskets")
    ord.crossJoin(copies)
      .select(
        (col("o_orderkey") + col("copy") * nOrd).as("o_orderkey"),
        (col("o_custkey") + col("copy") * nCust).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // events: ids offset per copy; `value` gets a per-copy 1e-6 jitter so
    // the DISTINCT-value count (what the KS/MW prefix scan keys on) grows
    // with the corpus instead of saturating at the base tier's support —
    // verbatim copies would measure a constant-width scan, not plan growth.
    val ev = spark.read.parquet(s"$from/events.parquet")
    val nEv = ev.agg(max("event_id")).head.getLong(0) + 1
    val nUser = ev.agg(max("user_id")).head.getLong(0) + 1
    ev.crossJoin(copies)
      .select(
        (col("event_id") + col("copy") * nEv).as("event_id"),
        col("ts"),
        (col("user_id") + col("copy") * nUser).as("user_id"),
        col("event_type"),
        (col("value") + col("copy").cast("double") * lit(1e-6)).as("value"),
        col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // supplier + part (round-12 verdict #1: spatial-grid and Slope One
    // decade tiers). Keys offset with the SAME nSupp/nPart the lineitem
    // block used so lineitem→part/supplier joins stay within-copy
    // (require-guarded like orders). p_brand is kept VERBATIM — Slope
    // One's item vocabulary is intrinsically bounded (25 brands) and
    // must stay constant-width as the corpus grows; tagging it would
    // measure item-vocab growth (the deviation matrix is items²), the
    // Slope One twin of the verbatim-copy clique problem.
    val supp = spark.read.parquet(s"$from/supplier.parquet")
    require(supp.agg(max("s_suppkey")).head.getLong(0) + 1 == nSupp,
      "supplier/lineitem max suppkey drifted; synth offsets would split copies")
    supp.crossJoin(copies)
      .select(
        (col("s_suppkey") + col("copy") * nSupp).as("s_suppkey"),
        when(col("copy") === 0, col("s_name"))
          .otherwise(concat(col("s_name"), lit("#"), col("copy"))).as("s_name"),
        col("s_nationkey"), col("s_acctbal"))
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val part = spark.read.parquet(s"$from/part.parquet")
    require(part.agg(max("p_partkey")).head.getLong(0) + 1 == nPart,
      "part/lineitem max partkey drifted; synth offsets would break the part join")
    part.crossJoin(copies)
      .select(
        (col("p_partkey") + col("copy") * nPart).as("p_partkey"),
        when(col("copy") === 0, col("p_name"))
          .otherwise(concat(col("p_name"), lit("#"), col("copy"))).as("p_name"),
        col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice"))
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/_SYNTH_OK6"), Array.empty[Byte])
    dir
  }

  /** Second synthesized decade (sf10syn = 10 × sf1syn; round-10 verdict
    * #5, widened round 13 per round-12 verdict #1): documents, lineitem,
    * orders, customer, supplier, part and embeddings — everything the
    * rostered pair joins read — re-copied with the same constant-density
    * perturbations (fresh `d{copy}_` token tags so second-decade copies
    * aren't near-dups of first-decade ones; key offsets keep baskets and
    * dimension joins within-copy). 500k docs / 60M lineitem / 1.5M
    * customer rows: run it with SPARK_GRAFT_SCALE_DECADE2=1 and
    * SPARK_GRAFT_SCALE_ONLY limited to the queries under test — the
    * default run stays bounded.
    */
  private def synthesize10(
      spark: org.apache.spark.sql.SparkSession, from: String,
      spectrum: Boolean): String = {
    import org.apache.spark.sql.functions._
    val suffix = if (spectrum) "_spec" else ""
    val dir = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_sf10syn$suffix"
    // v2: customer + supplier + part + embeddings (round-12 verdict #1:
    //     spatial-grid, Slope One, linkage and the embedding cell joins
    //     get a top decade); spectrum document mode
    if (new java.io.File(s"$dir/_SYNTH_OK2").exists()) return dir
    val copies = spark.range(10).toDF("copy")
    val docs = spark.read.parquet(s"$from/documents.parquet")
    val nDocs = docs.agg(max("doc_id")).head.getLong(0) + 1
    // default mode uses a 'd' tag prefix (vs sf1syn's 'c') so
    // second-decade copies aren't near-dups of first-decade ones;
    // spectrum mode keys its hash permutations on tier "t2" so composed
    // decade-1 × decade-2 bijections are all distinct — no verbatim
    // cross-tier dups
    val synthDocs =
      if (spectrum) spectrumDocs(docs, copies, nDocs, tier = "t2")
      else docs.crossJoin(copies)
        .select(
          (col("doc_id") + col("copy") * nDocs).as("doc_id"),
          when(col("copy") === 0, col("text"))
            .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("d"), col("copy"), lit("_$1"))))
            .as("text"),
          col("lang"), col("source"), col("n_chars"))
    synthDocs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val li = spark.read.parquet(s"$from/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val nOrd = li.agg(max("l_orderkey")).head.getLong(0) + 1
    val nPart = li.agg(max("l_partkey")).head.getLong(0) + 1
    val nSupp = li.agg(max("l_suppkey")).head.getLong(0) + 1
    li.crossJoin(copies)
      .select(
        (col("l_orderkey") + col("copy") * nOrd).as("l_orderkey"),
        (col("l_partkey") + col("copy") * nPart).as("l_partkey"),
        (col("l_suppkey") + col("copy") * nSupp).as("l_suppkey"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // customer BEFORE orders: the o_custkey offset must equal customer's
    // key offset so the customer→order join stays within-copy
    val cust = spark.read.parquet(s"$from/customer.parquet")
    val nCust = cust.agg(max("c_custkey")).head.getLong(0) + 1
    cust.crossJoin(copies)
      .select(
        (col("c_custkey") + col("copy") * nCust).as("c_custkey"),
        when(col("copy") === 0, col("c_name"))
          .otherwise(concat(col("c_name"), lit("@"), col("copy"))).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val ord = spark.read.parquet(s"$from/orders.parquet")
    require(ord.agg(max("o_custkey")).head.getLong(0) < nCust,
      "orders reference custkeys beyond customer's key space at sf1syn")
    require(ord.agg(max("o_orderkey")).head.getLong(0) + 1 == nOrd,
      "orders/lineitem max orderkey drifted at the sf1syn tier")
    ord.crossJoin(copies)
      .select(
        (col("o_orderkey") + col("copy") * nOrd).as("o_orderkey"),
        (col("o_custkey") + col("copy") * nCust).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // supplier / part / embeddings (round-12 verdict #1): same offset and
    // perturbation contracts as the sf1syn tier — suppkey/partkey offsets
    // equal lineitem's, p_brand verbatim (bounded item vocabulary),
    // embedding signs flipped with a DIFFERENT mask family (copy+10) so
    // second-decade copies aren't sign-identical twins of first-decade ones
    val supp = spark.read.parquet(s"$from/supplier.parquet")
    require(supp.agg(max("s_suppkey")).head.getLong(0) + 1 == nSupp,
      "supplier/lineitem max suppkey drifted at the sf1syn tier")
    supp.crossJoin(copies)
      .select(
        (col("s_suppkey") + col("copy") * nSupp).as("s_suppkey"),
        when(col("copy") === 0, col("s_name"))
          .otherwise(concat(col("s_name"), lit("@"), col("copy"))).as("s_name"),
        col("s_nationkey"), col("s_acctbal"))
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val part = spark.read.parquet(s"$from/part.parquet")
    require(part.agg(max("p_partkey")).head.getLong(0) + 1 == nPart,
      "part/lineitem max partkey drifted at the sf1syn tier")
    part.crossJoin(copies)
      .select(
        (col("p_partkey") + col("copy") * nPart).as("p_partkey"),
        when(col("copy") === 0, col("p_name"))
          .otherwise(concat(col("p_name"), lit("@"), col("copy"))).as("p_name"),
        col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice"))
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val emb = spark.read.parquet(s"$from/embeddings.parquet")
    val nEmb = emb.agg(max("vec_id")).head.getLong(0) + 1
    emb.crossJoin(copies)
      .select(
        (col("vec_id") + col("copy") * nEmb).as("vec_id"),
        when(col("copy") === 0, col("embedding"))
          .otherwise(zip_with(
            col("embedding"),
            transform(col("embedding"), (_, i) => pmod(xxhash64(col("copy") + 10, i), lit(2))),
            (x, flip) => when(flip === 0, x).otherwise(-x)))
          .as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/_SYNTH_OK2"), Array.empty[Byte])
    dir
  }

  def main(args: Array[String]): Unit = {
    val spark = Graft.session("graft-scale-stress")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    val spectrum = sys.env.get("SPARK_GRAFT_SCALE_SPECTRUM").contains("1")
    val sf1 = synthesize(spark, "/root/testdata/sf0.1", spectrum)
    val decade2 = sys.env.get("SPARK_GRAFT_SCALE_DECADE2").contains("1")
    val sfs = Seq("sf0.001", "sf0.01", "sf0.1").map(s => s -> s"/root/testdata/$s") ++
      Seq("sf1syn" -> sf1) ++
      (if (decade2) Seq("sf10syn" -> synthesize10(spark, sf1, spectrum)) else Seq.empty)
    val allNames = Seq(
      "q_dedup_ngram_jaccard", "q_dedup_minhash_lsh", "q_dedup_fuzzy_key",
      "q_dedup_connected", "q_dedup_simhash", "q_dedup_span",
      "q_dedup_embedding_lsh", "q_dedup_embedding_lsh_tight",
      "q_dedup_representative", "q_text_domain_sim",
      "q_dedup_prefix_filter", "q_dedup_containment", "q_graph_components",
      "q_dedup_sorted_neighborhood",
      // round-7/8 re-planned queries (round-6 verdict required measured
      // exponents for every de-globalized window re-plan, round-7 for the
      // new LPT / bigram-LM additions)
      "q_sample_dsir", "q_text_vocab", "q_text_oov", "q_stat_ks",
      "q_stat_mannwhitney", "q_text_pmi", "q_quality_label_consistency",
      "q_pipeline_pack_lpt", "q_text_ngram_lm",
      // round-8 additions: CDC chunking (row-local + one hash shuffle),
      // chunk-pair dedup (df-capped self-join), celled hard negatives
      "q_dedup_cdc_chunks", "q_dedup_cdc_pairs", "q_ann_hard_negatives",
      // round-9: semantic admission gate (capped cell join + fp probes),
      // first-occurrence novelty (df-join-back shape)
      "q_dedup_incremental_semantic", "q_text_ngram_novelty",
      // round-9 late additions: the corpus-heavy new shapes — token-stream
      // global index (heaps), the cluster-impact ride on jaccardPairs,
      // prefix-group template mining, posting-window retrieval eval,
      // double value-keyed rank join (spearman), edge-iterative HITS
      "q_text_heaps_law", "q_dedup_cluster_stats", "q_text_template_mining",
      "q_text_retrieval_eval", "q_stat_spearman", "q_graph_hits",
      // round-10: the two new corpus-scaled pair joins — capped-basket
      // itemcf (customer-keyed self-join, md5-rank cap 30) and the
      // conversion×touch interval join (rank cap 32 per conversion)
      "q_rec_itemcf", "q_seq_attribution",
      // round-10 late additions: RA link prediction (wedge join, deg<=64
      // middle cap), 1-D DBSCAN (3-bucket grid neighborhood join),
      // Fellegi-Sunter linkage (bounded name-prefix block join)
      "q_graph_link_pred_ra", "q_mining_dbscan_1d", "q_dedup_record_linkage",
      // round-11: triangle-support peeling (Θ(triangles)/round) and the
      // user-keyed first-occurrence pattern join (type-width bounded)
      "q_graph_ktruss", "q_mining_seq_pattern",
      // round-12: 2-D grid-bucketed radius join (3×3 neighbor-cell equi)
      // and Slope One's per-user bounded deviation pair join
      "q_join_spatial_grid", "q_rec_slopeone",
      // round-13 (round-12 verdict #1): the remaining graph iteration
      // family — fixed-k damped message passing (ppr), frontier BFS
      // (sssp's bounded Bellman-Ford), and the layered σ DP
      // (path_counts); hits/ktruss/components were already rostered
      "q_graph_ppr", "q_graph_sssp", "q_graph_path_counts")
    // SPARK_GRAFT_SCALE_ONLY=a,b,c to isolate a subset (BENCH_ONLY's twin)
    val names = sys.env.get("SPARK_GRAFT_SCALE_ONLY") match {
      case Some(s) => allNames.filter(s.split(",").map(_.trim).toSet)
      case None    => allNames
    }

    // untimed warmup (JVM/codegen)
    SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()

    // results(query)(sf) = (inputRows, sec, shuffleBytes)
    val results = scala.collection.mutable.Map.empty[(String, String), (Long, Double, Long)]
    // lazy per-(sf, table) counts: the sf10syn tier synthesizes only the
    // tables its queries read, so eager counting of all six would fail
    val dirOf = sfs.toMap
    val tableRowsCache = scala.collection.mutable.Map.empty[(String, String), Long]
    def tableRows(sf: String, table: String): Long =
      tableRowsCache.getOrElseUpdate((sf, table),
        spark.read.parquet(s"${dirOf(sf)}/$table.parquet").count())
    def backingTable(name: String): String = name match {
      case "q_dedup_fuzzy_key" | "q_dedup_record_linkage" |
          "q_join_spatial_grid" => "customer"
      case "q_rec_slopeone" => "lineitem"
      case "q_mining_dbscan_1d" => "orders"
      case "q_dedup_embedding_lsh" | "q_dedup_embedding_lsh_tight" |
          "q_quality_label_consistency" | "q_ann_hard_negatives" |
          "q_dedup_incremental_semantic" => "embeddings"
      case "q_graph_components" | "q_graph_hits" | "q_rec_itemcf" |
          "q_graph_link_pred_ra" | "q_graph_ktruss" | "q_graph_ppr" |
          "q_graph_sssp" | "q_graph_path_counts" => "lineitem"
      case "q_stat_ks" | "q_stat_mannwhitney" | "q_seq_attribution" |
          "q_mining_seq_pattern" => "events"
      case _ => "documents"
    }
    // The synthesized tiers carry only a SUBSET of the tables (sf1syn:
    // six of ten; sf10syn: three) — skip any (tier, query) combination
    // whose full input-table set is not synthesized instead of crashing
    // on a missing parquet (round-11 ADVICE: the constraint was
    // documented but unenforced). Queries not listed in requiredTables
    // read only their backing table's family.
    def requiredTables(name: String): Set[String] = name match {
      case "q_join_spatial_grid" => Set("customer", "supplier")
      case "q_rec_slopeone" => Set("lineitem", "orders", "part")
      case "q_rec_itemcf" => Set("lineitem", "orders")
      case n => Set(backingTable(n))
    }
    def availableTables(sf: String): Option[Set[String]] = sf match {
      case "sf10syn" => Some(Set(
        "documents", "lineitem", "orders", "customer", "supplier", "part",
        "embeddings"))
      case "sf1syn" => Some(Set(
        "documents", "customer", "embeddings", "lineitem", "orders",
        "events", "supplier", "part"))
      case _ => None // real testdata dirs carry all ten tables
    }
    def combinationRuns(sf: String, name: String): Boolean =
      availableTables(sf).forall(av => requiredTables(name).subsetOf(av))
    for ((sf, dir) <- sfs; name <- names; if combinationRuns(sf, name)) {
      val rows = tableRows(sf, backingTable(name))
      val w0 = meter.write.get()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // listener events are async (private bus); give it a beat to drain
      Thread.sleep(300)
      val bytes = meter.write.get() - w0
      results((name, sf)) = (rows, sec, bytes)
      System.err.println(f"[scale] $name%-24s $sf%-8s rows=$rows%7d sec=$sec%8.2f shuffleMB=${bytes / 1e6}%10.2f")
    }
    spark.stop()
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.OFF)

    def exp(name: String, lo: String, hi: String, f: ((Long, Double, Long)) => Double): Double = {
      val a = results((name, lo)); val b = results((name, hi))
      math.log(f(b) / f(a)) / math.log(b._1.toDouble / a._1)
    }
    val lines = names.map { n =>
      val cells = sfs.collect { case (sf, _) if results.contains((n, sf)) =>
        val (rows, sec, bytes) = results((n, sf))
        s""""$sf":{"rows":$rows,"sec":$sec,"shuffle_bytes":$bytes}"""
      }.mkString(",")
      // every exponent pair is guarded on BOTH tiers having run — the
      // synthesized tiers skip queries whose inputs were not synthesized
      def expPart(label: String, lo: String, hi: String,
          f: ((Long, Double, Long)) => Double): String =
        if (results.contains((n, lo)) && results.contains((n, hi)))
          s""","$label":${exp(n, lo, hi, f)}"""
        else ""
      val parts =
        expPart("exp_time", "sf0.1", "sf1syn", _._2) +
          expPart("exp_shuffle", "sf0.1", "sf1syn", _._3.toDouble.max(1.0)) +
          expPart("exp_shuffle_mid", "sf0.01", "sf0.1", _._3.toDouble.max(1.0)) +
          expPart("exp_time_mid", "sf0.01", "sf0.1", _._2) +
          (if (decade2)
            expPart("exp_time_top", "sf1syn", "sf10syn", _._2) +
              expPart("exp_shuffle_top", "sf1syn", "sf10syn", _._3.toDouble.max(1.0))
          else "")
      s""""$n":{$cells$parts}"""
    }
    println(s"""{"metric":"dedup_scale_stress","spectrum":$spectrum,${lines.mkString(",")}}""")
    System.out.flush()
  }
}
