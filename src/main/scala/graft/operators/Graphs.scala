package graft.operators

import graft.engine.PlanOnly.syntax._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over relational co-occurrence — the family
  * [[Dedup.connectedComponents]] (components) and
  * [[Similarity.knnGraph]] (edge construction) started: triangle
  * structure, the building block of clustering coefficients, community
  * strength, and recommendation signals.
  *
  * Reference analog: none — callysto has no graph surface at all; user
  * closures over CTables would have to hand-roll adjacency. Here a graph
  * is just an edge DataFrame, and the algorithms are join shapes.
  */
object Graphs {

  /** Co-occurrence edges: connect two items that appear in the same
    * group (same order, same session, same document), one CANONICAL edge
    * per pair (src < dst), weighted by the number of co-occurrences.
    *
    * Scale shape: the self-join is keyed on the group, so the quadratic
    * term is bounded by the largest group (basket/session size — small
    * by domain), never the corpus; the groupBy collapses duplicates
    * map-side. The classic market-basket edge builder.
    */
  def cooccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String): DataFrame = {
    // ONE group-keyed shuffle instead of three (round-13 rework, guide
    // §2.4 "remove shuffles outright"): the old shape was
    // distinct(g, i) [shuffle 1] self-joined on g [shuffle 2 of BOTH
    // sides] → pair groupBy [shuffle 3]. collect_set(i) needs only the
    // one group-keyed exchange (with map-side partial sets), pairs
    // generate ROW-LOCALLY from the sorted set (same a.i < b.i
    // canonicalization), and only the pair aggregate shuffles after
    // that. Identical output: collect_set ≡ per-group distinct, the
    // sorted-array index pairs enumerate exactly the x < y pairs, and
    // weight = #groups containing both. The quadratic term stays
    // bounded by the largest group, as before — but now it is also
    // ROW-local, so a hub group degrades one task, not a join. The
    // pair lambdas capture only the materialized `is` attribute (CSE
    // trap respected).
    val sets = df.select(col(groupCol).as("g"), col(itemCol).as("i"))
      .groupBy(col("g"))
      .agg(sort_array(collect_set(col("i"))).as("is"))
    sets
      .select(explode(flatten(transform(col("is"), (x, idx) =>
        transform(
          slice(col("is"), idx + lit(2), greatest(size(col("is")) - idx - 1, lit(0))),
          y => struct(x.as("src"), y.as("dst")))))).as("p"))
      .groupBy(col("p.src").as("src"), col("p.dst").as("dst"))
      .agg(count(lit(1)).as("weight"))
  }

  /** Triangle enumeration over canonical (src < dst) edges: each triangle
    * a < b < c reported exactly once. The two-join shape IS the classic
    * node-ordered triangle algorithm — because every edge is stored with
    * its smaller endpoint first, the join (a,b)⋈(b,c) only extends paths
    * upward and the closure probe (a,c) finds each triangle once, no
    * 3!-fold duplication, O(m^1.5)-ish work on skew-free degree
    * distributions. AQE's skew handling covers hub vertices; for
    * adversarial hubs, pre-cap degree like the dedup family's df-cap.
    */
  def triangles(edges: DataFrame): DataFrame = {
    // lazy: feeds three join sides of the SAME downstream action — cached
    // on first use there; no dedicated barrier job (guide §1.2)
    val e = edges.select(col("src"), col("dst")).distinct().ckptLazy()
    e.as("ab")
      .join(e.as("bc"), col("ab.dst") === col("bc.src"))
      .join(
        e.as("ac"),
        col("ac.src") === col("ab.src") && col("ac.dst") === col("bc.dst"))
      .select(
        col("ab.src").as("a"),
        col("ab.dst").as("b"),
        col("bc.dst").as("c"))
  }

  /** k-truss: the maximal subgraph where every edge sits in ≥ k−2
    * triangles — the standard cohesive-core generalization one level
    * above [[triangleCounts]] (denser than k-core, cheaper than clique
    * enumeration; Cohen 2008). Iterative support peeling: count each
    * edge's triangles via the node-ordered [[triangles]] enumeration
    * (each triangle credits its 3 edges once), drop edges under
    * support k−2, repeat to FIXPOINT — with the [[ssspWeighted]]
    * convergence contract: throw rather than silently truncate if
    * `maxRounds` doesn't reach it. Peeling is monotone (edges only
    * leave), so extra rounds are no-ops — the property that lets a
    * fixed-depth unrolled oracle replay an exact fixpoint.
    * Scale shape: Θ(triangles) per round, per-round localCheckpoint;
    * rounds are small in practice (support cascades settle fast).
    */
  def ktruss(edges: DataFrame, k: Int, maxRounds: Int = 12): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    var cur = edges.select(col("src"), col("dst")).distinct().ckptLazy()
    var n = cur.count() // materializes the lazy checkpoint
    var round = 0
    while (round < maxRounds) {
      val tri = triangles(cur)
      val sup = tri
        .select(explode(array(
          struct(col("a").as("src"), col("b").as("dst")),
          struct(col("a").as("src"), col("c").as("dst")),
          struct(col("b").as("src"), col("c").as("dst")))).as("e"))
        .groupBy(col("e.src").as("src"), col("e.dst").as("dst"))
        .agg(count(lit(1)).as("support"))
      val next = sup.filter(col("support") >= k - 2)
        .select(col("src"), col("dst")).ckptLazy()
      val m = next.count() // the loop-condition action materializes it
      if (m == n) return next
      cur = next
      n = m
      round += 1
    }
    throw new IllegalStateException(
      s"k-truss peeling did not reach a fixpoint in $maxRounds rounds")
  }

  /** Single-source shortest-path COUNTS (the σ table of Brandes'
    * betweenness — how many distinct shortest paths reach each node):
    * layered BFS DP, σ(source) = 1, σ(v) = Σ σ(u) over dist-(d−1)
    * neighbors u. All-integer; σ is bounded by the product of layer
    * degrees and both engines throw loudly on BIGINT overflow (ANSI),
    * so a combinatorial blow-up cannot silently wrap. Throws (the sssp
    * convention) if the BFS frontier is still alive past `maxDepth` —
    * the fixed-unroll contract the oracle replays. Per-layer
    * localCheckpoint; Θ(edges) per layer.
    */
  def shortestPathCounts(edges: DataFrame, source: Long, maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().ckptLazy()
    var visited = Seq((source, 0, 1L)).toDF("node", "hops", "n_paths")
    var frontier = visited
    var d = 1
    var done = false
    while (!done) {
      val next = frontier.as("f")
        .join(sym.as("e"), col("f.node") === col("e.src"))
        .select(col("e.dst").as("node"), col("f.n_paths").as("p"))
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .groupBy(col("node"))
        .agg(lit(d).as("hops"), sum(col("p")).as("n_paths"))
        .select(col("node"), col("hops"), col("n_paths"))
        .ckptLazy()
      // full count, not limit(1): the lazy checkpoint must materialize
      // every partition anyway (completion job), and this IS the round's
      // one action
      if (next.count() == 0) done = true
      else if (d > maxDepth) {
        throw new IllegalStateException(
          s"BFS frontier still alive past maxDepth=$maxDepth")
      } else {
        visited = visited.unionAll(next).ckptLazy()
        frontier = next
        d += 1
      }
    }
    visited
  }

  /** Per-node triangle membership count plus the global summary a graph
    * health check wants: (node, n_triangles) for every node in ≥1
    * triangle.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val t = triangles(edges).ckptLazy() // 3 union branches of one sink
    t.select(col("a").as("node"))
      .unionAll(t.select(col("b")))
      .unionAll(t.select(col("c")))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Local clustering coefficient per node: 2·triangles /
    * (deg·(deg−1)) — how close each node's neighborhood is to a clique,
    * the standard community-tightness signal one level above
    * [[triangleCounts]]. Nodes of degree < 2 (coefficient undefined) are
    * omitted; nodes in no triangle report 0. One IEEE division on exact
    * integers — bit-reproducible cross-engine.
    */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().ckptLazy()
    val deg = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst")))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("deg"))
    deg
      .filter(col("deg") >= 2)
      .join(triangleCounts(e), Seq("node"), "left_outer")
      .select(
        col("node"),
        col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        ((coalesce(col("n_triangles"), lit(0L)) * lit(2.0)) /
          (col("deg") * (col("deg") - 1)).cast("double")).as("clustering_coeff"))
  }

  /** Per-edge neighborhood Jaccard similarity — the classic
    * link-prediction / graph-sparsification score: for each undirected
    * edge (src, dst), |N(src) ∩ N(dst)| / |N(src) ∪ N(dst)| over the
    * symmetrized adjacency. Common neighbors enumerate as wedges
    * src—w—dst via two equi-joins on the shared endpoint (the same
    * bounded wedge volume as [[triangleCounts]] — no cross join);
    * degrees join back on node id. The union size is
    * deg(src) + deg(dst) − common, ≥ 2 always (each endpoint is in the
    * other's neighborhood), so the division never degenerates.
    *
    * @param edges canonical (src < dst) edge list
    * @return (src, dst, n_common, jaccard)
    */
  def neighborJaccard(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().ckptLazy()
    val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val adj = sym.select(col("src").as("u"), col("dst").as("w"))
    val common = e
      .join(adj.withColumnRenamed("u", "src"), Seq("src"))
      .join(adj.select(col("u").as("dst"), col("w")), Seq("dst", "w"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("ni"))
    e
      .join(deg.withColumnRenamed("node", "src").withColumnRenamed("deg", "deg_a"), Seq("src"))
      .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("deg", "deg_b"), Seq("dst"))
      .join(common, Seq("src", "dst"), "left_outer")
      .select(
        col("src"), col("dst"),
        coalesce(col("ni"), lit(0L)).as("n_common"),
        round(
          coalesce(col("ni"), lit(0L)).cast("double") /
            (col("deg_a") + col("deg_b") - coalesce(col("ni"), lit(0L))).cast("double"),
          6).as("jaccard"))
  }

  /** Fixed-iteration PageRank over canonical (src < dst) edges, treated
    * undirected (contributions flow both ways). Deterministic to the
    * BIT across engines and partitionings: per-node contribution sums go
    * through 1e-15 FIXED-POINT integers (floor(x·1e15) summed as longs —
    * exact and order-insensitive, where a plain double sum varies with
    * aggregation order and a double→DECIMAL cast rounds differently per
    * engine: Spark casts via the shortest decimal string), and every
    * other step is a single IEEE op on identical inputs — so an oracle
    * can replay K iterations as K chained aggregations and hash-match
    * every score.
    *
    * Scale shape: the textbook iterative join — each round is one
    * (edges ⋈ ranks) shuffle on node id plus a map-side-combined sum;
    * ranks localCheckpoint per round (the iterative-lineage rule);
    * dangling mass is handled by the standard (1-d)/n floor since the
    * symmetrized graph has no zero-degree nodes by construction.
    *
    * @param k damping iterations (fixed count — convergence-check-free,
    *          so the result is a pure function of the graph)
    */
  def pagerank(edges: DataFrame, k: Int, damping: Double = 0.85): DataFrame = {
    // LAZY checkpoints throughout the fixed-k loop: each one still
    // truncates lineage and block-caches on first use, but the ONLY
    // blocking actions left are the one driver scalar (deg.count, which
    // also materializes sym) and the caller's sink — where the eager form
    // paid one serial barrier job per round (guide §1.2; measured round
    // 13: the barrier jobs were over half of q_graph_pagerank's wall).
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .ckptLazy()
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .ckptLazy()
    val n = deg.count()
    val base = lit(1.0 - damping) / n
    var ranks = deg.select(col("node"), (lit(1.0) / n).as("pr"), col("deg"))
    for (_ <- 1 to k) {
      val contrib = sym
        .join(ranks, sym("src") === ranks("node"))
        .select(col("dst").as("node"), floor((col("pr") / col("deg")) * 1e15).as("c"))
        .groupBy(col("node"))
        .agg((sum(col("c")).cast("double") / 1e15).as("acc"))
      ranks = deg
        .join(contrib, Seq("node"), "left_outer")
        .select(
          col("node"),
          (base + lit(damping) * coalesce(col("acc"), lit(0.0))).as("pr"),
          col("deg"))
        .ckptLazy()
    }
    ranks.select(col("node"), col("pr"))
  }

  /** Personalized PageRank: the random walk restarts at the SEED set
    * (teleport mass (1−d)/|S| on seeds, zero elsewhere) instead of
    * uniformly — the "importance relative to these nodes" signal behind
    * seed-expansion curation (find documents/domains close to a trusted
    * whitelist) and related-item retrieval. Same fixed-k, damped,
    * symmetrized-graph recipe as [[pagerank]] with the identical
    * floor(x·1e15) exact contribution sums; seeds not present in the
    * graph are ignored (loudly — require at least one survives).
    *
    * Scale shape: identical to [[pagerank]] — one edge-keyed shuffle
    * join per round plus a broadcast of the seed flag; scores never
    * leave the cluster; per-round localCheckpoint.
    */
  def personalizedPagerank(
      edges: DataFrame,
      seeds: DataFrame, // one column: node
      k: Int,
      damping: Double = 0.85): DataFrame = {
    // Same lazy-checkpoint regime as [[pagerank]]: the two driver scalars
    // (seed count, via the eagerly-needed `ns`) are the only pre-sink
    // actions; every per-round barrier job is absorbed by the sink.
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .ckptLazy()
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val seed = deg.join(broadcast(seeds.select(col("node"))), Seq("node"), "left_semi")
      .select(col("node"), lit(true).as("is_seed"))
    val ns = seed.count()
    require(ns > 0, "personalizedPagerank: no seed is present in the graph")
    val withTele = deg.join(broadcast(seed), Seq("node"), "left_outer")
      .select(col("node"), col("deg"),
        when(col("is_seed"), lit(1.0) / ns).otherwise(lit(0.0)).as("tele"))
      .ckptLazy()
    var ranks = withTele.select(col("node"), col("tele").as("pr"), col("deg"))
    for (_ <- 1 to k) {
      val contrib = sym
        .join(ranks, sym("src") === ranks("node"))
        .select(col("dst").as("node"), floor((col("pr") / col("deg")) * 1e15).as("c"))
        .groupBy(col("node"))
        .agg((sum(col("c")).cast("double") / 1e15).as("acc"))
      ranks = withTele
        .join(contrib, Seq("node"), "left_outer")
        .select(
          col("node"),
          (lit(1.0 - damping) * col("tele")
            + lit(damping) * coalesce(col("acc"), lit(0.0))).as("pr"),
          col("deg"))
        .ckptLazy()
    }
    ranks.select(col("node"), col("pr"))
  }

  /** Unweighted single-source shortest paths (BFS hop counts) from
    * `source` over the symmetrized edge set. Classic iterative frontier
    * expansion: each round joins the CURRENT frontier (not the whole
    * visited set) against the edges, anti-joins out already-settled
    * nodes, and settles the remainder at distance d+1 — so a round's
    * shuffle is proportional to the frontier fringe, and the loop runs
    * O(eccentricity) jobs, not O(V). Frontier and settled sets
    * localCheckpoint per round (the iterative-lineage rule). Unreachable
    * nodes are absent from the result, by construction.
    *
    * Fail-LOUD on hitting `maxIter` with a non-empty frontier: a
    * truncated BFS would silently report some nodes unreachable.
    */
  def bfsHops(edges: DataFrame, source: Long, maxIter: Int = 30): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .ckptLazy() // first round's count materializes it
    val spark = edges.sparkSession
    import spark.implicits._
    var settled = Seq((source, 0)).toDF("node", "hops")
    var frontier = settled
    // LAZY checkpoint + count(): the count action both materializes the
    // checkpoint blocks and yields the loop condition — one Spark job per
    // round where an eager checkpoint plus `isEmpty` was two.
    var frontierCount = 1L
    var iter = 0
    while (iter < maxIter && frontierCount > 0) {
      val next = sym
        .join(frontier, sym("src") === frontier("node"))
        .select(col("dst").as("node"))
        .distinct()
        .join(settled, Seq("node"), "left_anti")
        .select(col("node"), lit(iter + 1).as("hops"))
        .localCheckpoint(eager = false)
      frontierCount = next.count()
      // lazy: consumed by the NEXT round's anti-join (inside that round's
      // count job) and by the final output — no dedicated barrier job
      settled = settled.unionAll(next).ckptLazy()
      frontier = next
      iter += 1
    }
    if (frontierCount > 0)
      throw new IllegalStateException(
        s"bfsHops did not exhaust the frontier within $maxIter iterations; " +
          "raise maxIter (graph eccentricity exceeds it)")
    settled
  }

  /** Weighted single-source shortest paths over symmetrized
    * `(src, dst, cost)` edges — frontier-driven Bellman-Ford relaxation
    * (the delta-stepping family's shuffle-parallel core): each round
    * relaxes ONLY edges out of nodes whose distance improved last round,
    * takes the per-node min of (current best, new candidates), and the
    * improved nodes become the next frontier. Converged when a round
    * improves nothing; rounds are O(longest shortest-path edge count),
    * each one keyed equi-join + keyed min — no all-pairs anywhere.
    * Costs are INTEGER (exact min/compare semantics, engine-portable;
    * scale real-valued costs to fixed-point at the edge builder).
    *
    * Unlike [[bfsHops]], settled distances can improve in later rounds
    * (a longer-hop but cheaper path), so the anti-join trick does not
    * apply — the min-merge is the correctness core, the frontier is the
    * work bound. Negative costs are rejected: with the round cap this
    * would silently return wrong distances on negative cycles.
    *
    * Fail-LOUD on hitting `maxIter` with a non-empty frontier, same
    * contract as [[bfsHops]].
    */
  /** k-core extraction: the maximal subgraph in which every node keeps
    * degree ≥ k — iterative peeling (drop sub-k nodes, recompute degrees,
    * repeat to fixpoint), the standard cohesion filter for community /
    * spam-cluster analysis. Each round is one degree aggregate plus two
    * semi-joins on the node key — work shrinks monotonically with the
    * surviving edge set, rounds are O(peeling depth), no all-pairs
    * anywhere. Per-round `localCheckpoint` truncates the growing plan
    * (the connected-components lesson). Returns surviving (node, deg)
    * with IN-CORE degrees. Fails LOUD if the peeling hasn't converged
    * within `maxIter` rounds rather than returning a non-core superset.
    */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 30): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .ckptLazy() // materialized by the first cur.count()
    var cur = sym
    var curCount = cur.count()
    var converged = false
    var iter = 0
    // maxIter + 1 rounds: a peel needing exactly maxIter CHANGING rounds
    // still gets its no-change detection round — otherwise a fixpoint
    // reached at the budget would fail loud despite being correct.
    while (!converged && iter < maxIter + 1) {
      val keep = cur
        .groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("node"))
        .ckptLazy() // both semi-join probes run inside the round's count job
      val next = cur
        .join(keep.withColumnRenamed("node", "__ks"), col("src") === col("__ks"), "left_semi")
        .join(keep.withColumnRenamed("node", "__kd"), col("dst") === col("__kd"), "left_semi")
        .localCheckpoint(eager = false)
      val nextCount = next.count()
      converged = nextCount == curCount
      cur = next
      curCount = nextCount
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"kCore peeling did not reach a fixpoint within $maxIter rounds")
    cur.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) for community
    * detection, made fully deterministic: seed label(v) = v, then for a
    * FIXED number of rounds every node adopts its neighbors' plurality
    * label with ties broken toward the smaller label — argmax by
    * (count DESC, label ASC), no randomness, no asynchrony, so the whole
    * assignment is engine-replayable and hash-checkable. Each round is
    * one equi-join on the node key + one bounded (node, label) aggregate
    * + one per-node top-1 window over the SAME partitioning; per-round
    * `localCheckpoint` truncates lineage. Fixed rounds (not
    * to-convergence) is the honest contract: synchronous LPA can
    * oscillate on bipartite structures, and at 100 TB you budget rounds,
    * not fixpoints.
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Lazy-checkpointed fixed-round loop (the [[pagerank]] regime): zero
    // pre-sink actions; each round's labels still truncate lineage and
    // cache on first use inside the sink job.
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .ckptLazy()
    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    val w = Window.partitionBy(col("nn")).orderBy(col("c").desc, col("label").asc)
    (1 to rounds).foreach { _ =>
      labels = sym
        .join(labels, sym("src") === labels("node"))
        .groupBy(col("dst").as("nn"), col("label"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("nn").as("node"), col("label"))
        .ckptLazy()
    }
    labels
  }

  /** Per-community Newman modularity contributions for a given
    * partition: q_term = L_c/m_dir − (D_c/m_dir)² over the symmetrized
    * unit-weight graph (m_dir = directed edge count = 2m, L_c =
    * directed intra-community edges = 2·undirected, D_c = degree sum —
    * the standard Q decomposes identically in directed-symmetric
    * counts). The community-quality audit for [[labelPropagation]] /
    * connected components: is the detected structure better than the
    * degree-preserving random graph. Emitted PER COMMUNITY (exact
    * BIGINT counts + one IEEE q_term each) — summing Q engine-side
    * would make the result order-dependent across engines; consumers
    * (and the oracle) sum the terms themselves. The q_term is emitted
    * UNROUNDED: the int→double casts are exact and the div/mul/sub
    * chain is IEEE-defined, so the raw bits match any engine — whereas
    * `round(DOUBLE, 6)` semantics differ across DuckDB builds (the
    * round-9 driver-red lesson; the driver's build rounds a boundary
    * cell the other way from local 1.0.0). One scalar driver
    * count() for m_dir; joins are label-key equi-joins, degree sums one
    * shuffle each — never a pair join beyond the edge list itself.
    */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .ckptLazy()
    val md = sym.count().toDouble // materializes sym
    // lazy: lab feeds both label joins, e feeds intra + deg — all inside
    // the single sink action, cached on first use there
    val lab = labels.select(col("node"), col("label").as("community")).ckptLazy()
    val la = lab.select(col("node").as("src"), col("community").as("ca"))
    val lb = lab.select(col("node").as("dst"), col("community").as("cb"))
    val e = sym.join(la, "src").join(lb, "dst").ckptLazy()
    val intra = e.filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(count(lit(1)).as("intra_edges"))
    val deg = e.groupBy(col("ca").as("community")).agg(count(lit(1)).as("degree_sum"))
    val nn = lab.groupBy(col("community")).agg(count(lit(1)).as("n_nodes"))
    nn.join(deg, Seq("community"))
      .join(intra, Seq("community"), "left")
      .select(
        col("community"),
        col("n_nodes"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        col("degree_sum"),
        (coalesce(col("intra_edges"), lit(0L)).cast("double") / md
          - (col("degree_sum").cast("double") / md)
            * (col("degree_sum").cast("double") / md)).as("q_term"))
  }

  /** HITS hubs & authorities (Kleinberg) over a DIRECTED edge set, k
    * mutual-reinforcement iterations with L1 normalization per half-step:
    * auth(v) = Σ_{u→v} hub(u), hub(u) = Σ_{u→v} auth(v), each rescaled to
    * sum 1. On a bipartite src→dst graph (supplier→part, user→domain)
    * this separates "prolific pointers" from "widely pointed-at" — the
    * two-sided importance signal PageRank's single score conflates.
    *
    * Node ids must be globally unique across both sides (callers tag the
    * sides when keys can collide). Nodes with no out-edges get hub 0,
    * nodes with no in-edges auth 0 — they still appear.
    *
    * Scale shape: each half-iteration is one edge-keyed shuffle join plus
    * a 1-row normalizer broadcast; scores stay on the nodes (never
    * collected), iterations localCheckpoint (the iterative-lineage rule).
    * Contribution and normalizer sums go through floor(x·1e15) integers
    * summed as DECIMAL(38,0) — order-insensitive and exact at ANY edge
    * count (a BIGINT sum overflows past ~9k unnormalized contributions;
    * DuckDB's SUM(BIGINT) is already HUGEINT) — so every score is
    * reproducible bit-for-bit across partitionings and engines.
    */
  def hits(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "hits: need at least one iteration")
    // Fully lazy-checkpointed loop (the [[pagerank]] regime): with eager
    // per-half-step checkpoints this operator ran ~9 serial barrier jobs
    // before the sink (2 per iteration + 3 setup) — the suite-worst
    // q_graph_hits spent most of its wall there. Lazy checkpoints keep
    // the same lineage truncation and block reuse (each intermediate is
    // still cached on first use inside the sink job; the per-half-step
    // L1 normalizer consumes each aggregate twice), with zero pre-sink
    // actions.
    val e = edges.select(col("src"), col("dst")).distinct().ckptLazy()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .ckptLazy()
    def l1(df: DataFrame, c: String): DataFrame = {
      val tot = df.agg(
        (sum(floor(col(c) * 1e15).cast("decimal(38,0)")).cast("double") / 1e15)
          .as("__tot"))
      df.crossJoin(broadcast(tot))
        .select(col("node"), (col(c) / col("__tot")).as(c))
    }
    var hub = nodes.select(col("node"), lit(1.0).as("hub"))
    var auth = hub.select(col("node"), col("hub").as("auth"))
    for (_ <- 1 to k) {
      val a = e.join(hub, e("src") === hub("node"))
        .select(col("dst").as("node"),
          floor(col("hub") * 1e15).cast("decimal(38,0)").as("c"))
        .groupBy(col("node"))
        .agg((sum(col("c")).cast("double") / 1e15).as("auth"))
      auth = l1(a.ckptLazy(), "auth").ckptLazy()
      val h = e.join(auth, e("dst") === auth("node"))
        .select(e("src").as("node"),
          floor(col("auth") * 1e15).cast("decimal(38,0)").as("c"))
        .groupBy(col("node"))
        .agg((sum(col("c")).cast("double") / 1e15).as("hub"))
      hub = l1(h.ckptLazy(), "hub").ckptLazy()
    }
    nodes
      .join(hub, Seq("node"), "left")
      .join(auth, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("hub"), lit(0.0)).as("hub"),
        coalesce(col("auth"), lit(0.0)).as("auth"))
  }

  def ssspWeighted(edges: DataFrame, source: Long, maxIter: Int = 30): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    if (edges.filter(col("cost") < 0 || col("cost").isNull).limit(1).count() > 0)
      throw new IllegalArgumentException("ssspWeighted requires non-negative, non-null costs")
    val sym = edges.select(col("src"), col("dst"), col("cost"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst"), col("cost")))
      .groupBy(col("src"), col("dst")).agg(min(col("cost")).as("cost"))
      .ckptLazy() // first round's improved-count action materializes it
    var dist = Seq((source, 0L)).toDF("node", "dist")
    var frontier = dist
    // one action per round: the improved-count scan materializes the lazy
    // checkpoint AND drives the loop condition (no separate isEmpty job)
    var improvedCount = 1L
    var iter = 0
    while (iter < maxIter && improvedCount > 0) {
      val cand = sym
        .join(frontier, sym("src") === frontier("node"))
        .select(col("dst").as("node"), (col("dist") + col("cost")).as("dist"))
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      val merged = dist.select(col("node"), col("dist"), lit(true).as("__old"))
        .join(cand.select(col("node"), col("dist").as("__cand")), Seq("node"), "full_outer")
        .select(
          col("node"),
          when(col("dist").isNull || col("__cand") < col("dist"), col("__cand"))
            .otherwise(col("dist")).as("dist"),
          (col("__old").isNull || col("__cand") < col("dist")).as("__improved"))
        .localCheckpoint(eager = false)
      improvedCount = merged.filter(col("__improved")).count()
      frontier = merged.filter(col("__improved")).select(col("node"), col("dist"))
      dist = merged.select(col("node"), col("dist"))
      iter += 1
    }
    if (improvedCount > 0)
      throw new IllegalStateException(
        s"ssspWeighted did not converge within $maxIter rounds; raise maxIter " +
          "(longest shortest path exceeds it)")
    dist
  }

  /** Resource-allocation link prediction — for each NON-edge pair (u, v)
    * with ≥ `minCommon` common neighbors, RA(u,v) = Σ_{z ∈ N(u)∩N(v)}
    * 1/deg(z) (Zhou/Lü/Zhang 2009's strongest local index; the
    * recommend-new-links / infer-missing-edges primitive that
    * [[neighborJaccard]] scores for EXISTING edges).
    *
    * Candidate pairs enumerate as wedges u—z—v (u < v) through each
    * middle node z, then anti-join the known edge list; the wedge volume
    * is Σ deg(z)², so middle nodes with deg(z) > `maxMiddleDeg` are
    * excluded up front (the hot-key cap discipline — a hub middle would
    * contribute d² pairs yet at most 1/d score each; the truncation
    * under-counts any pair's score by < n_hubs/maxMiddleDeg, and the cap
    * is replayed identically by the oracle so results stay exact).
    *
    * Portability: the score accumulates as Σ (10^12 div deg(z)) — exact
    * order-insensitive BIGINTs (the pagerank fixed-point convention);
    * `ra_score` is then ONE IEEE division of that integer by 1e12.
    *
    * @param edges canonical (src < dst) edge list
    * @return (src, dst, n_common, ra_pico, ra_score), non-edges only
    */
  def resourceAllocation(
      edges: DataFrame,
      minCommon: Int = 2,
      maxMiddleDeg: Long = 64L): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().ckptLazy()
    val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    // adjacency keyed by the middle node, hubs capped out, carrying the
    // middle's integer resource unit 10^12 div deg(z)
    val adj = sym.select(col("src").as("z"), col("dst").as("u"))
      .join(deg.withColumnRenamed("node", "z"), Seq("z"))
      .filter(col("deg") <= maxMiddleDeg)
      .select(col("z"), col("u"), expr("1000000000000L div deg").as("unit"))
      .ckptLazy() // both wedge-join sides of the one sink action
    val pairs = adj.as("a")
      .join(adj.select(col("z"), col("u").as("v")).as("b"), Seq("z"))
      .filter(col("u") < col("v"))
      .groupBy(col("u").as("src"), col("v").as("dst"))
      .agg(count(lit(1)).as("n_common"), sum(col("unit")).as("ra_pico"))
      .filter(col("n_common") >= minCommon)
    pairs
      .join(e, Seq("src", "dst"), "left_anti")
      .select(col("src"), col("dst"), col("n_common"), col("ra_pico"),
        (col("ra_pico").cast("double") / lit(1e12)).as("ra_score"))
  }
}
