package graft

import org.apache.spark.sql.functions._

import graft.operators.Graphs

/** Weighted SSSP semantics on hand-checkable graphs — the cases the
  * oracle-checked co-purchase query can't isolate: a cheaper many-hop
  * path must beat a costly direct edge (the later-round improvement BFS's
  * anti-join would wrongly freeze), parallel edges collapse to min cost,
  * and the guard rails (negative cost, round cap) fail loud.
  */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def edges(rows: (Long, Long, Long)*) =
    rows.toDF("src", "dst", "cost")

  test("ssspWeighted: cheap long path beats costly direct edge") {
    // 1→3 direct costs 100; 1→2→3 costs 20; 1→4→5→3 costs 3
    val e = edges((1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 100L),
      (1L, 4L, 1L), (4L, 5L, 1L), (5L, 3L, 1L))
    val d = Graphs.ssspWeighted(e, 1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 10L, 3L -> 3L, 4L -> 1L, 5L -> 2L))
  }

  test("ssspWeighted: symmetrization, parallel-edge min, unreachable absent") {
    val e = edges((2L, 1L, 5L), (1L, 2L, 3L), (7L, 8L, 1L)) // 7-8 disconnected
    val d = Graphs.ssspWeighted(e, 1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 3L)) // edges work both ways; min of parallel costs
  }

  test("ssspWeighted: zero-cost edges are legal, negative costs rejected") {
    val d = Graphs.ssspWeighted(edges((1L, 2L, 0L)), 1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 0L))
    intercept[IllegalArgumentException] {
      Graphs.ssspWeighted(edges((1L, 2L, -1L)), 1L)
    }
  }

  test("ssspWeighted fails loud when the round cap truncates the search") {
    val chain = edges((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    intercept[IllegalStateException] {
      Graphs.ssspWeighted(chain, 1L, maxIter = 2).collect()
    }
    // and the same graph converges with headroom
    assert(Graphs.ssspWeighted(chain, 1L, maxIter = 10).count() == 4)
  }

  test("ssspWeighted matches bfsHops on unit costs") {
    val e = edges((1L, 2L, 1L), (2L, 3L, 1L), (1L, 4L, 1L), (4L, 3L, 1L))
    val sssp = Graphs.ssspWeighted(e, 1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bfs = Graphs.bfsHops(e.select($"src", $"dst"), 1L).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(sssp == bfs)
  }

  test("kCore: peeling cascades (pendant removal demotes its neighbor) and keeps the clique") {
    // 4-clique {1,2,3,4}; node 5 hangs off 1 and 2 (degree 2); node 6
    // hangs off 5 (degree 1). Removing 6 drops 5 to degree 2; removing 5
    // doesn't affect the clique. The 3-core is exactly the clique.
    val e = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 1L), (5L, 2L), (6L, 5L)
    ).toDF("src", "dst")
    val core = Graphs.kCore(e, k = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore: k above the densest structure peels everything to the empty graph") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    assert(Graphs.kCore(e, k = 3).isEmpty)
  }

  test("labelPropagation: two cliques joined by one bridge settle into two communities") {
    // cliques {1,2,3,4} and {10,11,12,13}; single bridge 4–10
    def clique(ids: Seq[Long]) = for { a <- ids; b <- ids if a < b } yield (a, b)
    val e = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)) :+ ((4L, 10L)))
      .toDF("src", "dst")
    val out = Graphs.labelPropagation(e, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L))
    // each clique agrees on one label, and the two labels differ
    val left  = Set(1L, 2L, 3L, 4L).map(out)
    val right = Set(10L, 11L, 12L, 13L).map(out)
    assert(left.size == 1, s"left clique split: $left")
    assert(right.size == 1, s"right clique split: $right")
    assert(left != right, "bridge merged the communities")
  }

  test("labelPropagation is deterministic across runs") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)).toDF("src", "dst")
    val a = Graphs.labelPropagation(e, rounds = 3).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Graphs.labelPropagation(e, rounds = 3).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("hits: authorities collect in-links, hubs collect out-links, L1 halves sum to 1") {
    // directed 1→3, 2→3, 2→4: node 3 is the stronger authority (two
    // in-links), node 2 the stronger hub (two out-links); pure sources
    // have auth 0, pure sinks hub 0.
    val e = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val m = Graphs.hits(e, k = 2).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(m.keySet == Set(1L, 2L, 3L, 4L))
    val (hub, auth) = (m.view.mapValues(_._1).toMap, m.view.mapValues(_._2).toMap)
    assert(auth(3L) > auth(4L) && auth(4L) > 0.0)
    assert(auth(1L) == 0.0 && auth(2L) == 0.0)
    assert(hub(2L) > hub(1L) && hub(1L) > 0.0)
    assert(hub(3L) == 0.0 && hub(4L) == 0.0)
    assert(math.abs(hub.values.sum - 1.0) < 1e-9, s"hub mass ${hub.values.sum}")
    assert(math.abs(auth.values.sum - 1.0) < 1e-9, s"auth mass ${auth.values.sum}")
  }

  test("personalizedPagerank concentrates mass near the seed; missing seeds fail loud") {
    // path 1-2-3-4-5, seed {1}. Finite-k walk parity makes strict
    // per-hop monotonicity false on a path (even distances hold more
    // mass after even k), so assert the parity-robust properties: the
    // seed dominates, both far nodes sit below both near nodes, total
    // mass is conserved at 1, and the seed holds far more than the
    // uniform 1/5 share.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val pr = Graphs.personalizedPagerank(e, seeds, k = 6).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(1L) == pr.values.max, s"seed not dominant: $pr")
    assert(pr(1L) > 0.3, s"seed below concentration bound: $pr")
    assert(Seq(pr(4L), pr(5L)).max < Seq(pr(2L), pr(3L)).min,
      s"far nodes not below near nodes: $pr")
    assert(math.abs(pr.values.sum - 1.0) < 1e-9, s"mass not conserved: ${pr.values.sum}")
    intercept[IllegalArgumentException] {
      Graphs.personalizedPagerank(e, Seq(Tuple1(99L)).toDF("node"), k = 1)
    }
  }
}
