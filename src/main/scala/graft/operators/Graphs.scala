package graft.operators

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
    val g = df.select(col(groupCol).as("g"), col(itemCol).as("i")).distinct()
    g.as("a")
      .join(g.as("b"), col("a.g") === col("b.g") && col("a.i") < col("b.i"))
      .groupBy(col("a.i").as("src"), col("b.i").as("dst"))
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
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
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

  /** Per-node triangle membership count plus the global summary a graph
    * health check wants: (node, n_triangles) for every node in ≥1
    * triangle.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val t = triangles(edges).localCheckpoint()
    t.select(col("a").as("node"))
      .unionAll(t.select(col("b")))
      .unionAll(t.select(col("c")))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
