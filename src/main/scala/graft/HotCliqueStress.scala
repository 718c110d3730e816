package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Graft
import graft.operators.Similarity

/** Planted hot-clique stress for the corpus-scaled sign-LSH cell family
  * ([[Similarity.knnGraphLsh]] / [[Similarity.hardNegativesLsh]]) — the
  * regime [[ScaleStress]]'s synthesized tier deliberately excludes: its
  * copies are PERTURBED so cross-copy rows are not near-duplicates,
  * which keeps dup density constant but means the verbatim-direction
  * clique (the input that defeats hyperplane splitting) is never
  * measured. Round-8 verdict: after adding the hot-cell cap, measure it.
  *
  * Fixture: n vectors, a fixed 5% sharing ONE direction (positive
  * per-row scales — identical sign-LSH cell at any plane count), the
  * rest pseudo-random via xxhash64 (direction-spread). Tiers grow n 4×
  * twice; the clique grows with n, so:
  *  - UNCAPPED (capFactor effectively ∞) the within-cell join computes
  *    the full clique² — pair shuffle grows quadratically in n;
  *  - CAPPED (targetCell 64 · capFactor 8 = 512-candidate bound) pair
  *    work is clique · 512 — linear in n.
  * Shuffle bytes do NOT meter this family: the rank-k filter plans as
  * map-side WindowGroupLimit, so the exchange carries ~n·k rows even
  * when the within-join compute is quadratic (measured: 16M uncapped
  * pairs shuffled <1 MB). The honest meter is the CANDIDATE PAIR COUNT
  * itself — counted directly off [[Similarity.cappedCellSides]]'
  * join sides per tier — plus wall time. Output: one JSON line with
  * per-tier time/pairs and fitted exponents: pairs ≈ clique·cap →
  * exponent ≈ 1 capped; ≈ clique² → ≈ 2 uncapped.
  */
object HotCliqueStress {

  /** n vectors, first 5% one shared direction (hot clique), rest spread.
    * Pure column expressions (deterministic, codegen) — no driver loop.
    */
  private def corpus(spark: SparkSession, n: Long): DataFrame = {
    val cliqueN = n / 20
    val dir = array((0 until 64).map(d => lit((math.sin(d + 1.0) + 1.5).toFloat)): _*)
    val scale = (lit(1.0f) + (col("id") % 7).cast("float") * lit(0.1f))
    val spread = transform(
      sequence(lit(1), lit(64)),
      d => ((pmod(xxhash64(col("id"), d), lit(2000001L)).cast("double")
        / lit(1000000.5)) - lit(1.0)).cast("float"))
    spark.range(n).select(
      col("id").as("vec_id"),
      when(col("id") < cliqueN, transform(dir, x => x * scale)).otherwise(spread)
        .as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val spark = Graft.session("graft-hot-clique-stress")
    val tiers = Seq(20000L, 80000L, 320000L)
    // variant -> capFactor (targetCell 64: cap = 512 vs no cap)
    val variants = Seq("capped" -> 8, "uncapped" -> (1 << 20))
    val results = scala.collection.mutable.Map.empty[(String, Long), (Double, Long)]
    // warmup
    Similarity.knnGraphLsh(corpus(spark, 5000L), "vec_id", "embedding", k = 3,
      targetCell = 64, capFactor = 8)
      .write.mode("overwrite").format("noop").save()
    for (n <- tiers; (variant, cf) <- variants) {
      // the uncapped top tier's 16k-clique join is the demonstrated
      // blow-up (256M pairs); cap runtime by skipping it — two tiers
      // establish the uncapped exponent
      if (!(variant == "uncapped" && n > 80000L)) {
        val data = corpus(spark, n).localCheckpoint()
        val t0 = System.nanoTime()
        Similarity.knnGraphLsh(data, "vec_id", "embedding", k = 3,
          targetCell = 64, capFactor = cf)
          .write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        // the quantity the cap bounds, counted off the same join sides
        val (aS, bS, _) = Similarity.cappedCellSides(
          data, "vec_id", "embedding", Nil, 64L, 64, cf)
        val pairs = aS.select(col("__cell"), col("vec_id").as("src"))
          .join(bS.select(col("__cell"), col("vec_id").as("dst")), Seq("__cell"))
          .filter(col("src") =!= col("dst")).count()
        spark.catalog.clearCache()
        results((variant, n)) = (sec, pairs)
        System.err.println(
          f"[clique] $variant%-9s n=$n%7d clique=${n / 20}%6d sec=$sec%8.2f pairs=$pairs%12d")
      }
    }
    spark.stop()
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.OFF)
    def fit(variant: String, lo: Long, hi: Long, f: ((Double, Long)) => Double): Double =
      math.log(f(results((variant, hi))) / f(results((variant, lo)))) /
        math.log(hi.toDouble / lo)
    val cells = results.toSeq.sortBy { case ((v, n), _) => (v, n) }.map {
      case ((v, n), (sec, pairs)) => s""""${v}_$n":{"sec":$sec,"pairs":$pairs}"""
    }.mkString(",")
    val expCap = fit("capped", 80000L, 320000L, _._2.toDouble.max(1.0))
    val expUncap = fit("uncapped", 20000L, 80000L, _._2.toDouble.max(1.0))
    val expCapT = fit("capped", 80000L, 320000L, _._1)
    val expUncapT = fit("uncapped", 20000L, 80000L, _._1)
    println(
      s"""{"metric":"hot_clique_stress",$cells,"exp_pairs_capped":$expCap,"exp_pairs_uncapped":$expUncap,"exp_time_capped":$expCapT,"exp_time_uncapped":$expUncapT}""")
    System.out.flush()
  }
}
