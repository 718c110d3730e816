package graft.operators

import graft.engine.PlanOnly.syntax._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained logistic-regression quality classifier over hashed n-gram
  * features — the CCNet/GPT-3-style discriminative filter tier of the
  * quality story (round-12 verdict #5): the repo already has the
  * generative scorer (naive Bayes), calibration and threshold sweep;
  * this is the missing TRAINED discriminative filter ("does this doc
  * look like the target domain?") that production pipelines fit on a
  * bounded sample and then serve corpus-wide.
  *
  * Portability design — FIXED-POINT INTEGER gradient descent, so the
  * full k-round training trajectory is exactly replayable as chained
  * MATERIALIZED CTEs (the unigram-LM EM discipline):
  *   - features are hashed-unigram COUNTS in [[Buckets]] buckets
  *     (portable 60-bit md5 bucket hash) plus an intercept bucket −1;
  *   - the sigmoid is the HARD sigmoid in micro-units,
  *     p = clamp(500000 + ⌊z/4⌋, 0, 1e6) — piecewise-INTEGER, so there
  *     is no transcendental anywhere in training or serving (the
  *     quantized-NN approximation; in saturation the update degrades
  *     to the perceptron rule, which is the standard behavior);
  *   - full-batch GD (order-insensitive integer sums, no SGD ordering);
  *     w ← w + ⌊g / (EtaDen·n)⌋ with FLOOR division via the pmod
  *     identity, identical on engines whose native integer division
  *     disagrees on negatives (Spark `div` truncates, DuckDB `//`
  *     floors).
  *
  * Scale shape: training runs on the caller's doc sample (the model is
  * 65 integers; n docs × 65 buckets of integer sums per round — one
  * shuffle per round, k fixed). SERVING is one broadcast join of the
  * 65-row weight table against per-doc bucket counts: linear, no
  * shuffle beyond the per-doc count aggregate, exactly how a 100 TB
  * corpus-wide quality sweep wants to run.
  *
  * Reference analog: none — callysto has no ML surface (SURVEY §2.5);
  * this extends the LLM-data-pipeline curation family.
  */
object QualityLr {

  /** Hashed feature buckets (the model is Buckets + 1 integers). */
  val Buckets = 64

  /** Full-batch GD rounds — fixed and unrolled in the oracle. */
  val Rounds = 3

  /** Step denominator: w += floor(g / (EtaDen·n)), i.e. η = 1/EtaDen of
    * the mean residual-weighted feature mass.
    */
  val EtaDen = 8L

  /** Portable 60-bit md5 hash (always positive — the Dedup convention). */
  private def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** floor(a / m) for m > 0, engine-portable: a − pmod(a, m) is exactly
    * divisible by m, and every operand here stays far under 2^53 (see
    * the magnitude notes at each call site), so the DOUBLE division is
    * IEEE-exact on both engines (DuckDB replays it as
    * (a − ((a%m)+m)%m) / m with the same exactness).
    */
  private def fdiv(a: Column, m: Column): Column =
    ((a - pmod(a, m)) / m).cast("long")

  private def hardSigMicro(z: Column): Column =
    least(greatest(lit(500000L) + fdiv(z, lit(4L)), lit(0L)), lit(1000000L))

  /** (doc_id, b, x): LENGTH-NORMALIZED hashed unigram features in fixed
    * point — x = ⌊cnt·10⁶ / len⌋ (the per-doc feature vector sums to
    * ~10⁶ regardless of document length), plus the intercept bucket −1
    * with x = 10⁶. Normalization is what keeps z in the hard-sigmoid's
    * live region: with raw counts the first step scales with document
    * length and the model saturates to the majority class in one round.
    */
  def features(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tk"))
    val lens = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("len"))
    val counts = tok
      .groupBy(col("doc_id"), pmod(hash60(col("tk")), lit(Buckets.toLong)).as("b"))
      .agg(count(lit(1)).as("cnt"))
      .join(lens, Seq("doc_id"))
      .select(col("doc_id"), col("b"),
        // cnt·10⁶ ≤ 10⁶·len ≤ ~10⁹ per doc — far under 2^53
        fdiv(col("cnt") * 1000000L, col("len")).as("x"))
    counts.unionByName(
      docs.select(col("doc_id"), lit(-1L).as("b"), lit(1000000L).as("x")))
  }

  /** Binary target: y = 1 iff lang = 'en' (the "target domain"
    * discriminator — swap the predicate for a wiki-vs-web label column
    * in production).
    */
  def labels(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(col("lang") === "en", lit(1L)).otherwise(lit(0L)).as("y"))

  /** Train [[Rounds]] rounds of hard-sigmoid full-batch GD on the given
    * feature/label tables; returns the FULL weight trajectory
    * (round, b, w_micro) — rounds 1..k × buckets −1..Buckets−1.
    */
  def train(feats: DataFrame, labs: DataFrame): DataFrame = {
    val spark = feats.sparkSession
    val f = feats.join(labs, Seq("doc_id")).ckptLazy() // feeds every round twice
    // one driver scalar (bounded count — the q_graph_sssp precedent):
    // the step denominator must be a literal in integer arithmetic
    val n = labs.select(col("doc_id")).distinct().count()
    require(n > 0, "empty training set")
    val spine = spark.range(-1L, Buckets.toLong).select(col("id").as("b"))
    var w = spine.select(col("b"), lit(0L).as("w"))
    val rounds = (1 to Rounds).map { r =>
      // z_raw = Σ w·x is in micro² units (w micro × x micro-normalized);
      // ≤ 65 buckets × |w| × 10⁶ — under 2^53 for any |w| < 10⁸
      val zdoc = f.join(broadcast(w), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(sum(col("w") * col("x")).as("zr"), min(col("y")).as("y"))
        .select(col("doc_id"), col("y"), fdiv(col("zr"), lit(1000000L)).as("z"))
      val resid = zdoc.select(col("doc_id"),
        (col("y") * 1000000L - hardSigMicro(col("z"))).as("resid"))
      // g is micro² (resid micro × x micro); |g| ≤ 10⁶ · Σ_docs x_b —
      // with Σ_b x = 10⁶/doc that is ≤ 10¹²·n/64 per bucket, and the
      // SUM itself is exact BIGINT on both engines; only the final
      // floor-step divides (operands < 2^53 for n up to ~10⁵ docs,
      // which bounds the SAMPLE the model trains on, not the corpus)
      val g = resid.join(f.select(col("doc_id"), col("b"), col("x")), Seq("doc_id"))
        .groupBy(col("b")).agg(sum(col("resid") * col("x")).as("g"))
      w = spine
        .join(g, Seq("b"), "left")
        .join(w, Seq("b"))
        .select(col("b"),
          (col("w") + fdiv(coalesce(col("g"), lit(0L)), lit(EtaDen * n * 1000000L))).as("w"))
        .ckptLazy() // sequential rounds: each reads its predecessor twice
      w.select(lit(r).as("round"), col("b"), col("w").as("w_micro"))
    }
    rounds.reduce(_.unionByName(_))
  }

  /** Score docs under a (b, w_micro) weight table: (doc_id, z_micro,
    * p_micro, pred). One broadcast join — the corpus-wide serving shape.
    */
  def score(feats: DataFrame, weights: DataFrame): DataFrame =
    feats.join(broadcast(weights.select(col("b"), col("w_micro"))), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("w_micro") * col("x")).as("zr"))
      .select(col("doc_id"), fdiv(col("zr"), lit(1000000L)).as("z_micro"))
      .select(col("doc_id"), col("z_micro"),
        hardSigMicro(col("z_micro")).as("p_micro"))
      .withColumn("pred",
        when(col("p_micro") >= 500000L, lit(1L)).otherwise(lit(0L)))
}
