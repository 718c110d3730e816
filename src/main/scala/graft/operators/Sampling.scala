package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling operators for training-data pipelines.
  *
  * Both are hash-based rather than RNG-stream-based: the keep decision is
  * a pure function of (row key, seed), so results are identical across
  * partitionings, retries, and cluster sizes — the property that matters
  * when a 100 TB sample must be reproducible and resumable. (Spark's
  * built-in `sample`/`sampleBy` draw from per-partition RNG streams, which
  * reshuffle under repartitioning.)
  */
object Sampling {

  /** Deterministic Bernoulli sample: keep a row iff
    * xxhash64(key, seed) mod 1e6 < fraction * 1e6.
    */
  def bernoulli(df: DataFrame, keyCol: String, fraction: Double, seed: Int): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    val bucket = pmod(xxhash64(col(keyCol), lit(seed)), lit(1000000L))
    df.filter(bucket < (fraction * 1e6).toLong)
  }

  /** Hex threshold for a portable md5 gate: the first 4 lowercase-hex
    * chars of md5 compare lexicographically exactly as the 16-bit value
    * they encode, so `hexPrefix < threshold` keeps ~fraction of keys in
    * ANY engine with md5 — no engine-specific hash in the decision.
    * Public so oracle SQL can be built from the SAME cut points.
    */
  def hexThreshold(fraction: Double): String =
    f"${math.min((fraction * 65536).toLong, 65535L)}%04x"

  private def md5Prefix(keyCol: String, seed: Int) =
    substring(md5(concat(col(keyCol).cast("string"), lit(":" + seed))), 1, 4)

  /** fraction = 1.0 must keep EVERY row: the strict-< hex gate saturates
    * at "ffff" and would drop the ~1/65536 of keys hashing exactly there.
    * Fractions below the gate's 2^-16 granularity would silently keep
    * NOTHING — fail loudly and point at the finer-grained xxhash path.
    */
  private def md5Gate(keyCol: String, fraction: Double, seed: Int): Column =
    if (fraction >= 1.0) lit(true)
    else if (fraction <= 0.0) lit(false)
    else {
      require(
        fraction >= 1.0 / 65536,
        s"portable md5 gate granularity is 2^-16; fraction $fraction would keep nothing " +
          "— use Sampling.bernoulli (xxhash64, 1e-6 granularity) instead")
      md5Prefix(keyCol, seed) < lit(hexThreshold(fraction))
    }

  /** Portable deterministic Bernoulli sample (md5 gate). Same
    * reproducibility guarantees as [[bernoulli]], but the keep decision is
    * expressible verbatim in other engines (the DuckDB oracle replays it);
    * costs a string md5 per row instead of a codegen'd xxhash64.
    */
  def bernoulliPortable(df: DataFrame, keyCol: String, fraction: Double, seed: Int): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    df.filter(md5Gate(keyCol, fraction, seed))
  }

  /** Portable deterministic stratified sample: per-stratum md5 gates.
    * Strata absent from the map are dropped.
    */
  def stratifiedPortable(
      df: DataFrame,
      strataCol: String,
      fractions: Map[String, Double],
      keyCol: String,
      seed: Int
  ): DataFrame = {
    val gate = fractions.foldLeft(lit(false)) { case (acc, (stratum, f)) =>
      acc || (col(strataCol) === stratum && md5Gate(keyCol, f, seed))
    }
    df.filter(gate)
  }

  /** SQL expression (DuckDB-compatible) of [[md5Prefix]], for oracles that
    * must replay the gate verbatim.
    */
  def md5PrefixSql(keyExpr: String, seed: Int): String =
    s"substr(md5(CAST($keyExpr AS VARCHAR) || ':$seed'), 1, 4)"

  /** Deterministic portable multi-way split (train/val/test): each key's
    * 16-bit md5 prefix falls between cumulative-weight cut points, so the
    * assignment is a pure function of (key, seed) — reproducible across
    * partitionings, engines, and reruns, and any engine with md5 can
    * replay it (the property that matters when the SAME 100 TB split must
    * be honored by every downstream consumer forever). Adds a `split`
    * column. Weights must sum to 1.
    */
  def splitAssign(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      seed: Int
  ): DataFrame = {
    require(splits.nonEmpty, "at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "split weights must sum to 1")
    val prefix = md5Prefix(keyCol, seed)
    val cuts = splits.init.scanLeft(0.0)(_ + _._2).tail.map(hexThreshold)
    val assigned =
      if (splits.size == 1) lit(splits.head._1)
      else {
        val first = when(prefix < lit(cuts.head), lit(splits.head._1))
        splits.tail.init.zip(cuts.tail)
          .foldLeft(first) { case (acc, ((name, _), cut)) => acc.when(prefix < lit(cut), lit(name)) }
          .otherwise(lit(splits.last._1))
      }
    df.withColumn("split", assigned)
  }

  /** Deterministic stratified sample: per-stratum fractions, same
    * hash-gate mechanism. Strata absent from the map are dropped.
    */
  def stratified(
      df: DataFrame,
      strataCol: String,
      fractions: Map[String, Double],
      keyCol: String,
      seed: Int
  ): DataFrame = {
    val bucket = pmod(xxhash64(col(keyCol), lit(seed)), lit(1000000L))
    val gate = fractions.foldLeft(lit(false)) { case (acc, (stratum, f)) =>
      acc || (col(strataCol) === stratum && bucket < (f * 1e6).toLong)
    }
    df.filter(gate)
  }

  /** Deterministic portable corpus shuffle: a total order by
    * (md5(key:seed), key) — the global "random" permutation a training
    * run needs to be REPRODUCIBLE across engines, reruns, partitionings,
    * and cluster sizes (rand()-based shuffles are none of those). Spark
    * executes it as one range-partitioned sort (sampled bounds), so at
    * 100 TB each output partition is written by its own task in parallel;
    * epoch = new seed, no data movement beyond the one sort shuffle.
    * The md5 prefix matches [[bernoulliPortable]]'s gate, so an oracle
    * replays the exact order.
    */
  def shuffleDeterministic(df: DataFrame, keyCol: String, seed: Int): DataFrame =
    df.orderBy(md5(concat(col(keyCol).cast("string"), lit(s":$seed"))), col(keyCol))

  /** Per-domain quota cap: keep at most `n` rows per `domainCol` group,
    * best-first by `rank` (ties broken by `tieBreak` for a deterministic,
    * repartition-invariant result). The standard corpus-balancing op —
    * without it one crawled mega-domain dominates a 100 TB training mix.
    *
    * Shape at scale: a row_number window partitioned by domain whose
    * rank filter Spark pushes map-side (InferWindowGroupLimit): only n
    * rows per domain per input partition survive to the shuffle, so a
    * domain with a billion rows ships ~n·partitions rows, not a billion.
    * (PlanSpec asserts the partial WindowGroupLimit is in the plan.)
    */
  def domainCap(
      df: DataFrame,
      domainCol: String,
      rank: Column,
      tieBreak: Column,
      n: Int
  ): DataFrame = {
    require(n > 0, "cap must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(domainCol)).orderBy(rank, tieBreak)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Per-row hex threshold for a weight in [0,1]: floor(w·2^16) rendered
    * as 4 lowercase-hex chars, comparable against [[md5Prefix]] exactly
    * like the scalar [[hexThreshold]]. (Spark's `hex` is uppercase,
    * DuckDB compares case-sensitively — hence the explicit lower+lpad.)
    * Clamped to 65535 mirroring the scalar's `math.min`: w=1.0 would
    * otherwise render '10000' and be TRUNCATED by lpad to '1000' (~6%
    * keep-rate instead of keep-all).
    */
  private[graft] def hexThresholdCol(w: Column): Column =
    lower(lpad(hex(least(floor(w * 65536), lit(65535)).cast("long")), 4, "0"))

  /** Portable deterministic WEIGHTED Bernoulli sample: each row carries
    * its own keep-probability (a quality score, a language boost — the
    * importance-sampling step of corpus construction). The row's 16-bit
    * md5 value is compared against a per-row threshold rendered from the
    * weight; same portability and replay guarantees as
    * [[bernoulliPortable]], same 2^-16 granularity. Weights clamp to
    * [0,1]; weight ≥ 1 keeps unconditionally.
    */
  def weightedPortable(df: DataFrame, keyCol: String, weight: Column, seed: Int): DataFrame = {
    // NULL weight = no evidence = weight 0 (dropped) — made explicit so
    // the gate never silently inherits three-valued-logic filtering.
    val w = least(greatest(coalesce(weight, lit(0.0)), lit(0.0)), lit(1.0))
    df.filter(w >= 1.0 || md5Prefix(keyCol, seed) < hexThresholdCol(w))
  }

  /** Deterministic corpus mixing: repeat each row per its stratum's epoch
    * factor — 2.5 epochs of src0 = two full copies plus an md5-gated 50%
    * third copy, the standard up/down-sampling recipe when blending
    * sources into a training mix. Strata absent from `epochs` are
    * dropped. Emits a `copy` index (1..n) so downstream shuffling can
    * spread the copies. Row-local explode — no shuffle, no RNG state;
    * the SAME rows replicate on every engine, rerun, and partitioning.
    */
  def mixByStratum(
      df: DataFrame,
      strataCol: String,
      epochs: Map[String, Double],
      keyCol: String,
      seed: Int
  ): DataFrame = {
    require(epochs.values.forall(_ >= 0), "epoch factors must be >= 0")
    val reps = epochs.foldLeft(lit(null).cast("double")) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val frac = reps - floor(reps)
    val extra = when(md5Prefix(keyCol, seed) < hexThresholdCol(frac), 1).otherwise(0)
    df.withColumn("__n", (floor(reps).cast("int") + extra))
      .filter(col("__n") >= 1) // sequence(1,0) would run DOWNWARD in Spark
      .withColumn("copy", explode(sequence(lit(1), col("__n"))))
      .drop("__n")
  }

  /** Temperature-scaled source mixing (the UniMax/multilingual-sampling
    * recipe): stratum `s` with `n_s` rows gets mixing probability
    * `p_s = n_s^alpha / Σ n_t^alpha`, and the corpus is thinned toward
    * `targetFraction · N` total rows by keeping each stratum at fraction
    * `min(1, targetFraction · N · p_s / n_s)` — alpha < 1 flattens the
    * size distribution so mega-sources stop drowning the tail, alpha = 1
    * is proportional (plain thinning), alpha = 0 is uniform-over-sources.
    *
    * Determinism: stratum counts are exact (BIGINT); each `n^alpha` is one
    * IEEE `pow` on an exact input; the normalizer sums those doubles
    * through DECIMAL(38,6) (order-insensitive, replayable in SQL); the
    * final fraction feeds the same md5/2^16 gate as [[bernoulliPortable]].
    * The per-stratum fraction table is a ≤|strata|-row broadcast joined
    * back to the corpus — one aggregate + one broadcast join at any scale.
    */
  def temperatureMix(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      alpha: Double,
      targetFraction: Double,
      seed: Int
  ): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0,1], got $alpha")
    require(
      targetFraction > 0 && targetFraction <= 1,
      s"targetFraction must be in (0,1], got $targetFraction")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val powed = counts.withColumn("__pw", pow(col("__n").cast("double"), lit(alpha)))
    val z = powed.agg(
      sum(col("__pw").cast(graft.queries.Common.D)).cast("double").as("__z"),
      sum(col("__n")).cast("double").as("__grand"))
    val frac = powed
      .join(broadcast(z))
      .withColumn(
        "__frac",
        least(
          lit(1.0),
          lit(targetFraction) * col("__grand") * (col("__pw") / col("__z")) /
            col("__n").cast("double")))
      .select(col(strataCol), col("__frac"))
    df.join(broadcast(frac), strataCol)
      .filter(col("__frac") >= 1.0 || md5Prefix(keyCol, seed) < hexThresholdCol(col("__frac")))
      .drop("__frac")
  }

  /** Contiguous 1-based global row index over the seeded deterministic
    * total order of [[shuffleDeterministic]] — the id-densification /
    * example-numbering pass a training run needs (shard-stable sample
    * ids, resumable epoch cursors).
    *
    * The naive formulation — `row_number()` over an unpartitioned window
    * — funnels the whole table through ONE task and is the classic
    * 100 TB scale-killer; `monotonically_increasing_id` is parallel but
    * neither contiguous nor order-defined. This is the two-pass recipe
    * instead: range-partition + sort by (md5(key:seed), key), then
    * `zipWithIndex` (a per-partition count job followed by offset-shifted
    * local enumeration — O(partitions) driver state, every partition
    * numbered in parallel). The index is a pure function of the key set:
    * sampled range boundaries may move between runs, but the tie-broken
    * total order — and therefore every assigned index — cannot.
    */
  def globalIndex(df: DataFrame, keyCol: String, seed: Int, numPartitions: Int = 0): DataFrame =
    globalIndexBy(
      df.withColumn("__gk", md5(concat(col(keyCol).cast("string"), lit(s":$seed")))),
      Seq(col("__gk"), col(keyCol)),
      numPartitions
    ).drop("__gk")

  /** [[globalIndex]] for an arbitrary caller-supplied TOTAL order (the
    * caller must include a tie-breaking key — with ties the assignment
    * inside a tie group would be partition-layout-dependent).
    */
  def globalIndexBy(df: DataFrame, orderCols: Seq[Column], numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val parted = df
      .repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = parted.schema.add("global_idx", LongType, nullable = false)
    val indexed = parted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(indexed, schema)
  }

  /** Distributed running (prefix) sums of Long columns over a caller-
    * supplied TOTAL order — the scale-safe replacement for
    * `sum(x).over(Window.orderBy(...))`, which plans a single-partition
    * WindowExec (the classic 100 TB killer: the whole table funnels
    * through one task). Recipe is the textbook two-pass parallel scan:
    * range-partition + sort by the order, per-partition totals collected
    * to the driver (O(partitions × columns) — bounded), exclusive-scanned
    * into per-partition offsets, then a second pass over the SAME shuffle
    * output emits offset + local running sum. Every partition scans in
    * parallel; the only driver state is the offsets table.
    *
    * The order must be total (include a tie-break) — with ties, which
    * row of a tie group sees which prefix would be layout-dependent.
    *
    * @param sumCols Long-typed columns to scan
    * @return input rows + `cum_<col>` (inclusive running sum) per sumCol
    */
  def prefixSumsBy(
      df: DataFrame,
      orderCols: Seq[Column],
      sumCols: Seq[String],
      numPartitions: Int = 0
  ): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val parted = df
      .repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val idx = sumCols.map(parted.schema.fieldIndex)
    // pass 1: per-partition column totals (tiny: partitions × columns)
    val partTotals = parted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val acc = Array.fill(idx.length)(0L)
        it.foreach { r =>
          var i = 0
          while (i < idx.length) { if (!r.isNullAt(idx(i))) acc(i) += r.getLong(idx(i)); i += 1 }
        }
        Iterator((pid, acc))
      }
      .collect()
      .sortBy(_._1)
      .map(_._2)
    // exclusive scan → the offset each partition starts from
    val offsets = partTotals.scanLeft(Array.fill(idx.length)(0L)) { (acc, t) =>
      acc.zip(t).map { case (a, b) => a + b }
    }
    // pass 2 re-reads the pass-1 shuffle files (same lineage) and emits
    // offset-shifted local running sums
    val schema = sumCols.foldLeft(parted.schema)((s, c) => s.add(s"cum_$c", LongType, nullable = false))
    val scanned = parted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val run = offsets(pid).clone()
      it.map { r =>
        var i = 0
        while (i < idx.length) { if (!r.isNullAt(idx(i))) run(i) += r.getLong(idx(i)); i += 1 }
        // clone: Array.toSeq wraps the SAME array in 2.13; later mutation
        // of `run` would corrupt already-emitted rows without it
        Row.fromSeq(r.toSeq ++ run.clone().toSeq)
      }
    }
    spark.createDataFrame(scanned, schema)
  }

  /** Deterministic fixed-size uniform sample per group — the distributed
    * replacement for reservoir sampling. A sequential reservoir
    * (Vitter's Algorithm R) is inherently order-dependent; the
    * distribution-equivalent parallel formulation keeps the k rows with
    * the smallest priority md5(key:seed) within each group, which is an
    * exchangeable uniform draw without replacement and — unlike an RNG
    * stream — reproduces under any partitioning, retry, or engine. Plan:
    * one shuffle on the group key + a per-group top-k window (rank k is
    * emitted so callers can stream-merge reservoirs). At 100 TB the
    * window sorts only within groups; for a single giant group the same
    * priority column feeds a TakeOrderedAndProject instead.
    *
    * @return input rows + `sample_rank` (1..k by priority)
    */
  def reservoirPerGroup(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      k: Int,
      seed: Int
  ): DataFrame = {
    require(k >= 1, "reservoir size must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val prio = md5(concat(col(keyCol).cast("string"), lit(s":$seed")))
    val w = Window.partitionBy(col(groupCol)).orderBy(prio, col(keyCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** Deterministic WEIGHTED fixed-size sample per group without
    * replacement — Efraimidis–Spirakis A-ES, the weighted analog of
    * [[reservoirPerGroup]] and the sampler mixture construction actually
    * needs (pick k docs per domain with probability ∝ quality weight).
    * Each row draws the portable md5 16-bit uniform u ∈ (0, 1] (never
    * exactly 0 — the +1/65536 shift) and ranks by ln(u)/w DESCENDING
    * (monotone in the classic u^(1/w) key, without the pow): higher
    * weight → priority closer to 0 → more likely in the top k. The
    * priority is ROUNDED to 9 dp BEFORE the rank (round-9 advice:
    * neither JVM Math.log nor DuckDB ln() is guaranteed correctly
    * rounded, and a 1-ulp disagreement near a priority near-tie could
    * flip a rank — the repo's qZipf/DSIR convention of rounding ln
    * values that feed cross-engine comparisons), with `keyCol` as the
    * deterministic tie-break; any engine then ranks identically and an
    * oracle replays the exact sample. The emitted rank lets shard-level
    * samples stream-merge (keep the global top-k by the same key).
    * Plan: one group shuffle + a PARTITIONED top-k window — never
    * global.
    *
    * @return input rows + `priority` (round(ln(u)/w, 9)) + `sample_rank` (1..k)
    */
  def weightedReservoirPerGroup(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      weightCol: String,
      k: Int,
      seed: Int
  ): DataFrame = {
    require(k >= 1, "reservoir size must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val u = (conv(
      substring(md5(concat(col(keyCol).cast("string"), lit(s":$seed"))), 1, 4), 16, 10)
      .cast("double") + 1.0) / 65536.0
    val prio = round(log(u) / col(weightCol).cast("double"), 9)
    val w = Window.partitionBy(col(groupCol)).orderBy(prio.desc, col(keyCol))
    df.filter(col(weightCol) > 0)
      .withColumn("priority", prio)
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** Deterministic negative-pair mining for contrastive training: pair row
    * `i` with row `p(i) = (a·i + b) mod n` under an affine permutation of
    * the DENSE id domain [0, n). With gcd(a, n) = 1 (enforced) `p` is a
    * bijection, so every doc appears exactly once on each side — a
    * 1-regular random-looking pairing — and the whole draw is one
    * computed-key equi-self-join: no RNG state, no global sort, no
    * row_number window, identical output on any partitioning/engine.
    * Fixed points (p(i) = i) drop out; callers then EXCLUDE known
    * positives (same normalized content, same source/domain, a near-dup
    * pair set) to keep the pairs truly negative.
    *
    * Dense ids are a precondition (the usual ingest-time contract; a
    * rank/zipWithIndex pass densifies otherwise), and a·n must stay
    * inside Long — fine for a < 2^20 and n < 2^40.
    *
    * @return (id_a, id_b) with id_b = p(id_a), fixed points removed
    */
  def affinePairs(df: DataFrame, idCol: String, n: Long, a: Long, b: Long): DataFrame = {
    require(n > 1, "need at least two rows to pair")
    require(java.math.BigInteger.valueOf(a).gcd(java.math.BigInteger.valueOf(n)).longValueExact() == 1L,
      s"multiplier $a shares a factor with n=$n: p would not be a bijection")
    df.select(
        col(idCol).as("id_a"),
        pmod(col(idCol) * a + b, lit(n)).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
  }
}
