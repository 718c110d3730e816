package graft.operators

import graft.engine.PlanOnly.syntax._

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-processing column builders: normalization, tokenization, shingling,
  * hashing, MinHash signatures, SimHash — all higher-order functions over
  * built-in expressions, so everything stays inside whole-stage codegen and
  * distributes row-parallel (no UDFs, no driver work, no shuffle until the
  * caller groups/joins).
  *
  * The reference has no text operators at all (its payloads are opaque
  * bytes; SURVEY.md §1.2); these are the LLM-data-pipeline layer the
  * BASELINE north star adds on top of callysto's capability set.
  */
object TextOps {

  /** Lower-case, collapse runs of whitespace, trim. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Distinct word n-gram shingles, e.g. n=3 → "a b c" strings. */
  def shingles(toks: Column, n: Int): Column =
    when(
      size(toks) >= n,
      array_distinct(
        transform(sequence(lit(0), size(toks) - n), i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))
      )
    ).otherwise(array(concat_ws(" ", toks)))

  /** 64-bit stable hash of each array element (xxhash64, codegen'd). */
  def hashed(arr: Column): Column = transform(arr, s => xxhash64(s))

  /** MinHash signature of length k over a set of element hashes.
    * Permutation i is xxhash64(h, i) — k independent 64-bit hash families
    * without materializing (a_i, b_i) coefficient tables.
    *
    * Backed by the codegen'd [[graft.functions.MinHashSig]] expression: one
    * primitive long[] loop per row, referencing the input array exactly
    * once. (The transposed HOF form — `transform(sequence(1,k), i =>
    * array_min(transform(hashes, ...)))` — re-evaluates a lambda-captured
    * expression tree on EVERY iteration; with the caller's shingle pipeline
    * project-collapsed into it that was k=64 full tokenize→shingle→hash
    * passes per row, the round-1 477 s scale-killer.)
    *
    * Empty input yields a Long.MaxValue-filled signature.
    */
  def minhashSignature(elementHashes: Column, k: Int): Column =
    graft.functions.GraftFunctions.minhash(elementHashes, k)

  /** LSH band keys for a MinHash signature: b bands of r rows each;
    * band j key = xxhash64(sig[j*r+1 .. j*r+r], j). Docs sharing any band
    * key are near-dup candidates (standard banding amplification).
    */
  def minhashBands(sig: Column, b: Int, r: Int): Column =
    transform(
      sequence(lit(0), lit(b - 1)),
      j => struct(j.as("band"), xxhash64(slice(sig, j * lit(r) + lit(1), lit(r)), j).as("bkey"))
    )

  /** SimHash bit vector (64 elements of 0/1) over token hashes: bit i is
    * set iff the sum over tokens of ±1 (sign of token-hash bit i) is > 0.
    * Backed by the codegen'd [[graft.functions.SimHashBits]] expression —
    * one primitive counter loop per row (the HOF accumulator formulation
    * allocated a boxed 64-element array per token).
    */
  def simhashBits(tokenHashCol: String): Column =
    graft.functions.GraftFunctions.simhashBits(col(tokenHashCol))

  /** Pack a 64-element 0/1 array into one signed long, MSB-first
    * (bits(0) → bit 63; wrapping is fine — it's an opaque fingerprint).
    * One long per doc replaces the 64-element array through every
    * downstream shuffle, and hamming verification becomes the codegen'd
    * `bit_count(a ^ b)` instead of a zip_with/aggregate HOF pass.
    */
  def packBits(bits: Column): Column =
    // shift+or, not acc*2+b: setting bit 63 would overflow the signed
    // multiply under ANSI mode, while shiftleft wraps by definition
    aggregate(bits, lit(0L), (acc, b) => shiftleft(acc, 1).bitwiseOR(b.cast("long")))

  /** Combination blocking keys of a simhash bit array — the Manku/Jain/
    * Das Sarma web-dedup scheme (WWW'07 §3) rather than naive single-chunk
    * banding: split the 64 bits into `maxHamming + 3` blocks; a pair
    * within hamming ≤ k corrupts at most k blocks, so at least 3 blocks
    * match exactly (pigeonhole) and the pair shares one of the
    * C(k+3, 3) three-block combination keys. Recall is still EXACT, but
    * the key widens from 64/(k+1) to 3·64/(k+3) bits — for k=3 that is
    * 16 → 32 bits, which cuts random-collision candidates from n²/2^16
    * to n²/2^32 per key: the difference between a birthday-quadratic
    * blow-up and near-zero noise pairs at web scale (ScaleStress measured
    * the 16-bit scheme at shuffle exponent 1.85 on a 10× corpus step).
    */
  def simhashComboKeys(packed: Column, maxHamming: Int): Column = {
    require(maxHamming >= 0 && maxHamming <= 13, s"maxHamming out of range: $maxHamming")
    val nBlocks = maxHamming + 3
    val bounds = (0 to nBlocks).map(i => i * 64 / nBlocks)
    // bit-array range [lo, hi) sits at long bits [64-hi, 64-lo) under the
    // MSB-first packing of [[packBits]] — pure shift/mask, fully codegen'd
    def blockVal(i: Int): Column = {
      val hi = bounds(i + 1)
      val mask = (1L << (bounds(i + 1) - bounds(i))) - 1
      shiftrightunsigned(packed, 64 - hi).bitwiseAND(lit(mask))
    }
    val combos = (0 until nBlocks).combinations(3).toSeq
    array(combos.zipWithIndex.map { case (c, idx) =>
      struct(
        lit(idx).as("combo"),
        blockVal(c(0)).as("b0"),
        blockVal(c(1)).as("b1"),
        blockVal(c(2)).as("b2"))
    }: _*)
  }

  /** Count of tokens matching a marker list (language-ID scoring). */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    aggregate(
      transform(toks, t => when(t.isin(markers.map(x => x: Any): _*), 1).otherwise(0)),
      lit(0),
      (acc, v) => acc + v
    )

  /** TF-IDF top-k characteristic terms per document (keyword extraction —
    * the standard corpus-analysis/retrieval-feature op).
    *
    * Shape at scale: one shuffle keyed on (doc, term) for tf, one keyed
    * on term for df, one term-keyed equi-join to attach df, one per-doc
    * window whose rank filter Spark pushes map-side (InferWindowGroupLimit
    * — only k rows per doc per input partition reach the shuffle). Never
    * collects the vocabulary; df is data, not driver state.
    *
    * The idf is the log-free BM25-style ratio `(N − df + 0.5)/(df + 0.5)`
    * rather than `ln(N/df)`: every operation in it (integer subtract,
    * +0.5, one divide, one multiply) is exactly rounded under IEEE 754, so
    * scores are BIT-IDENTICAL across engines — `ln` is not correctly
    * rounded and its last-ulp wobble differs between libm builds, which
    * would break hash-exact oracle checks (same monotone ranking either
    * way).
    *
    * Output: (doc_id-named idCol, term, tf, df, score), top `k` terms per
    * doc by (score desc, term asc).
    */
  def tfidfTopK(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String, k: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col(idCol), explode(split(col(textCol), " ")).as("term"))
    val tf = tok.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("__n"))
    val scored = tf
      .join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn(
        "score",
        col("tf").cast("double") *
          ((col("__n").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"))
  }

  /** Corpus vocabulary with contiguous frequency-ranked ids (the token →
    * id table a tokenizer trainer exports): tokens above `minCount`,
    * ranked by (freq desc, token asc) so the assignment is total and
    * reproducible across engines and partitionings.
    *
    * Scale: the count is a map-side-combined aggregation over the corpus
    * (the only pass that touches every byte); id assignment over the
    * minCount survivors goes through [[graft.operators.Sampling.globalIndexBy]]
    * (range-partition on the order key + per-partition sort + zipWithIndex)
    * — a distributed total-order rank, never a single-partition window, so
    * the plan survives a raw-token-level vocabulary (hundreds of millions
    * of rows at 100 TB) unchanged.
    */
  def buildVocab(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String,
      minCount: Long
  ): org.apache.spark.sql.DataFrame = {
    val counted = docs
      .select(explode(split(col(textCol), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minCount)
    Sampling
      .globalIndexBy(counted, Seq(col("freq").desc, col("token").asc))
      .withColumn("vocab_id", (col("global_idx") - 1).cast("long"))
      .drop("global_idx")
  }

  /** BM25 ranked retrieval: top-`k` documents for a bag-of-terms query —
    * the search primitive a corpus pipeline uses for decontamination
    * probes, RAG candidate generation, and relevance-weighted sampling.
    * Okapi BM25 (Robertson & Zaragoza, "The Probabilistic Relevance
    * Framework: BM25 and Beyond", FnTIR 2009 §3.3):
    *
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
    *
    * with the same log-free idf ratio as [[tfidfTopK]] (every op exactly
    * rounded under IEEE 754 → bit-identical scores across engines; `ln`'s
    * last-ulp wobble would break hash-exact oracles, and the ranking is
    * monotone-identical either way).
    *
    * Shape at scale: tokens are filtered to the query's terms BEFORE the
    * explode (an array `filter` inside the row), so the per-doc shuffle
    * carries only query-term hits, never the corpus vocabulary; df over
    * those hits is a |queryTerms|-row aggregate broadcast back; corpus
    * stats (N, Σ|d|) are one map-side-combined aggregate broadcast as a
    * single row. The final top-k is a TakeOrdered over per-doc scores —
    * no window, no global sort materialization.
    *
    * Per-term scores cross engines bit-identically, and the per-doc sum
    * goes through DECIMAL(38,6) (order-insensitive exact arithmetic, the
    * [[graft.queries.Common]] convention), so the whole ranking is
    * hash-exact against a SQL replay.
    *
    * Output: (idCol, n_hits, dl, score), top `k` by (score desc, id asc).
    */
  def bm25TopK(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): org.apache.spark.sql.DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val D = org.apache.spark.sql.types.DecimalType(38, 6)
    val toks = split(col(textCol), " ")
    val withDl = docs.select(
      col(idCol),
      size(toks).as("dl"),
      filter(toks, t => t.isin(queryTerms.map(x => x: Any): _*)).as("__hits"))
    val stats = withDl
      .agg(count(lit(1)).as("__n"), sum(col("dl")).as("__sumdl"))
      .withColumn("__avgdl", col("__sumdl").cast("double") / col("__n").cast("double"))
    val tf = withDl
      .select(col(idCol), col("dl"), explode(col("__hits")).as("term"))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats.select(col("__n"), col("__avgdl"))))
      .withColumn(
        "__idf",
        (col("__n").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      .withColumn(
        "__score_t",
        // tf·(k1+1) written as tf·k1 + tf: a SQL replay folds `k1 + 1`
        // in DECIMAL (exact 2.2) while the JVM folds it in binary
        // (double(1.2)+1.0), and the two sit a near-tie apart — this form
        // keeps every constant a directly-parsed literal on both engines
        col("__idf") * ((col("tf").cast("double") * lit(k1) + col("tf").cast("double")) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / col("__avgdl"))))))
    scored
      .groupBy(col(idCol), col("dl"))
      .agg(
        count(lit(1)).as("n_hits"),
        sum(col("__score_t").cast(D)).cast("double").as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("n_hits"), col("dl"), col("score"))
  }

  /** 1/log2(rank+1) DCG discount weights, computed ONCE in the driver
    * JVM and consumed by BOTH engines — Spark via `lit`, DuckDB via the
    * shortest-round-trip decimal literal (`Double.toString`) — so the
    * cross-engine ln-implementation question never arises inside the
    * metric. */
  def ndcgWeights(k: Int): IndexedSeq[Double] =
    (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))

  /** Retrieval-quality evaluation of the BM25 ranker: per query term,
    * MRR@k (binary relevance: tf ≥ `relTf`) and NDCG@k (graded gain
    * 2^min(tf,4) − 1) of the score-ranked candidates against the
    * term-frequency relevance labels. This is the eval a RAG / search
    * team runs before trusting a ranker at corpus scale — and because
    * BM25's dl-normalization reorders docs relative to raw tf, the
    * metrics are genuinely informative, not tautologies.
    *
    * Scale shape: candidates are ONLY docs containing a query term (the
    * posting lists — corpus scans once, then |postings| rows). Both
    * rank windows partition by term with an immediate rank ≤ k filter,
    * so they plan as map-side WindowGroupLimit; the tf table
    * localCheckpoints (reused by ranking, ideal ranking, and candidate
    * counts). Gains are exact small integers, discounts are the shared
    * [[ndcgWeights]] literals, per-term DCG sums run over ≤ k 6-dp
    * DECIMAL terms — the whole metric is hash-exact.
    */
  def retrievalEval(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int = 10,
      relTf: Int = 2,
      k1: Double = 1.2,
      b: Double = 0.75
  ): org.apache.spark.sql.DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1 && k <= 100, s"retrievalEval: k=$k out of [1,100]")
    import org.apache.spark.sql.expressions.Window
    val D = org.apache.spark.sql.types.DecimalType(38, 6)
    val toks = split(col(textCol), " ")
    val withDl = docs.select(
      col(idCol),
      size(toks).as("dl"),
      filter(toks, t => t.isin(queryTerms.map(x => x: Any): _*)).as("__hits"))
    val stats = withDl
      .agg(count(lit(1)).as("__n"), sum(col("dl")).as("__sumdl"))
      .withColumn("__avgdl", col("__sumdl").cast("double") / col("__n").cast("double"))
    val tf = withDl
      .select(col(idCol), col("dl"), explode(col("__hits")).as("term"))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .ckptLazy()
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // Identical IEEE chain to bm25TopK (tf·k1 + tf form — see the
    // constant-folding note there).
    val scored = tf
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats.select(col("__n"), col("__avgdl"))))
      .withColumn(
        "__idf",
        (col("__n").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      .withColumn(
        "score",
        col("__idf") * ((col("tf").cast("double") * lit(k1) + col("tf").cast("double")) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / col("__avgdl"))))))
      .withColumn("rel", least(col("tf"), lit(4L)))
      .withColumn("rel_bin", col("tf") >= relTf)
    val ws = ndcgWeights(k)
    def wOf(rnk: org.apache.spark.sql.Column) =
      ws.zipWithIndex.foldLeft(lit(0.0)) { case (acc, (w, i)) =>
        when(rnk === (i + 1), lit(w)).otherwise(acc)
      }
    // gain 2^rel − 1 as an exact small-integer CASE (rel ∈ 1..4).
    def gainOf(rel: org.apache.spark.sql.Column) =
      when(rel === 1, lit(1.0)).when(rel === 2, lit(3.0))
        .when(rel === 3, lit(7.0)).otherwise(lit(15.0))
    val ranked = scored
      .withColumn("rnk",
        row_number().over(Window.partitionBy(col("term"))
          .orderBy(col("score").desc, col(idCol).asc)))
      .filter(col("rnk") <= k)
    val dcgAgg = ranked
      .groupBy(col("term"))
      .agg(
        sum(round(gainOf(col("rel")) * wOf(col("rnk")), 6).cast(D))
          .cast("double").as("dcg"),
        min(when(col("rel_bin"), col("rnk"))).as("first_rel_rank"))
    val ideal = scored
      .withColumn("irnk",
        row_number().over(Window.partitionBy(col("term"))
          .orderBy(col("rel").desc, col(idCol).asc)))
      .filter(col("irnk") <= k)
      .groupBy(col("term"))
      .agg(sum(round(gainOf(col("rel")) * wOf(col("irnk")), 6).cast(D))
        .cast("double").as("idcg"))
    val cand = tf.groupBy(col("term")).agg(
      count(lit(1)).as("n_candidates"),
      count(when(col("tf") >= relTf, 1)).as("n_rel"))
    cand
      .join(dcgAgg, "term")
      .join(ideal, "term")
      .select(
        col("term"), col("n_candidates"), col("n_rel"),
        coalesce(col("first_rel_rank"), lit(-1L)).as("first_rel_rank"),
        round(coalesce(lit(1.0) / col("first_rel_rank"), lit(0.0)), 6).as("mrr"),
        round(col("dcg"), 6).as("dcg"),
        round(col("idcg"), 6).as("idcg"),
        round(col("dcg") / col("idcg"), 6).as("ndcg"))
      .orderBy(col("term"))
  }

  /** Hashed-feature linear classifier inference — the fastText-style
    * quality-gate scoring pass (Joulin et al., "Bag of Tricks for
    * Efficient Text Classification", EACL 2017: hashed uni+bigram
    * features, linear model, mean pooling). The plan IS production model
    * inference at 100 TB: per-row feature extraction (unigrams + bigram
    * conjunctions), the hashing trick into `buckets` weight slots, a
    * BROADCAST join against the weight table (the model is KBs–MBs;
    * corpus never shuffles), and a per-doc mean-pool — one scan, one
    * keyed re-group on the id the explode preserved.
    *
    * Weights here are derived from a portable md5 family so a SQL oracle
    * can replay inference end-to-end (a trained model would load the same
    * (bucket, weight) table from a file — the plan does not change).
    * Weights are INTEGERS in [-1000, 1000] and the margin is an exact
    * BIGINT sum, so score = margin / (1000·n_features) is one exactly-
    * rounded division — bit-identical across engines, hash-exact oracle.
    *
    * Output: (idCol, n_features, margin, score, keep = margin > 0).
    */
  def hashedLinearScore(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int,
      seed: Int
  ): org.apache.spark.sql.DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val spark = docs.sparkSession
    // Tokenize ONCE into a materialized column before any HOF touches it.
    // The bigram lambda below captures the token array; a lambda-captured
    // EXPRESSION tree (split(text)) is re-evaluated per element in the
    // interpreted HigherOrderFunction path — O(tokens²) splits per doc,
    // the round-1 CSE trap (this was the one site that missed the
    // attribute-boundary discipline; fixing it took the four classifier-
    // family queries from 4.3-6.5 s to ~2 s each at sf0.1). An attribute
    // reference is a plain row read, so capturing `$toks` is free.
    val toksAttr = col("__toks")
    // unigrams ++ adjacent-pair conjunctions ("a_b") — fastText's n-gram trick
    val feats = concat(
      toksAttr,
      when(size(toksAttr) >= 2,
        transform(sequence(lit(1), size(toksAttr) - 1),
          i => concat(element_at(toksAttr, i), lit("_"), element_at(toksAttr, i + 1))))
        .otherwise(array().cast("array<string>")))
    // portable bucket: first 8 md5 hex digits of "feat:seed" as an int, mod buckets
    val bucketOf: Column => Column = f =>
      conv(substring(md5(concat(f, lit(s":$seed"))), 1, 8), 16, 10).cast("long") % buckets
    // deterministic weight table: w(bucket) = md5-int("w:bucket:seed") % 2001 - 1000
    val weights = spark
      .range(buckets).withColumnRenamed("id", "bucket")
      .withColumn(
        "w",
        conv(substring(md5(concat(lit("w:"), col("bucket").cast("string"), lit(s":$seed"))), 1, 8),
          16, 10).cast("long") % 2001 - 1000)
    docs
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), explode(feats).as("__feat"))
      .withColumn("bucket", bucketOf(col("__feat")))
      .join(broadcast(weights), "bucket")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_features"), sum(col("w")).as("margin"))
      .withColumn(
        "score",
        col("margin").cast("double") / (lit(1000.0) * col("n_features").cast("double")))
      .withColumn("keep", col("margin") > 0)
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how target-like its hashed-unigram distribution is.
    * Features hash into `buckets` bins (portable md5 bucket, as in
    * [[hashedLinearScore]]); the target and raw corpora each induce an
    * add-one-smoothed categorical distribution over bins; a document's
    * log importance weight is Σ_tokens [ln p_target(b) − ln p_raw(b)].
    * High-weight docs are the ones importance resampling keeps.
    *
    * Scale shape: two bounded aggregates (≤ `buckets` rows each — the
    * bin tables broadcast back), one token-exploded scan for scoring.
    * No collect anywhere; the corpus is read once for counting and once
    * for scoring. Per-bin log-ratios are each ONE fixed IEEE chain on
    * exact integer counts, and the per-doc sum goes through
    * DECIMAL(38,6) so it is aggregation-order-insensitive.
    *
    * @param isTarget row predicate marking the target-domain exemplars
    * @return (idCol, n_toks, log_weight)
    */
  def dsirLogWeights(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int,
      seed: Int
  ): org.apache.spark.sql.DataFrame = {
    require(buckets > 0, "buckets must be positive")
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val D = DecimalType(38, 6)
    val toks = filter(tokens(col(textCol)), x => length(x) > 0)
    val exploded = docs
      .select(col(idCol), isTarget.as("__tgt"), explode(toks).as("__tok"))
      .withColumn("bucket",
        conv(substring(md5(concat(col("__tok"), lit(s":$seed"))), 1, 8), 16, 10)
          .cast("long") % buckets)
    val cnts = exploded
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("cr"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("ct"))
    val totals = cnts.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"))
    val llr = cnts
      .crossJoin(broadcast(totals))
      .select(
        col("bucket"),
        (log((col("ct") + 1).cast("double") / (col("tt") + buckets).cast("double"))
          - log((col("cr") + 1).cast("double") / (col("tr") + buckets).cast("double")))
          .as("llr"))
    exploded
      .join(broadcast(llr), "bucket")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_toks"),
        sum(col("llr").cast(D)).cast(DoubleType).as("log_weight"))
  }

  /** Inverted-index export: per term, document frequency and the full
    * posting list (parallel doc-id / tf arrays, doc-id-sorted) — the
    * materialized search-index table [[bm25TopK]] would probe at serving
    * time, and the artifact a corpus ships alongside itself for exact-
    * match decontamination probes by third parties.
    *
    * Scale: one (doc, term) shuffle for tf, one term shuffle for the
    * posting assembly. Posting lists are bounded by `maxDf` — a term in
    * half the corpus is a stopword, and its posting row would be a
    * single-key straggler holding |corpus| entries. The cap is enforced
    * BEFORE the posting arrays exist: a df pre-pass finds over-cap terms
    * and a left-anti join drops their (term, doc) rows, so the hot term's
    * |corpus|-entry array is never built in any aggregation buffer (the
    * same pre-pass + anti-join hot-key discipline as the shingle df-cap
    * in [[graft.operators.Dedup.jaccardPairs]] — filtering df AFTER the
    * collect would still materialize the straggler row, then discard it).
    * Arrays are sorted in-row after collect, so the output is
    * partitioning-independent.
    */
  def invertedIndex(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      maxDf: Long
  ): org.apache.spark.sql.DataFrame = {
    // materialized once: feeds the df pre-pass AND the posting collect
    // (left lazy, the tokenize→explode→tf pipeline would run twice)
    val tf = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).as("tf"))
      .ckptLazy()
    val hot = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("term"))
    tf.join(hot, Seq("term"), "left_anti")
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        array_sort(collect_list(struct(col(idCol), col("tf")))).as("__p"))
      .select(
        col("term"),
        col("df"),
        transform(col("__p"), p => p.getField(idCol)).as("posting_docs"),
        transform(col("__p"), p => p.getField("tf")).as("posting_tfs"))
  }

  /** Exact phrase search: documents containing `phrase` as consecutive
    * tokens, with the (1-based, overlapping) match positions — the
    * precision companion to [[bm25TopK]]'s bag-of-terms ranking and the
    * op behind n-gram decontamination probes ("does the benchmark
    * sentence appear verbatim?"). Token-boundary semantics, unlike a
    * substring blocklist scan: "low cost" never matches "slow cost".
    *
    * Shape at scale: ONE row-local array pass per document — position
    * candidates are a `sequence`, the per-position check an all-terms
    * conjunction, everything inside whole-stage codegen; no explode, no
    * shuffle, nothing leaves the row until the final hit filter. (Serving
    * many phrases repeatedly is [[invertedIndex]]'s job; a one-shot
    * corpus probe should scan.)
    *
    * Output: (idCol, n_hits, first_pos, positions), hit docs only.
    */
  def phraseSearch(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      phrase: Seq[String]
  ): org.apache.spark.sql.DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val toks = split(col(textCol), " ")
    val k = phrase.length
    val hitAt: Column => Column = i =>
      phrase.zipWithIndex
        .map { case (term, j) => element_at(toks, i + lit(j)) === lit(term) }
        .reduce(_ && _)
    val positions = when(
      size(toks) >= k,
      filter(sequence(lit(1), size(toks) - lit(k - 1)), hitAt)
    ).otherwise(array().cast("array<int>"))
    docs
      .select(col(idCol), positions.as("positions"))
      .filter(size(col("positions")) >= 1)
      .select(
        col(idCol),
        size(col("positions")).as("n_hits"),
        element_at(col("positions"), 1).as("first_pos"),
        col("positions"))
  }

  /** Per-document vocabulary-coverage score against a [[buildVocab]] table:
    * token count, out-of-vocabulary token count, and OOV rate — the
    * rational (division-only, engine-exact) stand-in for an LM perplexity
    * gate: documents full of tokens a tokenizer has never seen are the
    * ones a quality filter drops first.
    *
    * Scale: the vocab is broadcast (it survived a minCount cut, so it is
    * dimension-sized); the token explode never shuffles — the only
    * aggregation is the per-doc re-group on the id the explode preserved.
    */
  def oovScore(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      vocab: org.apache.spark.sql.DataFrame
  ): org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .join(broadcast(vocab.select(col("token"), lit(true).as("__in"))), Seq("token"), "left_outer")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("__in").isNull, 1)).as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens").cast("double"))

  /** Canonical form of a web URL — the pre-dedup normalization every
    * crawl pipeline runs before URL-level dedup (the cheapest dedup tier,
    * ahead of content hashing): strip the fragment, lowercase the
    * scheme://host[:port] authority (path and query stay case-sensitive
    * per RFC 3986), drop default ports (:443 on https, :80 on http),
    * remove `utm_*` tracking params (the rest of the query string is
    * load-bearing and kept), and strip a trailing path slash.
    *
    * Reference analog: none — callysto leaves payload semantics to user
    * closures. Pure regexp chain, row-local, codegen'd — a map stage at
    * any scale. The q_dedup_url_canonical oracle replays the identical
    * chain in DuckDB (RE2), proving the Java-regex and RE2 chains compute
    * the same function on this URL family.
    */
  def canonicalizeUrl(url: Column): Column = {
    val c1  = regexp_replace(url, "#.*$", "")
    val pre = regexp_extract(c1, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    val c2  = concat(lower(pre), c1.substr(length(pre) + 1, length(c1)))
    val c3  = regexp_replace(
      regexp_replace(c2, "^(https://[^/?#:]*):443", "$1"),
      "^(http://[^/?#:]*):80", "$1")
    val c4 = regexp_replace(
      regexp_replace(c3, "utm_[^&#]*&", ""),
      "[?&]utm_[^&#]*$", "")
    regexp_replace(c4, "/(\\?|$)", "$1")
  }

  /** BPE merge training (Sennrich et al. 2016): learn the top `rounds`
    * byte-pair merges from a word-frequency table — the tokenizer-
    * training op itself, not just its application ([[subwordSegments]]
    * applies a fixed segmentation).
    *
    * Scale shape: BPE never trains on the corpus — it trains on the
    * WORD-FREQUENCY table, which is vocabulary-bounded by construction.
    * The caller's one corpus-scale pass (tokenize + groupBy count)
    * produces `words`; everything here runs on that bounded table:
    * per round, adjacent-pair counts via one `lead` window, a global
    * argmax (count desc, pair asc — fully tie-broken), then the
    * left-to-right NON-OVERLAPPING merge application. Overlap handling
    * is the classic subtlety ("aaa" merges once, not twice): among each
    * word's maximal run of consecutive candidate positions only every
    * other one applies — computed with the run-grouping trick
    * (pos − row_number is constant within a run), no sequential scan.
    *
    * The per-round argmax is a 1-row collect (bounded, like the ANN
    * codebook builds); merged rows re-densify positions and
    * localCheckpoint so the k-round lineage stays flat.
    *
    * @param words (wordCol, freqCol) — distinct words with corpus counts
    * @return one row per merge: (merge_round, lhs, rhs, pair_count)
    */
  def bpeTrain(
      words: org.apache.spark.sql.DataFrame,
      wordCol: String,
      freqCol: String,
      rounds: Int
  ): org.apache.spark.sql.DataFrame = bpeTrainCore(words, wordCol, freqCol, rounds)._1

  /** The segmentation [[bpeTrain]]'s learned merges induce on the training
    * vocabulary: each word joined from its post-merge symbol sequence —
    * i.e. the tokenizer APPLICATION step, emitted straight from the
    * trainer's final state so train and apply cannot drift. Output one
    * row per word: (word, freq, n_pieces, segmented) with pieces joined
    * by a space (scalar output — the registered-query contract).
    */
  def bpeSegment(
      words: org.apache.spark.sql.DataFrame,
      wordCol: String,
      freqCol: String,
      rounds: Int
  ): org.apache.spark.sql.DataFrame = {
    val syms = bpeTrainCore(words, wordCol, freqCol, rounds)._2
    syms
      .groupBy(col("word"), col("freq"))
      .agg(
        count(lit(1)).as("n_pieces"),
        array_join(
          transform(
            sort_array(collect_list(struct(col("pos"), col("sym")))),
            s => s.getField("sym")),
          " ").as("segmented"))
  }

  private def bpeTrainCore(
      words: org.apache.spark.sql.DataFrame,
      wordCol: String,
      freqCol: String,
      rounds: Int
  ): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    require(rounds >= 1, "rounds must be >= 1")
    val spark = words.sparkSession
    import spark.implicits._
    val byPos = Window.partitionBy(col("word")).orderBy(col("pos"))
    var syms = words
      .select(col(wordCol).as("word"), col(freqCol).as("freq"))
      .select(col("word"), col("freq"),
        posexplode(split(col("word"), ""))).toDF("word", "freq", "pos", "sym")
      .ckpt()
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    for (round <- 1 to rounds) {
      val withNext = syms.withColumn("nxt", lead(col("sym"), 1).over(byPos))
      val top = withNext
        .where(col("nxt").isNotNull)
        .groupBy(col("sym"), col("nxt"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("sym"), col("nxt"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      if (top.nonEmpty) {
        val (l, r, cnt) = top.head
        merges += ((round.toLong, l, r, cnt))
        // candidate positions, run-grouped; every other one in a run applies
        val cand = withNext
          .where(col("sym") === l && col("nxt") === r)
          .withColumn("rn", row_number().over(byPos))
          .withColumn("grp", col("pos") - col("rn"))
        val applied = cand
          .withColumn("k", row_number().over(
            Window.partitionBy(col("word"), col("grp")).orderBy(col("pos"))))
          .where((col("k") - 1) % 2 === 0)
          .select(col("word"), col("pos"))
        val consumed = applied.select(col("word"), (col("pos") + 1).as("pos"))
        syms = syms
          .join(applied.withColumn("ap", lit(true)), Seq("word", "pos"), "left")
          .join(consumed.withColumn("cons", lit(true)), Seq("word", "pos"), "left")
          .where(col("cons").isNull)
          .withColumn("sym", when(col("ap"), lit(l + r)).otherwise(col("sym")))
          .withColumn("pos", row_number().over(byPos) - 1)
          .select(col("word"), col("freq"), col("pos"), col("sym"))
          .ckpt()
      }
    }
    (merges.result().toDF("merge_round", "lhs", "rhs", "pair_count"), syms)
  }
  /** Trained multinomial naive Bayes, QUANTIZED for deterministic
    * serving: log-probabilities become integer micro-log units
    * (floor(1e6·ln x + 0.5)) at train time, so scoring is pure integer
    * arithmetic — order-insensitive, engine-exact, no float argmax
    * boundary (the q_text_naive_bayes convention; mirrors shipping a
    * quantized model artifact).
    *
    * @param train (doc_id, lang, tk) token occurrences of the train split
    * @return (model(lang, tk, lp), clsq(lang, prior_micro, lnz_micro))
    */
  def nbQuantizedModel(train: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    def q6(c: Column) = floor(c * 1e6 + 0.5).cast("long")
    val v = train.agg(countDistinct(col("tk")).as("v"))
    val cls = train.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_tok"), countDistinct(col("doc_id")).as("n_docs"))
    val tot = cls.agg(sum(col("n_docs")).as("total_docs"))
    val model = train.groupBy(col("lang"), col("tk"))
      .agg(q6(log((count(lit(1)) + 1).cast("double"))).as("lp"))
    val clsq = cls.crossJoin(broadcast(tot)).crossJoin(broadcast(v))
      .select(col("lang"),
        q6(log(col("n_docs").cast("double") / col("total_docs").cast("double")))
          .as("prior_micro"),
        q6(log((col("n_tok") + col("v")).cast("double"))).as("lnz_micro"))
    (model, clsq)
  }

  /** Score documents against an [[nbQuantizedModel]]: integer max-plus
    * argmax with (score DESC, lang) tie-break and the exact integer
    * top1−top2 margin. `testTok` is (doc_id, tk) token occurrences.
    * Scale shape: one broadcast join of the model to the token counts,
    * one (doc, class) integer aggregation, a per-doc window.
    * @return (doc_id, pred, margin_micro)
    */
  def nbScore(
      testTok: org.apache.spark.sql.DataFrame,
      model: org.apache.spark.sql.DataFrame,
      clsq: org.apache.spark.sql.DataFrame
  ): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val testc = testTok.groupBy(col("doc_id"), col("tk")).agg(count(lit(1)).as("n"))
    val dlen = testc.groupBy(col("doc_id")).agg(sum(col("n")).as("len"))
    val hits = testc.join(broadcast(model), Seq("tk"))
      .groupBy(col("doc_id"), col("lang")).agg(sum(col("n") * col("lp")).as("lsum"))
    val scores = dlen.crossJoin(broadcast(clsq))
      .join(hits, Seq("doc_id", "lang"), "left")
      .na.fill(0L, Seq("lsum"))
      .select(col("doc_id"), col("lang"),
        (col("prior_micro") + col("lsum") - col("len") * col("lnz_micro")).as("score_micro"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score_micro").desc, col("lang"))
    val rk = scores.withColumn("rn", row_number().over(w))
    rk.filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("pred"), col("score_micro").as("s1"))
      .join(rk.filter(col("rn") === 2)
        .select(col("doc_id"), col("score_micro").as("s2")), Seq("doc_id"))
      .select(col("doc_id"), col("pred"), (col("s1") - col("s2")).as("margin_micro"))
  }
}
