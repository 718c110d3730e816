package graft.operators

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
    * (the only pass that touches every byte); the global row_number runs
    * AFTER the `minCount` cut, i.e. over vocab-sized data (≤ a few
    * hundred thousand rows for real corpora) where a single-partition
    * window sort is microseconds — the same deliberate trade as any
    * final global ORDER BY.
    */
  def buildVocab(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String,
      minCount: Long
  ): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .select(explode(split(col(textCol), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minCount)
      .withColumn(
        "vocab_id",
        (row_number().over(Window.orderBy(col("freq").desc, col("token").asc)) - 1).cast("long"))
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
}
