package graft.operators

import graft.engine.PlanOnly.syntax._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextOps._

/** Deduplication operators for document corpora. All are shuffle-based —
  * candidate generation goes through a key (content hash, LSH band, simhash
  * chunk, shingle), never a cross join, so each scales linearly with a
  * 1000-executor cluster instead of quadratically.
  *
  * At 100 TB the knobs that matter:
  *   - shingle/band keys are 64-bit hashes → fixed-width shuffle rows;
  *   - hot shingles (boilerplate) can be df-capped via `maxDocFreq`;
  *   - pair generation joins two band streams co-partitioned on the band
  *     key, so AQE's skew-join splitting handles pathological buckets.
  */
object Dedup {

  /** Exact dedup: group by content hash of the normalized text, keep the
    * smallest id. The result (hash, keep_id, n_copies) is the decision
    * table a writer left-semi joins against.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), md5(encode(normText(col(textCol)), "UTF-8")).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Incremental exact dedup: the rolling-ingest shape — a new batch is
    * deduped against the ALREADY-ACCEPTED corpus, not the whole world.
    * Returns one row per genuinely new content hash in `incoming`
    * (content_hash, keep_id): first-occurrence-wins inside the batch, then
    * an anti-join drops hashes the corpus index already holds.
    *
    * Scale: the corpus side is reduced to its 16-byte hash column before
    * the join (at 100 TB the hash index is ~3 orders of magnitude smaller
    * than the corpus and is the thing you'd persist between ingest runs —
    * bucketed on content_hash so each day's anti-join is shuffle-free on
    * the index side, Bucketing.scala pattern). The incoming batch is
    * hash-aggregated BEFORE the anti-join, so the join carries one row per
    * distinct new hash, not one per document.
    */
  def incrementalNew(
      existing: DataFrame,
      incoming: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    def hashed(d: DataFrame) =
      d.select(col(idCol), md5(encode(normText(col(textCol)), "UTF-8")).as("content_hash"))
    val index = hashed(existing).select(col("content_hash")).distinct()
    hashed(incoming)
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"))
      .join(index, Seq("content_hash"), "left_anti")
  }

  /** Bloom-gated variant of [[incrementalNew]] — the shuffle-reduction
    * composition for the common 100 TB regime where MOST of a new batch
    * is genuinely new: a bloom filter over the corpus hash index splits
    * the batch row-locally. "Definitely absent" hashes (no false
    * negatives — they are provably new) bypass the anti-join entirely;
    * only the bloom-POSITIVE sliver (true dups + ~fpp of the new) rides
    * the shuffle to be checked exactly. Results are IDENTICAL to the
    * plain path (DedupSpec asserts equality); what changes is that the
    * anti-join's probe side shrinks from |batch| to
    * |dups| + fpp·|batch|.
    *
    * The bloom costs one pass over the index (~1.2 bytes/hash at 1%
    * fpp); persist it next to the index and this becomes a pure
    * broadcast-side artifact, exactly like [[Joins.bloomSemiJoin]]'s.
    */
  def incrementalNewBloomGated(
      existing: DataFrame,
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      expectedItems: Long,
      fpp: Double = 0.01
  ): DataFrame = {
    def hashed(d: DataFrame) =
      d.select(col(idCol), md5(encode(normText(col(textCol)), "UTF-8")).as("content_hash"))
    val index = hashed(existing).select(col("content_hash")).distinct().ckpt()
    val bf = index.stat.bloomFilter("content_hash", math.max(expectedItems, 1L), fpp)
    val might = org.apache.spark.sql.graftshim.GraftSql.column(
      graft.functions.BloomMightContain(
        org.apache.spark.sql.graftshim.GraftSql.expression(col("content_hash")), bf))
    val batch = hashed(incoming)
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"))
      .withColumn("__maybe", might)
      .ckpt() // consumed twice (the two branches below)
    val definitelyNew = batch.filter(!col("__maybe")).drop("__maybe")
    val checkedNew = batch.filter(col("__maybe")).drop("__maybe")
      .join(index, Seq("content_hash"), "left_anti")
    definitelyNew.unionByName(checkedNew)
  }

  /** Incremental FUZZY dedup — the near-dup gate for rolling ingest (the
    * fuzzy sibling of [[incrementalNew]]): a new batch is admitted
    * against the ALREADY-ACCEPTED corpus's minhash signature index, so a
    * re-crawl of an accepted page (same content modulo small edits) does
    * not re-enter the corpus. Returns the incoming ids that survive.
    *
    * Rejection rule: an incoming doc is dropped if a banded LSH candidate
    * verifies at est-Jaccard ≥ threshold against ANY existing doc, or
    * against ANY smaller-id doc of its own batch. The within-batch rule
    * is PAIRWISE ("any near-dup evidence excludes"), deliberately more
    * conservative than greedy first-occurrence-wins: near-duplication is
    * not transitive, and an ingest gate prefers dropping a duplicate
    * chain's tail over admitting it.
    *
    * Scale shape: identical to [[minhashPairs]] — id-only band joins,
    * candidates deduped before the single verify pass. The existing-side
    * signature table (~0.5 KB/doc, content-independent size) is the
    * artifact to PERSIST between ingest runs, exactly like
    * incrementalNew's hash index; each run sketches only the new batch.
    */
  def minhashIncrementalNew(
      existing: DataFrame,
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5
  ): DataFrame =
    minhashGateFromIndex(
      minhashSigTable(existing, idCol, textCol, shingleN, k),
      minhashSigTable(incoming, idCol, textCol, shingleN, k),
      k, bands, threshold)
      .select(col("keep_id"))

  /** Chunk-hash table `(id, h)` (DISTINCT per doc) under the portable
    * content-defined segmentation ([[graft.functions.CdcChunkStarts]]) —
    * the persistable index a CHUNK-level incremental gate keeps between
    * runs (16 bytes per ~64-char chunk; the CDC analog of
    * [[minhashSigTable]], catching PARTIAL copies whole-doc sketches
    * miss).
    */
  def cdcChunkTable(d: DataFrame, idCol: String, textCol: String): DataFrame = d
    .select(
      col(idCol).as("id"),
      col(textCol).as("t"),
      graft.functions.GraftFunctions.cdcChunkStarts(col(textCol)).as("s"))
    .select(
      col("id"),
      explode(zip_with(
        col("s"),
        concat(
          slice(col("s"), lit(2), greatest(size(col("s")) - 1, lit(0))),
          array(length(col("t")) + 1)),
        (st, en) => col("t").substr(st, en - st))).as("c"))
    .select(col("id"), md5(col("c")).as("h"))
    .distinct()
    .ckpt()

  /** Chunk-level admission gate over a PERSISTED index — the streaming
    * ingest shape: reject an incoming doc when ≥ `minShared` of its
    * distinct chunks already exist in the index (partial-copy re-crawl),
    * or when it shares ≥ `minShared` chunks with a SMALLER-id doc of the
    * same batch. The corpus check is a LEFT-SEMI existence probe (no
    * pair enumeration); the within-batch pair join df-caps batch-hot
    * chunks first (the [[jaccardPairs]] pre-pass discipline). Returns
    * `keep_id` — the caller appends the admitted docs' `(id, h)` rows
    * straight back to the index.
    *
    * The df-cap trades recall in pair MINING, but in an ADMISSION gate
    * that loss inverts: a duplicate cluster larger than `maxBatchDf`
    * arriving in ONE batch shares only hot chunks and would be admitted
    * wholesale — the heaviest duplication evading the gate precisely
    * because it is too duplicated (round-9 advice). So docs whose chunk
    * set is ENTIRELY batch-hot get an exact fallback: one md5
    * fingerprint over the doc's sorted chunk-hash set (per-doc bounded
    * collect), keep only the smallest id per fingerprint. Residual
    * window, documented: an all-hot-chunk doc that is a NEAR-copy (same
    * hot chunks, different set) of a smaller-id batch doc is still
    * admitted; catching it needs the pair join the cap exists to
    * prevent — size `maxBatchDf` to expected per-batch duplication.
    */
  def cdcGateFromIndex(
      indexH: DataFrame,
      chI: DataFrame,
      minShared: Long = 2,
      maxBatchDf: Long = 20
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vsCorpus = chI
      .join(indexH.select(col("h")).distinct(), Seq("h"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("sc"))
      .filter(col("sc") >= minShared)
      .select(col("id"))
    val hot = chI.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxBatchDf).select(col("h"))
    val kept = chI.join(hot, Seq("h"), "left_anti")
    val within = kept.as("a")
      .join(kept.as("b"), col("a.h") === col("b.h") && col("b.id") < col("a.id"))
      .groupBy(col("a.id").as("id"), col("b.id").as("o"))
      .agg(count(lit(1)).as("sc"))
      .filter(col("sc") >= minShared)
      .select(col("id")).distinct()
    // exact fallback for all-hot-chunk docs (the >maxBatchDf cluster)
    val allHot = chI.select(col("id")).distinct()
      .join(kept.select(col("id")).distinct(), Seq("id"), "left_anti")
    val fpDup = chI.join(allHot, Seq("id"), "left_semi")
      .groupBy(col("id"))
      .agg(md5(concat_ws(",", sort_array(collect_list(col("h"))))).as("fp"))
      .withColumn("__rk", row_number().over(Window.partitionBy(col("fp")).orderBy(col("id"))))
      .filter(col("__rk") > 1)
      .select(col("id"))
    chI.select(col("id")).distinct()
      .join(vsCorpus, Seq("id"), "left_anti")
      .join(within, Seq("id"), "left_anti")
      .join(fpDup, Seq("id"), "left_anti")
      .withColumnRenamed("id", "keep_id")
  }

  /** Sketch a corpus slice to its persistable minhash signature table
    * `(id, sig)` — the ~0.5 KB/doc artifact an incremental ingest keeps
    * between runs so each run sketches ONLY its new batch.
    */
  def minhashSigTable(
      d: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 64
  ): DataFrame = d
    .select(
      col(idCol).as("id"),
      graft.functions.GraftFunctions.shingleHashes(col(textCol), shingleN).as("eh"))
    .select(col("id"), minhashSignature(col("eh"), k).as("sig"))
    .ckpt()

  /** The gate of [[minhashIncrementalNew]] over PRE-SKETCHED signature
    * tables — the production streaming shape: the existing side is the
    * persisted index from prior runs (text never re-read, never
    * re-sketched), the incoming side is [[minhashSigTable]] of the new
    * batch. Returns `(keep_id, sig)` so the caller appends the admitted
    * signatures straight back to the index.
    */
  def minhashGateFromIndex(
      sigE: DataFrame,
      sigI: DataFrame,
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5
  ): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    def bandsOf(s: DataFrame) = s
      .select(col("id"), explode(minhashBands(col("sig"), bands, r)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val bE = bandsOf(sigE)
    val bI = bandsOf(sigI)
    // candidates: incoming × existing, and incoming × SMALLER-id incoming
    val candEI = bI.as("i")
      .join(bE.as("e"), col("i.band") === col("e.band") && col("i.bkey") === col("e.bkey"))
      .select(col("i.id").as("id_i"), col("e.id").as("id_o"))
      .distinct()
    val candII = bI.as("a")
      .join(
        bI.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("b.id") < col("a.id"))
      .select(col("a.id").as("id_i"), col("b.id").as("id_o"))
      .distinct()
    // one verify per candidate: does any counterpart cross the threshold?
    def rejectedBy(cand: DataFrame, other: DataFrame): DataFrame = cand
      .join(sigI.select(col("id").as("id_i"), col("sig").as("sig_i")), "id_i")
      .join(other.select(col("id").as("id_o"), col("sig").as("sig_o")), "id_o")
      .filter(
        (aggregate(
          zip_with(col("sig_i"), col("sig_o"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0),
          (acc, v) => acc + v
        ).cast("double") / k) >= threshold)
      .select(col("id_i"))
      .distinct()
    val rejected = rejectedBy(candEI, sigE).union(rejectedBy(candII, sigI)).distinct()
    sigI
      .join(rejected.withColumnRenamed("id_i", "id"), Seq("id"), "left_anti")
      .select(col("id").as("keep_id"), col("sig"))
  }

  /** Edit-distance-1 fuzzy key pairs via FastSS deletion-neighborhood
    * blocking (entity-resolution dedup for short keys: names, titles,
    * normalized addresses). Each string is keyed by itself plus every
    * single-character deletion; two strings within Levenshtein distance 1
    * ALWAYS share a key (equal → identity key; substitution → same-position
    * deletions agree; insert/delete → the shorter string IS a deletion of
    * the longer), so the equi-join over deletion keys is a lossless
    * candidate generator, and the final `levenshtein ≤ 1` check only
    * removes false positives (cross-position deletion collisions).
    *
    * Scale shape: pure equi-join on short string keys — no cross join
    * anywhere; candidate pairs are deduped BEFORE the verify step (the
    * round-1 lesson: never score per colliding block). `maxKeyFreq`
    * drops degenerate hot keys (e.g. a constant prefix corpus-wide) the
    * same way jaccardPairs caps document frequency. The key payload
    * carried through the join is the two short strings themselves —
    * bounded by key length, unlike sketch-vector payloads.
    *
    * Deeper radii use k-deletion neighborhoods (k ≤ 2 practical); this
    * ships the k=1 workhorse.
    */
  def editDistancePairs(
      docs: DataFrame,
      idCol: String,
      strCol: String,
      maxKeyFreq: Long = 0
  ): DataFrame = {
    val base = docs.select(col(idCol).as("id"), col(strCol).as("s"))
    // identity + every single-code-point deletion, built by ONE codegen'd
    // expression (graft_deletions) — the earlier slice/concat HOF chain
    // cost ~20 Catalyst array allocations per deletion and dominated the
    // whole operator's runtime
    val keyed = base
      .select(col("id"), col("s"),
        explode(graft.functions.GraftFunctions.deletionNeighborhood(col("s"))).as("__dk"))
    val capped =
      if (maxKeyFreq <= 0) keyed
      else {
        // global key frequency via a window on the SAME shuffle key the
        // pair join needs — no separate count job + anti-join round trip
        import org.apache.spark.sql.expressions.Window
        keyed
          .withColumn("__kf", count(lit(1)).over(Window.partitionBy(col("__dk"))))
          .filter(col("__kf") <= maxKeyFreq)
          .drop("__kf")
      }
    // Materialize the neighborhood ONCE: without this the O(len²)
    // slice-transform explode is re-evaluated on BOTH sides of the
    // self-join (the round-1 minhash lesson). The candidate join then
    // carries ids only — pairs are deduped across multi-key collisions
    // BEFORE any string moves or levenshtein runs — and the two short
    // strings are fetched back by id for the single verify pass.
    val mat = capped.ckptLazy()
    val a = mat.select(col("__dk"), col("id").as("id_a"))
    val b = mat.select(col("__dk"), col("id").as("id_b"))
    val pairs = a.join(b, "__dk")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val strs = mat.select(col("id"), col("s")).distinct()
    pairs
      .join(strs.select(col("id").as("id_a"), col("s").as("s_a")), "id_a")
      .join(strs.select(col("id").as("id_b"), col("s").as("s_b")), "id_b")
      // one linear banded scan per pair (graft_ed1: 0/1/NULL), not the
      // O(|a|·|b|) levenshtein DP the <=1 filter would mostly throw away
      .withColumn("dist", graft.functions.GraftFunctions.ed1(col("s_a"), col("s_b")))
      .filter(col("dist").isNotNull)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** MinHash + LSH banded near-dup candidate pairs.
    *
    * shingle(n) → xxhash64 → k-minhash signature → b bands of r rows →
    * explode bands → self-join on (band, key) → estimate Jaccard as the
    * fraction of agreeing signature positions → filter.
    *
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b, distinct.
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5
  ): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    // Stage 1: materialize the shingle-hash array as a REAL column before
    // building the signature. Passing the expression tree inline would make
    // Catalyst re-evaluate the whole tokenize→shingle→hash pipeline inside
    // the k-iteration signature lambda (k=64× per row) — the round-1
    // scale-killer (477 s for 5k docs).
    val hashes = docs.select(
      col(idCol).as("id"),
      graft.functions.GraftFunctions.shingleHashes(col(textCol), shingleN).as("eh")
    )
    // Stage 2: (id, sig) — k longs per doc. localCheckpoint materializes it
    // once so the band join and pair scoring both read the tiny signature
    // table instead of recomputing the text pipeline (3× otherwise). On a
    // cluster this is the classic persist-the-sketches step: signatures are
    // ~0.5 KB/doc regardless of document size.
    val sigs = hashes
      .select(col("id"), minhashSignature(col("eh"), k).as("sig"))
      .ckptLazy()
    // Stage 3: band keys carry IDs ONLY — never drag the 64-element
    // signature array through the explode + shuffle.
    val banded = sigs
      .select(col("id"), explode(minhashBands(col("sig"), bands, r)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    // Stage 4: candidate pairs, deduped BEFORE scoring — a pair colliding
    // in several bands is scored once, not `bands` times.
    val pairs = banded
      .as("a")
      .join(
        banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id")
      )
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // Stage 5: score each surviving pair once via two slim signature joins.
    val sa = sigs.select(col("id").as("id_a"), col("sig").as("sig_a"))
    val sb = sigs.select(col("id").as("id_b"), col("sig").as("sig_b"))
    pairs
      .join(sa, "id_a")
      .join(sb, "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        (aggregate(
          zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0),
          (acc, v) => acc + v
        ).cast("double") / k).as("est_jaccard")
      )
      .filter(col("est_jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 64-bit simhash, blocked on three-block
    * COMBINATION keys ([[TextOps.simhashComboKeys]], Manku et al. WWW'07 —
    * hamming ≤ k corrupts ≤ k of k+3 blocks, so 3 uncorrupted blocks
    * always form a shared 3·64/(k+3)-bit key), verified by exact hamming
    * distance. Exact recall like single-chunk banding, but candidate
    * noise is n²/2^32 per key instead of n²/2^16 — single-chunk blocking
    * measured a 1.85 shuffle-bytes scaling exponent on a 10× corpus step
    * (birthday-quadratic); combination blocking holds it near-linear.
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3
  ): DataFrame =
    simhashPairsFromHashes(
      docs, idCol,
      graft.functions.GraftFunctions.tokenHashes(col(textCol)), maxHamming)

  /** [[simhashPairs]] with a caller-supplied token-hash column
    * (array<long>) in place of the default xxhash64 tokenizer. The hash
    * family is a parameter of the sketch, not of the blocking/verify
    * plan: a portable family (e.g. md5-derived, computable by any engine)
    * makes the whole pipeline's output exactly reproducible cross-engine,
    * which is how q_dedup_simhash carries a full DuckDB oracle.
    */
  def simhashPairsFromHashes(
      docs: DataFrame,
      idCol: String,
      tokenHashes: Column,
      maxHamming: Int = 3
  ): DataFrame = {
    // Same shape as minhashPairs: materialized signature table, id-only
    // band join, pair-dedup before the hamming verification. The 64-bit
    // signature is PACKED into one long at sketch time: every downstream
    // shuffle carries 8 bytes instead of a 64-element array, block keys
    // are shift/mask, and the verify is codegen'd bit_count(a ^ b).
    val sigs = docs
      .withColumn("__th", tokenHashes)
      .select(col(idCol).as("id"), packBits(simhashBits("__th")).as("bits"))
      .ckptLazy()
    val chunked = sigs
      .select(col("id"), explode(simhashComboKeys(col("bits"), maxHamming)).as("ck"))
      .select(col("id"), col("ck.combo").as("combo"),
        col("ck.b0").as("b0"), col("ck.b1").as("b1"), col("ck.b2").as("b2"))
    val pairs = chunked
      .as("a")
      .join(
        chunked.as("b"),
        col("a.combo") === col("b.combo") && col("a.b0") === col("b.b0") &&
          col("a.b1") === col("b.b1") && col("a.b2") === col("b.b2") &&
          col("a.id") < col("b.id")
      )
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val ba = sigs.select(col("id").as("id_a"), col("bits").as("bits_a"))
    val bb = sigs.select(col("id").as("id_b"), col("bits").as("bits_b"))
    pairs
      .join(ba, "id_a")
      .join(bb, "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        bit_count(col("bits_a").bitwiseXOR(col("bits_b"))).cast("int").as("hamming_dist"))
      .filter(col("hamming_dist") <= maxHamming)
  }

  /** Connected components over near-dup pairs — the closing step of fuzzy
    * dedup: duplicate clusters are the components; the canonical document
    * is each component's minimum id.
    *
    * Iterative min-label propagation WITH POINTER HALVING on DataFrames
    * (no graph library): every node starts labeled with itself; each
    * round takes the min of its own label and its neighbors' labels, then
    * SHORTCUTS `label := label(label)` (the union-find path-halving jump,
    * cf. Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14 — star contraction serves the same purpose). Labels only
    * decrease and always name a node of the same component, so the
    * shortcut is correctness-free; it squares propagation distance per
    * round, turning O(diameter) rounds into ~O(log diameter) — an
    * adversarial 2000-hop paragraph chain closes in ~12 rounds instead
    * of 2000 (DedupSpec asserts it). The hop adds one labels-sized join
    * per round (~15% on shallow-cluster corpora at sf0.1) and buys the
    * exponential round reduction on deep chains — the failure mode this
    * kills is the loud maxIter abort on a >20-hop cluster, which
    * paragraph-chain duplicates at corpus scale can genuinely produce.
    * Stop when no label changes. Each
    * round `localCheckpoint`s the labels: iterative DataFrame loops
    * otherwise stack lineage until planning itself becomes the
    * bottleneck (the classic iterative-algorithm trap).
    *
    * Input: (id_a, id_b) pair columns. Output: (id, component) where
    * component = min id reachable.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // Lazy checkpoints + ONE action per round (the round-13 barrier-job
    // optimization, guide §1.2): the convergence count below is the only
    // blocking action each round — it materializes that round's lazy
    // checkpoints (edges on round 1), which stay cached for the next
    // round and the final consumer. Same lineage truncation, same block
    // reuse as the eager form, ~3× fewer serial jobs per round.
    val edges = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .ckptLazy()
    var labels = edges
      .select(col("src").as("id"))
      .distinct()
      .withColumn("component", col("id"))
      .ckptLazy()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // min over own label and neighbor labels
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("component", "ncomp"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("ncomp")).as("nmin"))
      // Carry the old label through the propagation select so convergence
      // detection is a filter on the SAME checkpointed frame — not a second
      // join+shuffle against the previous labels per round.
      val propagated = labels
        .join(neighborMin, Seq("id"), "left_outer")
        .select(
          col("id"),
          col("component").as("old"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("component")
        )
        // feeds BOTH sides of the hop join below — checkpoint (lazily) so
        // the edge join above runs once, cached inside the round's count job
        .ckptLazy()
      // pointer halving: follow the label one hop (label(label(u))).
      // Every label is a node id of the same component, so the jump can
      // only move the label DOWN within the component — safe, and it
      // doubles how far a min travels per round.
      val hop = propagated
        .select(col("id").as("component"), col("component").as("c2"))
      val next = propagated
        .join(hop, Seq("component"), "left_outer")
        .select(
          col("id"),
          col("old"),
          least(col("component"), coalesce(col("c2"), col("component"))).as("component")
        )
        .ckptLazy()
      // the round's ONE action: drives convergence AND materializes the
      // round's lazy checkpoints (a limit-short-circuiting isEmpty would
      // leave partitions for the checkpoint-completion job to redo)
      val changed = next.filter(col("component") =!= col("old")).count() > 0
      labels = next.select(col("id"), col("component"))
      converged = !changed
      iter += 1
    }
    // Fail LOUD on non-convergence: returning partially-propagated labels
    // would silently split duplicate clusters. Components wider than
    // maxIter hops are pathological for near-dup graphs; raise maxIter
    // deliberately rather than trusting a wrong answer.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter iterations; " +
          "raise maxIter (component diameter exceeds it)")
    labels
  }

  /** Span-level exact substring dedup — the arbitrary-alignment sibling
    * of [[paragraphDedup]] (which can only see fixed token blocks), after
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better" (ACL'22): every W-token window of every document is
    * fingerprinted; the corpus-wide FIRST instance (minimum (doc, pos))
    * of each fingerprint owns it, and every token lying inside any LATER
    * instance of a repeated window is removed; documents reassemble from
    * the surviving tokens. Catches boilerplate/quotation overlap at any
    * offset — including repeats WITHIN one document — that block-aligned
    * dedup misses. Removal is deliberately aggressive (a token inside any
    * duplicate window instance goes, even where instances overlap the
    * owner): dedup for training corpora prefers dropping a span twice to
    * keeping it twice.
    *
    * Scale shape: one posexplode to (fp, doc, pos) — linear in corpus
    * tokens; first-instance selection is the same skew-safe min-struct
    * groupBy as paragraphDedup; coverage explode is W× the DUPLICATE
    * windows only (not the corpus); never any pair enumeration. The
    * tokenized array is checkpointed once and feeds windowing, token
    * explode and counts.
    *
    * Output: (id, n_tokens, n_dup_tokens, clean_text).
    */
  def spanDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 20
  ): DataFrame = {
    val w = windowTokens
    require(w >= 2, "windowTokens must be at least 2")
    val toks = docs
      .select(col(idCol).as("id"), split(normText(col(textCol)), " ").as("ts"))
      .ckptLazy()
    val wins = toks
      .filter(size(col("ts")) >= w)
      .select(
        col("id"),
        posexplode(transform(
          sequence(lit(0), size(col("ts")) - w),
          p => md5(encode(concat_ws(" ", slice(col("ts"), p + 1, lit(w))), "UTF-8")))))
      .select(col("id"), col("pos"), col("col").as("fp"))
    // corpus-wide first instance per fingerprint (skew-safe min-struct)
    val owner = wins.groupBy(col("fp")).agg(min(struct(col("id"), col("pos"))).as("own"))
    val dups = wins
      .join(owner, "fp")
      .filter(!(col("id") === col("own.id") && col("pos") === col("own.pos")))
      .select(col("id"), col("pos"))
    // tokens covered by any duplicate window instance
    val covered = dups
      .select(col("id"), explode(sequence(col("pos"), col("pos") + w - 1)).as("tpos"))
      .distinct()
    val tokens = toks
      .select(col("id"), posexplode(col("ts")))
      .select(col("id"), col("pos").as("tpos"), col("col").as("tok"))
    val kept = tokens
      .join(covered, Seq("id", "tpos"), "left_anti")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_kept"),
        concat_ws(
          " ",
          transform(
            array_sort(collect_list(struct(col("tpos"), col("tok")))),
            x => x.getField("tok"))).as("clean_text"))
    toks
      .select(col("id"), size(col("ts")).cast("long").as("n_tokens"))
      .join(kept, Seq("id"), "left_outer")
      .select(
        col("id"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_dup_tokens"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Train/test n-gram contamination audit (decontamination): for each
    * document in `test`, the fraction of its distinct n-gram shingles that
    * appear ANYWHERE in `train` — the standard check that evaluation data
    * did not leak into a training corpus.
    *
    * Shape at scale: both sides explode to (id, shingle) inverted-index
    * rows; the train side collapses to distinct shingles; the probe is one
    * equi-join keyed on the shingle (AQE-skew-handled) and one per-doc
    * aggregate. Linear in corpus size — never a doc×doc comparison.
    *
    * Output: (id, n_shingles, n_hit, contamination) per test doc.
    */
  def contamination(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 5
  ): DataFrame = {
    val testSh = test
      .select(col(idCol).as("id"), graft.functions.GraftFunctions.shingles(col(textCol), shingleN))
      .select(col("id"), col("shingle").as("s"))
    val trainSh = train
      .select(graft.functions.GraftFunctions.shingles(col(textCol), shingleN))
      .select(col("shingle").as("s"))
      .distinct()
      .withColumn("__hit", lit(1))
    testSh
      .join(trainSh, Seq("s"), "left_outer")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hit")
      )
      .select(
        col("id"),
        col("n_shingles"),
        col("n_hit"),
        (col("n_hit").cast("double") / col("n_shingles").cast("double")).as("contamination")
      )
  }

  /** Exact n-gram Jaccard near-dup pairs via an inverted shingle index:
    * explode distinct shingles → self-join on shingle → common-count c;
    * |A ∪ B| = |A| + |B| − c. No approximation; the shuffle key is the
    * shingle, so no cross join ever materializes.
    *
    * `maxDocFreq` drops shingles appearing in more than that many docs
    * (boilerplate guard at scale); 0 disables.
    */
  def jaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.5,
      maxDocFreq: Long = 0L
  ): DataFrame = {
    // Materialize the exploded (id, shingle) inverted index ONCE — it feeds
    // the df-cap computation, both self-join sides, and the size table;
    // left lazy, the tokenize→shingle pipeline would run 4-5×.
    val sh = docs
      .select(col(idCol).as("id"), graft.functions.GraftFunctions.shingles(col(textCol), shingleN))
      .select(col("id"), col("shingle").as("s"))
      .ckptLazy()
    val filtered =
      if (maxDocFreq > 0) {
        val hot = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDocFreq).select(col("s"))
        sh.join(hot, Seq("s"), "left_anti").ckptLazy()
      } else sh
    val sizes = filtered.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val a = filtered.as("a")
    val b = filtered.as("b")
    val common = a
      .join(b, col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c")).cast("double")).as("jaccard")
      )
      .filter(col("jaccard") >= threshold)
  }

  /** b-bit minhash Jaccard estimation (Li & König, WWW'10): store only
    * the lowest `b` bits of each of the k minhash values — a 64/b×
    * signature-memory reduction (b = 4: 32 bytes/doc instead of 512),
    * THE trick that makes billion-document minhash indexes fit in RAM.
    * Lower bits of non-matching minima still collide with probability
    * C = 2^-b, so the raw b-bit match rate E is debiased as
    * Ĵ = (E − C)/(1 − C).
    *
    * Returned per exact pair (jaccard ≥ threshold): the EXACT Jaccard
    * (replayable in SQL) plus the b-bit estimate — callers gate on
    * |Ĵ − J| ≤ bound (the bound-encoded oracle pattern; the estimator's
    * std at k = 64, b = 4 is ≈ 0.07).
    *
    * Scale shape: [[jaccardPairs]]' inverted-index join for the pair set,
    * one signature table (k b-bit values per doc, built once), two slim
    * id-keyed joins to score — the estimate itself is row-local.
    */
  def bbitMinhashScores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 64,
      b: Int = 4,
      threshold: Double = 0.35
  ): DataFrame = {
    require(b >= 1 && b <= 32, "b must be in [1, 32]")
    val pairs = jaccardPairs(docs, idCol, textCol, shingleN, threshold)
    val mask = (1L << b) - 1
    val sigs = docs
      .select(col(idCol).as("id"),
        graft.functions.GraftFunctions.shingleHashes(col(textCol), shingleN).as("eh"))
      .select(col("id"),
        transform(minhashSignature(col("eh"), k), s => s.bitwiseAND(lit(mask))).as("bsig"))
      .ckptLazy()
    val c = 1.0 / (1L << b).toDouble
    val e = aggregate(
      zip_with(col("bsig_a"), col("bsig_b"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / k
    pairs
      .join(sigs.select(col("id").as("id_a"), col("bsig").as("bsig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("bsig").as("bsig_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("jaccard"),
        ((e - lit(c)) / lit(1.0 - c)).as("est_bbit"))
  }

  /** Exact shingle CONTAINMENT pairs: c / min(|A|, |B|) over the same
    * inverted index as [[jaccardPairs]]. Containment is the asymmetric
    * near-dup signal Jaccard structurally misses — a short document
    * embedded verbatim in a long one has Jaccard ≈ |A|/|B| (tiny) but
    * containment ≈ 1; this is the quote/excerpt/boilerplate-inclusion
    * detector a training-corpus pipeline runs NEXT TO whole-document
    * dedup. Same scale shape: shingle-keyed equi-join, df-cap for
    * boilerplate, ids only until the final select.
    */
  def containmentPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.5,
      maxDocFreq: Long = 0L
  ): DataFrame = {
    val sh = docs
      .select(col(idCol).as("id"), graft.functions.GraftFunctions.shingles(col(textCol), shingleN))
      .select(col("id"), col("shingle").as("s"))
      .ckptLazy()
    val filtered =
      if (maxDocFreq > 0) {
        val hot = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDocFreq).select(col("s"))
        sh.join(hot, Seq("s"), "left_anti").ckptLazy()
      } else sh
    val sizes = filtered.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val common = filtered.as("a")
      .join(filtered.as("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        (col("c").cast("double") / least(col("na"), col("nb")).cast("double")).as("containment")
      )
      .filter(col("containment") >= threshold)
  }

  /** Prefix-filtering exact similarity join (the AllPairs/PPJoin family —
    * Bayardo et al. WWW'07, Xiao et al. WWW'08): exact shingle-set Jaccard
    * ≥ `threshold` with RECALL 1, the lossless alternative to
    * [[jaccardPairs]]'s df-cap. Rank every shingle by global rarity
    * (ascending document frequency, ties on the shingle itself); a set of
    * size n only needs its first `n − ⌈t·n⌉ + 1` rarest shingles indexed:
    * if J(A,B) ≥ t then |A∩B| ≥ ⌈t·max(|A|,|B|)⌉, and the globally
    * SMALLEST shared shingle must sit inside both prefixes (everything
    * before it in either list is unshared, and the intersection can't fit
    * behind it) — so the prefix equi-join finds every qualifying pair.
    *
    * Scale shape: the inverted index shrinks from every posting to the
    * prefix postings, and because ranking is by ASCENDING df the prefixes
    * are made of the rarest shingles — exactly the ones with short
    * posting lists. Hot boilerplate shingles (the ones the df-cap
    * discards, changing the answer) land in suffixes and never generate a
    * candidate, yet still count in the exact verify. Candidates are
    * id-pairs only, deduped before the verify; the verify attaches each
    * doc's 8-byte shingle-hash ARRAY once per pair and intersects
    * row-locally — never the (pair × shingle) row stream, whose sort is
    * the hidden quadratic-constant at high duplication density (round-12:
    * 1.6B rows at the sf10syn tier). Each stage is a plain equi-join/
    * aggregate over fixed-width keys — linear in postings, never
    * all-pairs, no broadcast of corpus-scaled sides (merge/shuffle_hash
    * pins where size ESTIMATES once elected a fatal broadcast).
    *
    * RESIDUAL WINDOW (the capped-gate documentation convention): every
    * stage keys on a single 60-bit md5 half. A collision MERGES two
    * distinct shingles corpus-wide: candidates can only be ADDED
    * (recall stays 1), and a verified Jaccard can only be inflated,
    * by at most 1 intersection count per colliding pair, and only for
    * doc pairs containing BOTH colliding shingles. Expected colliding
    * shingle pairs ≈ S²/2⁶¹: ~3e-6 at the 2.7M-shingle sf10syn tier
    * (where the string-semantics oracle would fail LOUDLY on one) and
    * ~43 corpus-wide at a 10¹⁰-distinct-shingle 100 TB corpus — each
    * inflating J of its few affected pairs by ≤ ~1/|shingles per doc|
    * (~2% at 50-shingle docs), never a corpus-wide drift. Widening the
    * verify to 120-bit (h, h2) structs was measured at 2.9× verify-
    * stage shuffle (432 vs 152 MB at sf0.1) — the documented 60-bit
    * window is the better trade at every realistic scale.
    */
  def prefixFilterPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.5
  ): DataFrame = {
    // (id, h): shingles mapped to 60-bit portable md5 keys — FIXED-WIDTH
    // shuffle rows (this file's design contract), replacing the ~40-byte
    // shingle strings the round-11 plan shuffled through every stage.
    // conv(md5[1:15], 16, 10) is always positive, so the (df, h) ranking
    // tie-break is a total order any engine sorts identically. Hashing is
    // answer-preserving up to the 60-bit residual window quantified in
    // the Scaladoc above (round-12 ADVICE; the string-semantics oracle
    // fails LOUDLY if a collision ever lands at a tested tier).
    val sh = docs
      .select(col(idCol).as("id"), graft.functions.GraftFunctions.shingles(col(textCol), shingleN))
      .select(col("id"),
        conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long").as("h"))
      .ckptLazy()
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    // dfreq is merge-hinted: the round-11 decade-2 failure (PlanProbe-
    // reproduced: notEnoughMemoryToBuildAndBroadcast under the default
    // 8 GiB driver) was THIS join electing a broadcast build of the
    // shingle-df table from an aggregate-size underestimate — 2.7M rows
    // real at sf10syn. A shuffle-linear plan must not depend on a
    // driver-memory rescue; the vocabulary-scaled df side is never
    // legitimately broadcastable at 100 TB.
    val dfreq = sh.groupBy(col("h")).agg(count(lit(1)).as("df")).hint("merge")
    val ranked = sh
      .join(dfreq, "h")
      .withColumn(
        "pos",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("id"))
            .orderBy(col("df"), col("h"))))
    val prefix = ranked
      .join(sizes, "id")
      .filter(col("pos") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select(col("id"), col("h"), col("n"))
      .ckptLazy()
    // size filter (lossless): J(a,b) >= t implies min(na,nb) >= t*max(na,nb),
    // so both n-bounds hold for every surviving pair — pruning candidates
    // inside the posting join, before the pair-distinct shuffle. Merge-
    // hinted for the same estimate-elected-broadcast guard as dfreq
    // (prefix is 13.4M rows at sf10syn; sorting 8-byte-keyed rows is cheap).
    val cands = prefix.hint("merge").as("a")
      .join(prefix.hint("merge").as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
          col("a.n").cast("double") >= lit(threshold) * col("b.n").cast("double") &&
          col("b.n").cast("double") >= lit(threshold) * col("a.n").cast("double"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // Exact verify: per-doc hash ARRAYS + row-local intersection — NOT the
    // (pair × shingle) row stream. At sf10syn that stream is 31M pairs ×
    // 52 shingles ≈ 1.6 BILLION rows; shuffling AND sort-spilling it is
    // what exhausted this box's disk once the broadcast rescue was banned
    // (round-12 finding). The array layout carries each pair ONCE
    // (~0.5 KB), shuffles ~14 GB instead of ~50 GB, and the shuffle_hash
    // hints stream it against tiny per-partition maps of the doc-count-
    // scaled array table — no giant sort exists anywhere in the plan.
    // |intersect| is order-independent, so the unsorted collect_list is
    // deterministic evidence.
    val arr = sh.groupBy(col("id")).agg(collect_list(col("h")).as("hs"))
      .ckptLazy() // probed twice (id_a and id_b sides)
    cands
      .join(arr.select(col("id").as("id_a"), col("hs").as("ha")).hint("shuffle_hash"), "id_a")
      .join(arr.select(col("id").as("id_b"), col("hs").as("hb")).hint("shuffle_hash"), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("ha"), col("hb"))).cast("long").as("c"),
        size(col("ha")).cast("long").as("na"),
        size(col("hb")).cast("long").as("nb"))
      .select(
        col("id_a"),
        col("id_b"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c")).cast("double")).as("jaccard")
      )
      .filter(col("jaccard") >= threshold)
  }

  /** Paragraph-level exact dedup (Dolma/RefinedWeb-style): documents are
    * segmented into paragraphs, each paragraph is kept only at its FIRST
    * occurrence corpus-wide (lowest (doc, position)), and surviving
    * paragraphs are reassembled in order — removing boilerplate and
    * partial duplication that whole-document dedup can't touch, without
    * dropping whole documents. Documents whose every paragraph was seen
    * earlier vanish entirely.
    *
    * This corpus has no newline structure, so "paragraph" here is a fixed
    * window of `paraTokens` tokens; with real data pass pre-split
    * paragraphs through the same first-occurrence core.
    *
    * Shape at scale: explode to (doc, pos, para) rows; the first
    * occurrence is a groupBy(para).min(struct(doc, pos)) + one equi-join
    * back — NOT a window partitioned by para, whose hot partitions
    * (boilerplate repeated across 1% of a 100 TB corpus) would pile onto
    * one task; the partial min aggregate absorbs hot paragraphs map-side.
    * Reassembly groups by doc with an ordered in-group sort. Three
    * shuffles total, no pairwise comparisons anywhere.
    *
    * Output: (idCol, n_paras, n_kept, clean_text).
    */
  def paragraphDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      paraTokens: Int
  ): DataFrame = {
    require(paraTokens > 0, "paraTokens must be positive")
    val w = lit(paraTokens)
    val toks = docs.select(col(idCol), split(col(textCol), " ").as("__ts"))
    val para = toks
      .select(
        col(idCol),
        posexplode(
          transform(
            sequence(lit(0L), ceil(size(col("__ts")) / w.cast("double")).cast("long") - 1),
            i => array_join(slice(col("__ts"), (i * w + 1).cast("int"), lit(paraTokens)), " "))))
      .withColumnRenamed("pos", "pidx")
      .withColumnRenamed("col", "para")
    val first = para
      .groupBy(col("para"))
      .agg(min(struct(col(idCol).as("d"), col("pidx").as("p"))).as("__f"))
    val kept = para
      .join(first, "para")
      .filter(col(idCol) === col("__f.d") && col("pidx") === col("__f.p"))
      .drop("__f")
    val counts = para.groupBy(col(idCol)).agg(count(lit(1)).as("n_paras"))
    kept
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pidx"), col("para")))),
            p => p.getField("para")),
          " ").as("clean_text"))
      .join(counts, idCol)
      .select(col(idCol), col("n_paras"), col("n_kept"), col("clean_text"))
  }

  /** Canonical-document selection: given dup-cluster labels (the
    * [[connectedComponents]] output) pick ONE representative per cluster —
    * the highest-scoring doc, ties to the smallest id — and report cluster
    * size. Docs in no cluster (the vast majority of a real corpus) are
    * their own singleton representative via the left join + coalesce, so
    * the output is a total keep-decision table: exactly one row per
    * distinct component, `n_docs - 1` drops implied per row.
    *
    * The reference keeps only a latest-value CTable upsert
    * (callysto/src/table/table.rs:93-98); "best of an equivalence class"
    * is the corpus-dedup generalization a training pipeline needs (drop
    * near-dups but keep the longest/cleanest copy).
    *
    * Scale shape: one left join on id (clusters frame is CC output — tiny
    * next to the corpus, broadcastable) and one groupBy(component) with a
    * struct-max — partial-aggregated map-side, so the shuffle carries one
    * (score, id) pair per component per task, never the corpus. The
    * argmax is `max(struct(score, -id))`: lexicographic struct ordering
    * gives score-desc, id-asc in a single mergeable aggregate (a window
    * row_number would sort whole partitions for rank 1 — same answer,
    * strictly more work).
    *
    * @param docs       corpus with `idCol` and `scoreCol`
    * @param components (id, component) labels from [[connectedComponents]]
    * @param scoreCol   quality score to maximize (length, LM score, ...)
    * @return (component, rep_id, rep_score, n_docs)
    */
  /** Sorted-neighborhood near-dup candidate pairs (Hernández & Stolfo's
    * merge/purge method): sort the corpus by a blocking key (prefix of the
    * normalized text), then compare each row only against the `window`
    * rows that follow it in the total order, verifying candidates with
    * exact token-set Jaccard. The classic cheap screen for corpora whose
    * duplicates share a prefix — O(n·window) candidate pairs by
    * construction, no inverted index to build.
    *
    * Scale shape: the total order comes from
    * [[Sampling.globalIndexBy]] (range-partitioned sort + per-partition
    * offset enumeration — no single-partition window); neighbor pairing
    * is an equi-join on ⌊rank/window⌋ buckets with each right row
    * replicated into its predecessor bucket, so a pair at rank distance
    * ≤ window meets in exactly one bucket. Jaccard verification is
    * row-local on the joined pair.
    *
    * @return (id_a, id_b, rank_gap, jaccard) with jaccard ≥ minJaccard
    */
  def sortedNeighborhoodPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      prefixLen: Int,
      window: Int,
      minJaccard: Double
  ): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(prefixLen >= 1, "prefixLen must be >= 1")
    val toks = array_distinct(filter(tokens(col(textCol)), x => length(x) > 0))
    val keyed = docs.select(
      col(idCol).as("id"),
      substring(normText(col(textCol)), 1, prefixLen).as("bk"),
      toks.as("toks"))
    val ranked = Sampling
      .globalIndexBy(keyed, Seq(col("bk"), col("id")))
      .withColumn("bucket", ((col("global_idx") - 1) / window).cast("long"))
    val left = ranked.select(
      col("id").as("id_a"), col("toks").as("toks_a"),
      col("global_idx").as("idx_a"), col("bucket"))
    val rightBase = ranked.select(
      col("id").as("id_b"), col("toks").as("toks_b"),
      col("global_idx").as("idx_b"), col("bucket"))
    // a sees b iff idx_b ∈ (idx_a, idx_a + window]; b then lives in a's
    // bucket or the next one — replicating b one bucket down makes every
    // qualifying pair meet exactly once
    val right = rightBase.union(rightBase.withColumn("bucket", col("bucket") - 1))
    left
      .join(right, Seq("bucket"))
      .filter(col("idx_b") > col("idx_a") && col("idx_b") <= col("idx_a") + window)
      .withColumn("ni", size(array_intersect(col("toks_a"), col("toks_b"))))
      .withColumn("uni", size(array_union(col("toks_a"), col("toks_b"))))
      .filter(col("uni") > 0)
      .withColumn("jaccard", round(col("ni").cast("double") / col("uni").cast("double"), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"),
        (col("idx_b") - col("idx_a")).as("rank_gap"), col("jaccard"))
  }

  def clusterRepresentatives(
      docs: DataFrame,
      idCol: String,
      components: DataFrame,
      scoreCol: String
  ): DataFrame = {
    val labeled = docs
      .join(components.withColumnRenamed("id", idCol), Seq(idCol), "left_outer")
      .select(
        col(idCol),
        coalesce(col("component"), col(idCol)).as("component"),
        col(scoreCol))
    labeled
      .groupBy(col("component"))
      .agg(
        max(struct(col(scoreCol).as("s"), (-col(idCol)).as("negid"))).as("__best"),
        count(lit(1)).as("n_docs"))
      .select(
        col("component"),
        (-col("__best.negid")).as("rep_id"),
        col("__best.s").as("rep_score"),
        col("n_docs"))
  }

  // ——— Bloom-filter admission gate (q_dedup_bloom_gate, StreamBloomDedupSpec)

  /** Normalized content fingerprint — the exact-dedup key ([[exact]]'s
    * hash) as (id, fp) rows, the input to the Bloom position derivation
    * and to the exact-fingerprint fallback check.
    */
  def contentFp(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      md5(encode(normText(col(textCol)), "UTF-8")).as("fp"))

  /** k md5-derived Bloom positions of each fingerprint into [0, mBits).
    * `mBits` is a Column so callers can size bits-per-key from a measured
    * count (the batch audit) or pin a config constant (the stream gate);
    * position j = first 8 hex chars of md5(fp ":" j) mod mBits — exactly
    * replayable in any engine with md5.
    */
  def bloomPositions(fps: DataFrame, k: Int, mBits: Column): DataFrame =
    fps
      .select(col("id"), col("fp"), mBits.as("__m"),
        explode(sequence(lit(1), lit(k))).as("j"))
      .select(col("id"), col("fp"),
        (conv(substring(md5(concat(col("fp"), lit(":"), col("j"))), 1, 8), 16, 10)
          .cast("long") % col("__m")).as("pos"))

  /** Per-probe Bloom verdict against a position index: bloom_hit ⇔ all k
    * positions are set. A membership SEMI-probe on the integer position
    * key — never a pair enumeration — so the gate costs k index lookups
    * per doc at any corpus size. One-sided by construction: a true dup's
    * positions were all set by its own copy, so false NEGATIVES are
    * impossible; bloom-hits are suspects that the caller routes through
    * the exact fingerprint check (the cap-inversion rule's fallback).
    */
  def bloomVerdict(indexPos: DataFrame, probePos: DataFrame, k: Int): DataFrame =
    probePos
      .join(indexPos.select(col("pos").as("ipos")).distinct(),
        col("pos") === col("ipos"), "left")
      .groupBy(col("id"), col("fp"))
      .agg((count(col("ipos")) === k).as("bloom_hit"))
}
