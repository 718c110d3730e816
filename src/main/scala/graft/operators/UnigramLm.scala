package graft.operators

import graft.engine.PlanOnly.syntax._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Unigram-LM subword tokenizer training (Kudo 2018, the SentencePiece
  * unigram model) — the missing sibling of [[TextOps.bpeTrain]] in the
  * tokenizer story (round-11 verdict #5): where BPE GROWS a vocabulary
  * bottom-up by merging, the unigram model PRUNES a large seed-candidate
  * set top-down, re-estimating piece likelihoods between rounds, and
  * segments by maximum-likelihood Viterbi decoding.
  *
  * This is the hard-EM (Viterbi-EM) variant, chosen so every step is
  * EXACTLY replayable cross-engine (the q_seq_viterbi discipline):
  *   - piece log-likelihoods are quantized IN-ENGINE to integer micro-log
  *     units w = q6(ln(cnt+1)) − q6(ln(total+V)) (add-one smoothing; both
  *     engines quantize the same integer-valued doubles — boundary risk
  *     ~1e-7/weight, the accepted q_text_naive_bayes convention);
  *   - the E-step segments each word by INTEGER max-plus Viterbi (ties:
  *     the longer piece wins, then by the deterministic k-ascending scan);
  *   - the M-step recounts usage from the Viterbi segmentation and prunes
  *     unused multi-char pieces (single chars are never pruned, so
  *     segmentation stays total).
  *
  * Scale shape: the unigram model NEVER trains on the corpus — like
  * [[TextOps.bpeTrain]] it trains on the word-frequency table, which the
  * caller bounds (top-W words); everything here is arithmetic over that
  * bounded table. The per-round vocabulary collect is a bounded
  * model-size collect (≤ chars + maxVocab rows — the ANN-codebook class),
  * and the Viterbi fold is ONE `aggregate` HOF pass per word, row-local,
  * no shuffle beyond the bounded group-bys.
  *
  * Reference analog: none — callysto has no text surface (SURVEY.md
  * §1.2); this extends the LLM-data-pipeline tokenizer family.
  */
object UnigramLm {

  /** Max candidate piece length (SentencePiece defaults are longer; 4
    * keeps the seed enumeration and the oracle's 4-way DP joins aligned).
    */
  val MaxPieceLen: Int = 4

  /** Max-plus -infinity: far below any real path score (scores are
    * micro-logs ≥ −3e7 per piece × ≤ word length), far above Long.Min/2
    * so MINF + MINF cannot overflow.
    */
  val Minf: Long = -(1L << 60)

  /** Integer micro-log: floor(1e6·ln x + 0.5) — the engine-wide q6
    * quantization convention (TextOps.nbQuantizedModel).
    */
  private def q6ln(c: Column): Column =
    floor(log(c.cast("double")) * 1e6 + 0.5).cast("long")

  /** Attach add-one-smoothed micro-log weights to a (piece, cnt) table:
    * w = q6(ln(cnt+1)) − q6(ln(total+V)). Quantizing the two terms
    * SEPARATELY (not their ratio) keeps every input to ln an
    * integer-valued double on both engines.
    */
  private def weighted(counts: DataFrame): DataFrame = {
    val tot = counts.agg(sum(col("cnt")).as("tot"), count(lit(1)).as("v"))
    counts.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        (q6ln(col("cnt") + 1) - q6ln(col("tot") + col("v"))).as("w_micro"))
  }

  /** Viterbi-segment every word under a bounded piece→weight map: one
    * `aggregate` fold over positions 1..len carrying the last
    * [[MaxPieceLen]] DP scores and paths as fixed-width arrays (the
    * sliding-window trick — no per-position joins, no sequential driver
    * work). dp[i] = max over k of dp[i−k] + w(word[i−k+1..i]); on equal
    * scores the LARGER k wins (k-ascending scan with ≥ replacement),
    * mirrored verbatim by the oracle's CASE chain.
    *
    * CHARACTER-COVERAGE CONTRACT: a word containing a character absent
    * from `vocab` has NO valid segmentation — every DP path coalesces to
    * [[Minf]]. Training-side callers satisfy this by construction (single
    * chars are never pruned), but this is also the streaming serving path
    * where out-of-vocab input is plausible, so unsegmentable words are
    * made DETECTABLE rather than garbage: any final score below
    * −2⁵⁹ (real scores are ≥ −3e7 micro-logs per piece × word length,
    * nowhere near [[Minf]] = −2⁶⁰) yields NULL `segmented`/`n_pieces`,
    * with the poisoned `score_micro` kept for diagnostics.
    *
    * @return (word, freq, score_micro, segmented, n_pieces) — segmented
    *         is the space-joined piece sequence (scalar output contract),
    *         NULL when the word is unsegmentable under `vocab`
    */
  def viterbiSegment(words: DataFrame, vocab: Map[String, Long]): DataFrame = {
    require(vocab.nonEmpty, "empty vocabulary")
    val wmap = typedlit(vocab)
    val folded = words.select(col("word"), col("freq"),
      aggregate(
        sequence(lit(1), length(col("word"))), // len >= 1 contract: ascending
        struct(
          array(lit(Minf), lit(Minf), lit(Minf), lit(0L)).as("ss"),
          array(lit(""), lit(""), lit(""), lit("")).as("ps")),
        (acc, i) => {
          val ss = acc.getField("ss")
          val ps = acc.getField("ps")
          // candidate k: dp[i−k] + w(substr(i−k+1, k)); ss holds
          // [dp[i−4], dp[i−3], dp[i−2], dp[i−1]], so dp[i−k] = ss[5−k]
          def cand(k: Int): (Column, Column) = {
            val piece = col("word").substr(i - lit(k) + 1, lit(k))
            val sc = when(i >= k,
              element_at(ss, 5 - k) + coalesce(element_at(wmap, piece), lit(Minf)))
              .otherwise(lit(Minf))
            val pth = concat(element_at(ps, 5 - k), lit(" "), piece)
            (sc, pth)
          }
          val (s1, p1) = cand(1)
          val best = (2 to MaxPieceLen).foldLeft(struct(s1.as("s"), p1.as("p"))) {
            (cur, k) =>
              val (sk, pk) = cand(k)
              struct(
                when(sk >= cur.getField("s"), sk).otherwise(cur.getField("s")).as("s"),
                when(sk >= cur.getField("s"), pk).otherwise(cur.getField("p")).as("p"))
          }
          struct(
            concat(slice(ss, 2, 3), array(best.getField("s"))).as("ss"),
            concat(slice(ps, 2, 3), array(best.getField("p"))).as("ps"))
        },
        acc => struct(
          element_at(acc.getField("ss"), 4).as("score_micro"),
          ltrim(element_at(acc.getField("ps"), 4)).as("segmented"))).as("seg"))
    val poisoned = col("seg.score_micro") < lit(-(1L << 59))
    folded.select(col("word"), col("freq"),
      col("seg.score_micro").as("score_micro"),
      when(poisoned, lit(null)).otherwise(col("seg.segmented")).as("segmented"),
      when(poisoned, lit(null))
        .otherwise(size(split(col("seg.segmented"), " ")).cast("long")).as("n_pieces"))
  }

  /** Train the unigram model and segment the training vocabulary.
    *
    * Seed: every substring of length 1..[[MaxPieceLen]] of every word,
    * counted freq-weighted per OCCURRENCE; the candidate set is all
    * single chars (coverage guarantee) plus the top `maxVocab` multi-char
    * pieces by (count desc, piece asc). Then `emRounds` hard-EM rounds
    * (Viterbi segment → usage recount → prune-and-reweight), and a final
    * Viterbi pass under the trained weights.
    *
    * @param words bounded (word, freq) table — the caller's one
    *              corpus-scale pass produces it (top-W cap)
    * @return (model: piece/usage/w_micro, segmentation: word/freq/
    *         score_micro/segmented/n_pieces)
    */
  def train(words: DataFrame, maxVocab: Int = 160, emRounds: Int = 2)
      : (DataFrame, DataFrame) = {
    require(emRounds >= 1, "emRounds must be >= 1")
    // the word table feeds the seed enumeration AND every Viterbi pass —
    // materialize once or each pass re-runs the caller's corpus scan
    val w = words.ckpt()
    val seed = seedVocab(w, maxVocab)
    val chars = seed.filter(length(col("piece")) === 1).ckpt()
    var vocab = weighted(seed).ckpt()
    for (_ <- 1 to emRounds) {
      val seg = viterbiSegment(w, collectVocab(vocab)).ckpt()
      val usage = seg
        .select(col("freq"), explode(split(col("segmented"), " ")).as("piece"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      // M-step: single chars always survive (usage 0 → smoothed weight);
      // multi-char pieces survive only if the Viterbi path used them
      val kept = chars.select(col("piece"))
        .join(usage, Seq("piece"), "left").na.fill(0L, Seq("cnt"))
        .unionByName(usage.filter(length(col("piece")) > 1))
      vocab = weighted(kept).ckpt()
    }
    (vocab.withColumnRenamed("cnt", "usage"),
      viterbiSegment(w, collectVocab(vocab)))
  }

  /** Bounded model-size collect (≤ chars + maxVocab rows). */
  private def collectVocab(vocab: DataFrame): Map[String, Long] =
    vocab.select(col("piece"), col("w_micro")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Seed candidate vocabulary: every substring of length
    * 1..[[MaxPieceLen]] of every word counted freq-weighted per
    * occurrence; all single chars (coverage guarantee) plus the top
    * `maxVocab` multi-char pieces by (count desc, piece asc).
    * @return (piece, cnt)
    */
  def seedVocab(words: DataFrame, maxVocab: Int = 160): DataFrame = {
    val sub = words.select(col("freq"),
      explode(flatten(transform(
        sequence(lit(1), length(col("word"))),
        p => transform(
          sequence(lit(1), least(lit(MaxPieceLen), length(col("word")) - p + 1)),
          l => col("word").substr(p, l))))).as("piece"))
    val cnts = sub.groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      .ckpt() // feeds the chars filter AND the top-multi cut
    cnts.filter(length(col("piece")) === 1)
      .unionByName(cnts.filter(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece")).limit(maxVocab))
  }

  /** Greedy longest-match-first (WordPiece / BERT-style) segmentation —
    * the deterministic counterpart of [[viterbiSegment]]: at each cursor
    * take the LONGEST vocab piece starting there (single chars guarantee
    * progress), no scores involved. One `aggregate` fold over positions;
    * the accumulator carries a cursor, and a step acts only when the
    * iteration index has caught up to it — so the fold simulates the
    * variable-stride scan without sequential driver work.
    * @return (word, freq, segmented, n_pieces)
    */
  def wordpieceSegment(words: DataFrame, vocab: Set[String]): DataFrame = {
    require(vocab.nonEmpty, "empty vocabulary")
    val inVocab = typedlit(vocab.map(_ -> 1).toMap)
    val folded = words.select(col("word"), col("freq"),
      aggregate(
        sequence(lit(1), length(col("word"))),
        struct(lit(1L).as("cur"), lit("").as("path")),
        (acc, i) => {
          val cur = acc.getField("cur")
          val curI = cur.cast("int")
          val path = acc.getField("path")
          // longest vocab piece at the cursor: k descending, first hit
          val piece = coalesce(
            (MaxPieceLen to 2 by -1).map { k =>
              val cand = col("word").substr(curI, lit(k))
              when(length(col("word")) - cur + 1 >= k &&
                element_at(inVocab, cand).isNotNull, cand)
            } :+ col("word").substr(curI, lit(1)): _*)
          struct(
            when(i === cur, cur + length(piece)).otherwise(cur).as("cur"),
            when(i === cur, concat(path, lit(" "), piece)).otherwise(path).as("path"))
        },
        acc => ltrim(acc.getField("path"))).as("segmented"))
    folded.select(col("word"), col("freq"), col("segmented"),
      size(split(col("segmented"), " ")).cast("long").as("n_pieces"))
  }
}
