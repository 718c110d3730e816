package graft.queries

import graft.engine.PlanOnly.syntax._

import org.apache.spark.sql.functions._

import graft.operators.UnigramLm

/** Subword tokenizer training/application beyond BPE (TextAnalysis's
  * q_text_bpe_* family): the unigram-LM model (SentencePiece; Kudo 2018)
  * with hard-EM training, and greedy longest-match-first WordPiece
  * application — each fully replayed by the DuckDB oracle (recursive-CTE
  * Viterbi DP in integer max-plus arithmetic, the q_seq_viterbi
  * discipline).
  *
  * Reference analog: none — callysto has no text surface (SURVEY.md
  * §1.2); LLM-data-pipeline tokenizer family.
  */
object TokenizerQueries extends QuerySet {
  import Common.t

  private val TopWords = 300
  private val MaxVocab = 160
  private val Minf = UnigramLm.Minf

  /** q6 micro-log quantization in DuckDB (UnigramLm.q6ln's replay). */
  private def q6lnSql(x: String): String =
    s"CAST(floor(ln(CAST(($x) AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)"

  /** Add-one-smoothed micro-log weights over a (piece, cnt) CTE. */
  private def weightedSql(src: String): String =
    s"""SELECT piece, cnt,
          ${q6lnSql("cnt + 1")} -
          ${q6lnSql(s"(SELECT SUM(cnt) FROM $src) + (SELECT COUNT(*) FROM $src)")} AS w
        FROM $src"""

  /** One Viterbi pass as a recursive-CTE body: lockstep over all words,
    * sliding 4-wide DP window (s1..s4 = dp[i−3..i], p1..p4 the paths).
    * Integer max-plus; ties pick the LARGEST piece length (the CASE
    * checks k = 4 first), bit-matching the engine's k-ascending ≥ scan.
    */
  private def viterbiRecSql(rec: String, wordsCte: String, vocabCte: String): String = {
    // candidate score for piece length k stepping to position j = i + 1:
    // dp[j−k] + w(word[j−k+1 .. j]); dp[j−1]=s4, dp[j−2]=s3, …
    def c(k: Int): String = {
      val dp = Seq("", "r.s4", "r.s3", "r.s2", "r.s1")(k)
      s"($dp + COALESCE(v$k.w, $Minf))"
    }
    val m = s"greatest(${(1 to 4).map(c).mkString(", ")})"
    def p(k: Int): String = {
      val pp = Seq("", "r.p4", "r.p3", "r.p2", "r.p1")(k)
      s"($pp || ' ' || v$k.piece)"
    }
    s"""
      SELECT word, freq, CAST(len(word) AS BIGINT) AS len, CAST(0 AS BIGINT) AS i,
             CAST($Minf AS BIGINT) AS s1, CAST($Minf AS BIGINT) AS s2,
             CAST($Minf AS BIGINT) AS s3, CAST(0 AS BIGINT) AS s4,
             '' AS p1, '' AS p2, '' AS p3, '' AS p4
      FROM $wordsCte
      UNION ALL
      SELECT r.word, r.freq, r.len, r.i + 1,
             r.s2, r.s3, r.s4, $m,
             r.p2, r.p3, r.p4,
             CASE WHEN ${c(4)} = $m THEN ${p(4)}
                  WHEN ${c(3)} = $m THEN ${p(3)}
                  WHEN ${c(2)} = $m THEN ${p(2)}
                  ELSE ${p(1)} END
      FROM $rec r
      LEFT JOIN $vocabCte v1 ON v1.piece = substr(r.word, CAST(r.i + 1 AS INT), 1)
      LEFT JOIN $vocabCte v2 ON r.i + 1 >= 2 AND v2.piece = substr(r.word, CAST(r.i AS INT), 2)
      LEFT JOIN $vocabCte v3 ON r.i + 1 >= 3 AND v3.piece = substr(r.word, CAST(r.i - 1 AS INT), 3)
      LEFT JOIN $vocabCte v4 ON r.i + 1 >= 4 AND v4.piece = substr(r.word, CAST(r.i - 2 AS INT), 4)
      WHERE r.i < r.len"""
  }

  /** One hard-EM round: segment under v$prev → usage recount → prune
    * (chars always kept) → reweight as v$cur. All MATERIALIZED (the
    * BPE-oracle lesson: un-hinted chained CTEs re-expand exponentially).
    */
  private def emRoundSql(cur: Int, prev: Int): String = s"""
      rec$cur AS (${viterbiRecSql(s"rec$cur", "w0", s"v$prev")}),
      seg$cur AS MATERIALIZED (
        SELECT word, freq, s4 AS score_micro, ltrim(p4) AS segmented
        FROM rec$cur WHERE i = len),
      use$cur AS MATERIALIZED (
        SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM (SELECT freq, unnest(string_split(segmented, ' ')) AS piece FROM seg$cur) u
        GROUP BY 1),
      keep$cur AS MATERIALIZED (
        SELECT c.piece, COALESCE(u.cnt, CAST(0 AS BIGINT)) AS cnt
        FROM chars c LEFT JOIN use$cur u ON u.piece = c.piece
        UNION ALL
        SELECT piece, cnt FROM use$cur WHERE len(piece) > 1),
      v$cur AS MATERIALIZED (${weightedSql(s"keep$cur")})"""

  /** Shared front end: tokenize → top-[[TopWords]] word table →
    * substring-seed candidate vocabulary (all chars + top multi-char).
    */
  private val seedCtes: String = s"""
      WITH RECURSIVE
      toks AS (
        SELECT tok AS w
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents) s
        WHERE regexp_full_match(tok, '[a-z]{2,12}')),
      w0 AS MATERIALIZED (
        SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM toks GROUP BY 1
        ORDER BY freq DESC, word LIMIT $TopWords),
      pos AS (
        SELECT word, freq,
               unnest(generate_series(CAST(1 AS BIGINT), CAST(len(word) AS BIGINT))) AS p
        FROM w0),
      sub AS (
        SELECT freq, substr(word, CAST(p AS INT), CAST(l AS INT)) AS piece
        FROM (SELECT word, freq, p,
                     unnest(generate_series(CAST(1 AS BIGINT),
                       least(CAST(${UnigramLm.MaxPieceLen} AS BIGINT),
                             CAST(len(word) AS BIGINT) - p + 1))) AS l
              FROM pos) q),
      cnts AS MATERIALIZED (
        SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM sub GROUP BY 1),
      chars AS MATERIALIZED (SELECT piece, cnt FROM cnts WHERE len(piece) = 1),
      seed AS MATERIALIZED (
        SELECT piece, cnt FROM chars
        UNION ALL
        SELECT piece, cnt FROM (
          SELECT piece, cnt FROM cnts WHERE len(piece) > 1
          ORDER BY cnt DESC, piece LIMIT $MaxVocab) mseed)"""

  /** The unigram training pipeline: seed → v0 → two hard-EM rounds → v2,
    * plus a final Viterbi segmentation (rec3/seg3) under the trained v2.
    */
  private val unigramCtes: String = s"""$seedCtes,
      v0 AS MATERIALIZED (${weightedSql("seed")}),
      ${emRoundSql(1, 0)},
      ${emRoundSql(2, 1)},
      rec3 AS (${viterbiRecSql("rec3", "w0", "v2")}),
      seg3 AS MATERIALIZED (
        SELECT word, freq, s4 AS score_micro, ltrim(p4) AS segmented
        FROM rec3 WHERE i = len)"""

  /** Bounded (word, freq) training table: one corpus pass, top-300 by
    * (freq desc, word asc) — the cap that keeps everything downstream
    * vocabulary-bounded (the bpeTrain scale contract).
    */
  private def wordTable(spark: org.apache.spark.sql.SparkSession, dir: String) =
    t(spark, dir).documents
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]{2,12}$"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(TopWords)
      .select(col("w").as("word"), col("freq"))

  /** Trained unigram model after two hard-EM rounds: surviving pieces
    * with final Viterbi usage counts and micro-log weights. The oracle
    * replays the ENTIRE training loop — seed counts, both EM rounds'
    * Viterbi DPs (recursive CTEs), pruning and reweighting — so a hash
    * match proves the full training trajectory, not just the last state.
    */
  val qUnigramTrain: GQuery = GQuery(
    "q_text_unigram_train",
    Some(s"""$unigramCtes
      SELECT piece, cnt AS n_used, w AS w_micro FROM v2 ORDER BY piece""")
  ) { (spark, dir) =>
    val (model, _) = UnigramLm.train(wordTable(spark, dir), maxVocab = MaxVocab, emRounds = 2)
    model.select(col("piece"), col("usage").as("n_used"), col("w_micro"))
      .orderBy(col("piece"))
  }

  /** Maximum-likelihood (Viterbi) segmentation of the training vocabulary
    * under the trained unigram model — the tokenizer APPLICATION step,
    * emitted from the trainer's final state so train and apply cannot
    * drift (the bpeSegment convention). Integer max-plus scores; the
    * longer piece wins exact ties on both engines.
    */
  val qUnigramSegment: GQuery = GQuery(
    "q_text_unigram_segment",
    Some(s"""$unigramCtes
      SELECT word, freq, score_micro, segmented,
             CAST(len(string_split(segmented, ' ')) AS BIGINT) AS n_pieces
      FROM seg3 ORDER BY word""")
  ) { (spark, dir) =>
    val (_, seg) = UnigramLm.train(wordTable(spark, dir), maxVocab = MaxVocab, emRounds = 2)
    seg.select(col("word"), col("freq"), col("score_micro"), col("segmented"),
      col("n_pieces")).orderBy(col("word"))
  }

  /** Greedy longest-match-first (WordPiece/BERT-style) segmentation of
    * the training vocabulary over the seed candidate set — the
    * score-free tokenizer application (no EM), contrasted with
    * [[qUnigramSegment]]'s max-likelihood decoding over the SAME seed.
    * The oracle replays the greedy scan as a cursor-recursion CTE
    * (longest piece first via COALESCE over the k = 4..1 joins), in
    * lockstep over all words.
    */
  val qWordpiece: GQuery = GQuery(
    "q_text_wordpiece",
    Some(s"""$seedCtes,
      wrec AS (
        SELECT word, freq, CAST(len(word) AS BIGINT) AS len,
               CAST(1 AS BIGINT) AS cur, '' AS path
        FROM w0
        UNION ALL
        SELECT r.word, r.freq, r.len,
               r.cur + len(COALESCE(v4.piece, v3.piece, v2.piece, v1.piece)),
               r.path || ' ' || COALESCE(v4.piece, v3.piece, v2.piece, v1.piece)
        FROM wrec r
        LEFT JOIN seed v1 ON v1.piece = substr(r.word, CAST(r.cur AS INT), 1)
        LEFT JOIN seed v2 ON r.cur + 1 <= r.len AND v2.piece = substr(r.word, CAST(r.cur AS INT), 2)
        LEFT JOIN seed v3 ON r.cur + 2 <= r.len AND v3.piece = substr(r.word, CAST(r.cur AS INT), 3)
        LEFT JOIN seed v4 ON r.cur + 3 <= r.len AND v4.piece = substr(r.word, CAST(r.cur AS INT), 4)
        WHERE r.cur <= r.len)
      SELECT word, freq, ltrim(path) AS segmented,
             CAST(len(string_split(ltrim(path), ' ')) AS BIGINT) AS n_pieces
      FROM wrec WHERE cur = len + 1 ORDER BY word""")
  ) { (spark, dir) =>
    val words = wordTable(spark, dir).ckptLazy() // feeds seed AND the scan
    val vocab = UnigramLm.seedVocab(words, MaxVocab)
      .select(col("piece")).collect().map(_.getString(0)).toSet
    UnigramLm.wordpieceSegment(words, vocab)
      .select(col("word"), col("freq"), col("segmented"), col("n_pieces"))
      .orderBy(col("word"))
  }

  override def queries: Seq[GQuery] = Seq(qUnigramTrain, qUnigramSegment, qWordpiece)
}
