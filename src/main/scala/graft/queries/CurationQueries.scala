package graft.queries

import graft.engine.PlanOnly.syntax._

import org.apache.spark.sql.functions._

import Common._

/** Round-7 corpus-curation operators: count-based LM quality scoring,
  * training-bin packing, differentially-private releases, compressed-text
  * ingestion, cross-domain ANOVA, conversation assembly, and matryoshka
  * embedding truncation.
  *
  * Reference analog: none — callysto has no relational/curation surface
  * (SURVEY §2.5); these are the batch operators a 100 TB training-data
  * pipeline runs between ingest and packing, each with a DuckDB oracle.
  */
object CurationQueries extends QuerySet {

  /** Bigram language-model scoring — the count-based CCNet/KenLM-style
    * quality signal: train add-k-smoothed bigram statistics over the
    * corpus, then score every document by its mean conditional
    * probability P(w_i | w_{i-1}) = (c(ab)+k)/(c(a)+k·V), k = 0.5.
    * The mean of the probabilities (not the log — `ln`'s last-ulp wobble
    * would break hash-exact oracles, the same reason tfidf uses a
    * log-free idf) is an order-insensitive DECIMAL(38,12) sum, so the
    * whole model — counts, smoothing, scoring — replays exactly.
    *
    * Scale shape: one corpus pass explodes adjacent pairs, immediately
    * pre-aggregated to (doc_id, a, b, cnt) — the scoring joins run on
    * DISTINCT per-doc bigrams, not per-occurrence rows, shrinking both
    * join inputs by the within-doc repetition factor and blunting
    * hot-token join skew ("the" as join key `a`); the mean is
    * cnt-weighted, algebraically identical. The global bigram table
    * re-aggregates from the per-doc counts (smaller shuffle than the raw
    * pairs), the vocab size broadcasts as one row. No windows, no driver
    * state.
    */
  val qNgramLm: GQuery = GQuery(
    "q_text_ngram_lm",
    Some("""
      WITH tk AS (
        SELECT doc_id,
               list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                           t -> length(t) > 0) AS ts
        FROM documents),
      pairs AS (
        SELECT doc_id, ts[i] AS a, ts[i+1] AS b
        FROM tk, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g
        WHERE len(ts) >= 2),
      dp AS (
        SELECT doc_id, a, b, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM pairs GROUP BY doc_id, a, b),
      uni AS (
        SELECT t AS a, CAST(COUNT(*) AS BIGINT) AS ca
        FROM (SELECT unnest(ts) AS t FROM tk) GROUP BY t),
      bi AS (
        SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS cab FROM dp GROUP BY a, b),
      voc AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni),
      scored AS (
        SELECT p.doc_id, p.cnt,
               (CAST(bi.cab AS DOUBLE) + 0.5)
                 / (CAST(uni.ca AS DOUBLE) + 0.5 * CAST(voc.v AS DOUBLE)) AS condp
        FROM dp p JOIN bi USING (a, b) JOIN uni USING (a), voc)
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
             round(CAST(SUM(CAST(CAST(cnt AS DOUBLE) * condp AS DECIMAL(38,12))) AS DOUBLE)
                   / CAST(SUM(cnt) AS DOUBLE), 6) AS avg_condp
      FROM scored
      GROUP BY doc_id
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val D12 = org.apache.spark.sql.types.DecimalType(38, 12)
    val toks = filter(graft.operators.TextOps.tokens($"text"), x => length(x) > 0)
    val docs = t(spark, dir).documents.select($"doc_id", toks.as("ts")).ckptLazy()
    val dp = docs
      .filter(size($"ts") >= 2)
      .select($"doc_id", explode(
        transform(sequence(lit(1), size($"ts") - 1),
          i => struct(element_at($"ts", i).as("a"), element_at($"ts", i + 1).as("b")))).as("p"))
      .groupBy($"doc_id", $"p.a".as("a"), $"p.b".as("b"))
      .agg(count(lit(1)).as("cnt"))
      .ckptLazy() // feeds the global bigram table AND the scoring join
    val uni = docs.select(explode($"ts").as("a")).groupBy($"a").agg(count(lit(1)).as("ca"))
    val bi = dp.groupBy($"a", $"b").agg(sum($"cnt").as("cab"))
    val voc = uni.agg(count(lit(1)).as("v"))
    dp
      .join(bi, Seq("a", "b"))
      .join(uni, Seq("a"))
      .crossJoin(broadcast(voc))
      .select($"doc_id", $"cnt",
        (($"cab".cast("double") + lit(0.5))
          / ($"ca".cast("double") + lit(0.5) * $"v".cast("double"))).as("condp"))
      .groupBy($"doc_id")
      .agg(
        sum($"cnt").as("n_bigrams"),
        round(sum(($"cnt".cast("double") * $"condp").cast(D12)).cast("double")
          / sum($"cnt").cast("double"), 6).as("avg_condp"))
      .orderBy($"doc_id")
  }

  /** LPT training-bin packing: documents sorted by token count descending
    * (tie-broken by id) and dealt round-robin into 16 bins — the
    * longest-processing-time heuristic that keeps per-bin token totals
    * balanced for equal-work training shards. Rank assignment runs on
    * the distributed total-order indexer (range-partition + zipWithIndex,
    * [[graft.operators.Sampling.globalIndexBy]]), never a global window,
    * so the sort scales like any shuffle. The oracle replays the exact
    * rank → bin arithmetic.
    */
  val qPackLpt: GQuery = GQuery(
    "q_pipeline_pack_lpt",
    Some("""
      WITH d AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                        t -> length(t) > 0)) AS BIGINT) AS n_toks
        FROM documents),
      r AS (
        SELECT doc_id, n_toks,
               ROW_NUMBER() OVER (ORDER BY n_toks DESC, doc_id) AS rn
        FROM d)
      SELECT CAST((rn - 1) % 16 AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_toks) AS BIGINT) AS sum_tokens,
             CAST(MAX(n_toks) AS BIGINT) AS max_tokens
      FROM r
      GROUP BY 1
      ORDER BY 1""")
  ) { (spark, dir) =>
    import spark.implicits._
    val toks = filter(graft.operators.TextOps.tokens($"text"), x => length(x) > 0)
    val d = t(spark, dir).documents
      .select($"doc_id", size(toks).cast("long").as("n_toks"))
    graft.operators.Sampling
      .globalIndexBy(d, Seq($"n_toks".desc, $"doc_id"))
      .select($"doc_id", $"n_toks", (($"global_idx" - 1) % 16).cast("long").as("bin"))
      .groupBy($"bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_toks").as("sum_tokens"),
        max($"n_toks").as("max_tokens"))
      .orderBy($"bin")
  }

  /** Noisy count release via a TRUNCATED two-sided geometric mechanism:
    * per-language document counts plus integer noise from pmf ∝ α^|k|
    * with α = e^(-ε/Δ) at nominal ε = 1, Δ = 1, support CLAMPED to
    * [-6, 6] by the inverse-CDF table. The clamping re-concentrates the
    * clipped tail mass at ±6, so this is NOT pure ε-DP — adjacent counts
    * whose noise would need |k| > 6 to collide are distinguishable with
    * probability above the e^ε bound (a bounded-noise mechanism needs
    * the truncated-geometric analysis, e.g. Ghosh–Roughgarden–
    * Sundararajan's geometric mechanism variants, for a formal claim).
    * The released column is therefore `epsilon_nominal`: a mechanism
    * parameter, not a guarantee. The draw is the portable md5 16-bit
    * uniform pushed through fixed thresholds (the q_stat_bootstrap
    * recipe) keyed on (lang, release seed), so the mechanism is a pure
    * function of the group and the oracle replays the noisy counts
    * bit-for-bit — a DETERMINISTIC test harness for the release path;
    * production rotates the seed per release.
    */
  val qDpCounts: GQuery = {
    // CDF of the clamped two-sided geometric, scaled to 16 bits: u < th(i)
    // selects noise k = i - 6 (precomputed; see pmf above)
    val th = Seq(75, 279, 834, 2344, 6448, 17605, 47930, 59087, 63191, 64701, 65256, 65460)
    val caseSql = th.zipWithIndex
      .map { case (t, i) => s"WHEN u < $t THEN ${i - 6}" }
      .mkString("CASE ", " ", " ELSE 6 END")
    GQuery(
      "q_privacy_dp_counts",
      Some(s"""
      WITH g AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang),
      u AS (
        SELECT lang, n,
               ('0x' || substr(md5('dp:' || lang || ':7'), 1, 4))::BIGINT AS u
        FROM g)
      SELECT lang, CAST(n + ($caseSql) AS BIGINT) AS n_noisy,
             CAST(1.0 AS DOUBLE) AS epsilon_nominal
      FROM u
      ORDER BY lang""")
    ) { (spark, dir) =>
      import spark.implicits._
      val g = t(spark, dir).documents
        .groupBy($"lang").agg(count(lit(1)).as("n"))
        .withColumn("u",
          conv(substring(md5(concat(lit("dp:"), $"lang", lit(":7"))), 1, 4), 16, 10)
            .cast("long"))
      val noise = th.zipWithIndex
        .foldRight(lit(6): org.apache.spark.sql.Column) { case ((t, i), acc) =>
          when($"u" < t, lit(i - 6)).otherwise(acc)
        }
      g.select($"lang", ($"n" + noise).cast("long").as("n_noisy"),
          lit(1.0).as("epsilon_nominal"))
        .orderBy($"lang")
    }
  }

  /** Gzip-compressed JSONL round trip — the wire format most raw text
    * corpora actually arrive in (CommonCrawl WET/WARC derivatives ship as
    * .gz shards): documents written as gzip JSON lines through Spark's
    * native codec path, read back with an EXPLICIT schema (no inference
    * pass over 100 TB), audited per language. The content digest (sum of
    * 32-bit md5 prefixes, order-insensitive exact integer arithmetic)
    * proves the compress → split → decompress → parse chain preserved
    * every string byte. Note gzip shards are non-splittable: one task per
    * shard on read, which is why the writer controls shard count.
    */
  val qGzipJsonl: GQuery = GQuery(
    "q_source_gzip_jsonl",
    Some("""
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             CAST(SUM(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT) AS text_digest
      FROM documents
      GROUP BY lang
      ORDER BY lang""")
  ) { (spark, dir) =>
    import spark.implicits._
    val scratch = Scratch.dir("gzjsonl")
    val docs = t(spark, dir).documents
    docs.write.mode("overwrite").option("compression", "gzip")
      .json(scratch.toString)
    val res = spark.read.schema(docs.schema).json(scratch.toString)
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        sum(conv(substring(md5($"text"), 1, 8), 16, 10).cast("long")).as("text_digest"))
      .orderBy($"lang")
      .ckpt()
    Scratch.purge(scratch)
    res
  }

  /** One-way ANOVA across languages on document length — the parametric
    * companion to the KS/Mann-Whitney drift screens: does mean length
    * differ across the k = 5 language strata? Per-group sums and sums of
    * squares are exact BIGINT aggregates (one map-side-combined corpus
    * pass); the k per-group IEEE terms combine through DECIMAL(38,6)
    * (order-insensitive), and F = (SSB/(k−1))/(SSW/(N−k)) is one fixed
    * chain — the whole statistic replays exactly, emitted as RAW
    * doubles (round-10: `round(x, 6)` on a ~9.4e6-magnitude SSW left
    * only ~10³ ulps between grid points — the cross-build round-impl
    * lottery the boundary audit flagged; PARITY.md "Rounding
    * portability"). Driver state: none; the group table is k rows.
    */
  val qAnova: GQuery = GQuery(
    "q_stat_anova",
    Some("""
      WITH g AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(n_chars) AS BIGINT) AS s_g,
               CAST(SUM(n_chars * n_chars) AS BIGINT) AS ss_g
        FROM documents GROUP BY lang),
      parts AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(SUM(s_g) AS BIGINT) AS grand,
               CAST(SUM(CAST(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                             / CAST(n_g AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE) AS sum_sb,
               CAST(SUM(CAST(CAST(ss_g AS DOUBLE)
                             - CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                               / CAST(n_g AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE) AS ssw
        FROM g)
      SELECT k, n,
             sum_sb - CAST(grand AS DOUBLE) * CAST(grand AS DOUBLE)
                      / CAST(n AS DOUBLE) AS ssb,
             ssw,
             ((sum_sb - CAST(grand AS DOUBLE) * CAST(grand AS DOUBLE)
                        / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
               / (ssw / CAST(n - k AS DOUBLE)) AS f_stat
      FROM parts""")
  ) { (spark, dir) =>
    import spark.implicits._
    val g = t(spark, dir).documents
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_g"),
        sum($"n_chars").as("s_g"),
        sum($"n_chars" * $"n_chars").as("ss_g"))
    val sb = $"s_g".cast("double") * $"s_g".cast("double") / $"n_g".cast("double")
    val parts = g.agg(
      count(lit(1)).as("k"),
      sum($"n_g").as("n"),
      sum($"s_g").as("grand"),
      sum(sb.cast(D)).cast("double").as("sum_sb"),
      sum(($"ss_g".cast("double") - sb).cast(D)).cast("double").as("ssw"))
    val ssb = $"sum_sb" - $"grand".cast("double") * $"grand".cast("double") / $"n".cast("double")
    parts.select(
      $"k", $"n",
      ssb.as("ssb"),
      $"ssw",
      ((ssb / ($"k" - 1).cast("double")) / ($"ssw" / ($"n" - $"k").cast("double")))
        .as("f_stat"))
  }

  /** Conversation assembly — the SFT/RL data-prep step that turns an
    * event log into per-user transcripts: events map to roles, order by
    * (event time µs, event id), concatenate the FIRST `maxTurns` turns
    * into one transcript per user, and count role-alternation violations
    * (adjacent same-role turns — malformed dialogs a trainer must drop).
    *
    * Per-user state is CAPPED, not "bounded by user activity": user
    * activity is exactly the unbounded, heavily skewed quantity at corpus
    * scale (one bot = one multi-GB array if collected raw — round-7
    * verdict). A per-user row_number window (partitioned, streaming, sort
    * spills to disk — never an array buffer) keeps only rn ≤ maxTurns
    * rows before anything is collected, so the aggregation buffer holds
    * ≤ maxTurns entries for ANY user; the uncapped `n_turns` count and
    * the `overflowed` flag survive as scalar aggregates (the domainCap
    * discipline: cap the heavy payload, keep the lossless tally).
    * Single-turn users are legal input: the violation scan is guarded
    * (`sequence(1, size-1)` on a 1-element array is the DESCENDING [1,0]
    * and element_at(·, 0) throws — the qNgramLm size≥2 guard).
    */
  val qChatAssembly: GQuery = GQuery(
    "q_pipeline_chat_assembly",
    Some("""
      WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS tus,
               CASE WHEN event_type IN ('click', 'view') THEN 'user'
                    WHEN event_type = 'purchase' THEN 'assistant'
                    ELSE 'system' END AS role
        FROM events),
      tot AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_turns FROM e GROUP BY user_id),
      k AS (
        SELECT * FROM (
          SELECT e.*, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY tus, event_id) AS rn
          FROM e)
        WHERE rn <= 64),
      turns AS (
        SELECT user_id, event_id, tus, role, role || ':' || CAST(event_id AS VARCHAR) AS turn,
               LAG(role) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev_role
        FROM k)
      SELECT turns.user_id,
             tot.n_turns,
             CAST(COUNT(*) AS BIGINT) AS kept_turns,
             CAST(SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END) AS BIGINT) AS violations,
             md5(string_agg(turn, '|' ORDER BY tus, event_id)) AS transcript_md5,
             tot.n_turns > 64 AS overflowed
      FROM turns JOIN tot USING (user_id)
      GROUP BY turns.user_id, tot.n_turns
      ORDER BY user_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val role = when($"event_type".isin("click", "view"), "user")
      .when($"event_type" === "purchase", "assistant")
      .otherwise("system")
    graft.operators.SftPrep
      .assembleChat(
        t(spark, dir).events.select(
          $"user_id", $"event_id", expr("ts div 1000").as("tus"), role.as("role")),
        "user_id", "event_id", "tus", "role", maxTurns = 64)
      .orderBy($"user_id")
  }

  /** Matryoshka truncation audit (MRL-style nested embeddings): keep the
    * first 16 of 64 dimensions and measure what survives — head norm and
    * the norm-retention ratio per vector. Entirely row-local arithmetic
    * (no shuffle at all beyond the scan); the retention distribution is
    * what decides whether a cheaper head-dimension index is safe at
    * 100 TB before committing to it.
    */
  val qMatryoshka: GQuery = GQuery(
    "q_embed_matryoshka",
    Some("""
      WITH v AS (
        SELECT vec_id,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm_full,
               sqrt(list_sum(list_transform(embedding[1:16],
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm_head
        FROM embeddings)
      SELECT vec_id, round(norm_full, 6) AS norm_full, round(norm_head, 6) AS norm_head,
             round(norm_head / norm_full, 6) AS retention
      FROM v
      ORDER BY vec_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    def sq(c: org.apache.spark.sql.Column) =
      sqrt(aggregate(transform(c, x => x.cast("double") * x.cast("double")),
        lit(0.0), (a, x) => a + x))
    t(spark, dir).embeddings
      .select($"vec_id",
        sq($"embedding").as("norm_full"),
        sq(slice($"embedding", 1, 16)).as("norm_head"))
      .select($"vec_id",
        round($"norm_full", 6).as("norm_full"),
        round($"norm_head", 6).as("norm_head"),
        round($"norm_head" / $"norm_full", 6).as("retention"))
      .orderBy($"vec_id")
  }

  /** Embedding outlier screen: per-vector Euclidean distance to its OWN
    * label centroid, flagged past the label's exact p95 — the
    * complement of q_quality_label_consistency for embedding curation
    * (that one finds vectors whose NEIGHBORS disagree; this finds
    * vectors far from their class mass — encoder glitches, mislabels,
    * out-of-distribution rows). Determinism end to end: centroids are
    * the fixed-point exact means (q_agg_centroid's floor(v·2^20)
    * convention — partition-order-proof), the distance is ONE row-local
    * left-fold over (v−c)² (never a cross-partition double sum, whose
    * order differs between engines), and the p95 is the exact
    * interpolated percentile both engines compute identically
    * (q_ts_rolling_median precedent). Centroid table is 5 labels × 64
    * dims — broadcast.
    */
  val qEmbedOutlier: GQuery = GQuery(
    "q_embed_outlier",
    Some("""
      WITH cflat AS (
        SELECT label, i,
               (CAST(SUM(CAST(floor(CAST(e AS DOUBLE) * 1048576.0) AS BIGINT)) AS DOUBLE)
                / COUNT(*)) / 1048576.0 AS cv
        FROM (SELECT label, unnest(embedding) AS e,
                     unnest(generate_series(1, len(embedding))) AS i
              FROM embeddings)
        GROUP BY label, i),
      cents AS (SELECT label, list(cv ORDER BY i) AS c FROM cflat GROUP BY label),
      dists AS (
        SELECT v.vec_id, v.label,
               sqrt(list_sum(list_transform(generate_series(1, 64),
                 i -> (CAST(v.embedding[i] AS DOUBLE) - ct.c[i])
                      * (CAST(v.embedding[i] AS DOUBLE) - ct.c[i])))) AS dist
        FROM embeddings v JOIN cents ct USING (label)),
      p AS (SELECT label, quantile_cont(dist, 0.95) AS p95 FROM dists GROUP BY label)
      SELECT d.vec_id, CAST(d.label AS BIGINT) AS label,
             round(d.dist, 6) AS dist, round(p.p95, 6) AS p95,
             d.dist > p.p95 AS is_outlier
      FROM dists d JOIN p USING (label)
      ORDER BY vec_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val emb = t(spark, dir).embeddings
    val cflat = emb
      .select($"label", posexplode($"embedding").as(Seq("i", "e")))
      .groupBy($"label", $"i")
      .agg(((sum(floor($"e".cast("double") * 1048576.0).cast("long")).cast("double")
        / count(lit(1))) / 1048576.0).as("cv"))
    val cents = cflat.groupBy($"label")
      .agg(transform(sort_array(collect_list(struct($"i", $"cv"))), s => s.getField("cv")).as("c"))
    val dists = emb.join(broadcast(cents), Seq("label"))
      .select($"vec_id", $"label",
        sqrt(aggregate(
          zip_with($"embedding", $"c", (x, m) => (x.cast("double") - m) * (x.cast("double") - m)),
          lit(0.0), (acc, t) => acc + t)).as("dist"))
      .ckptLazy() // feeds the percentile pass AND the final join
    val p = dists.groupBy($"label").agg(percentile($"dist", lit(0.95)).as("p95"))
    dists.join(broadcast(p), Seq("label"))
      .select($"vec_id", $"label".cast("long").as("label"),
        round($"dist", 6).as("dist"), round($"p95", 6).as("p95"),
        ($"dist" > $"p95").as("is_outlier"))
      .orderBy($"vec_id")
  }

  /** Deterministic word-dropout augmentation (the contrastive-pair /
    * regularization transform): each token survives iff a portable md5
    * draw over (doc_id, position, token, seed) lands outside the 20%
    * drop band — so the SAME document always augments identically, on
    * any engine, at any partitioning, which is what makes augmented
    * corpora reproducible and the positive pairs for SimCSE-style
    * training joinable by doc_id.
    *
    * Scale shape: ENTIRELY row-local — the keep gate runs inside an
    * indexed `filter` lambda over the materialized token array (no
    * explode, no re-group, no shuffle at all beyond the scan). The
    * lambda captures only attribute references, never the tokenize
    * chain (the round-1 nested-HOF trap).
    */
  val qAugment: GQuery = GQuery(
    "q_text_augment",
    Some("""
      WITH tk AS (
        SELECT doc_id,
               list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                           t -> length(t) > 0) AS ts
        FROM documents),
      pos AS (
        SELECT doc_id, i, ts[i] AS w
        FROM tk, LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) g),
      kept AS (
        SELECT doc_id, i, w FROM pos
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)
                                  || ':' || w || ':17'), 1, 8))::UBIGINT % 10 < 8),
      agg AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
               string_agg(w, ' ' ORDER BY i) AS text_aug
        FROM kept GROUP BY doc_id)
      SELECT tk.doc_id, CAST(len(tk.ts) AS BIGINT) AS n_tokens,
             COALESCE(a.n_kept, 0) AS n_kept,
             COALESCE(a.text_aug, '') AS text_aug
      FROM tk LEFT JOIN agg a ON a.doc_id = tk.doc_id
      ORDER BY tk.doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val toks = filter(graft.operators.TextOps.tokens($"text"), x => length(x) > 0)
    t(spark, dir).documents
      .select($"doc_id", toks.as("ts"))
      .select(
        $"doc_id",
        size($"ts").cast("long").as("n_tokens"),
        filter($"ts", (x, i) =>
          conv(substring(md5(concat(
            $"doc_id".cast("string"), lit(":"), (i + 1).cast("string"),
            lit(":"), x, lit(":17"))), 1, 8), 16, 10).cast("long") % 10 < 8).as("kept"))
      .select(
        $"doc_id", $"n_tokens",
        size($"kept").cast("long").as("n_kept"),
        array_join($"kept", " ").as("text_aug"))
      .orderBy($"doc_id")
  }

  // ---------------------------------------------------------------------
  // Trained logistic-regression quality classifier (round-12 verdict #5).
  // The oracle unrolls the fixed-point GD rounds as chained MATERIALIZED
  // CTEs (the unigram-LM EM / BPE discipline — MATERIALIZED is mandatory:
  // each round reads its predecessor twice and DuckDB would otherwise
  // re-expand the chain exponentially). All arithmetic is integer; the
  // only division is the portable pmod-identity floor division.

  /** Shared CTE prologue: train-split tokens, labels (y = 1 iff lang =
    * 'en'), hashed features + intercept, n, bucket spine, zero weights.
    */
  private val lrProloguesSql: String = s"""
      WITH lrtok AS MATERIALIZED (
        SELECT doc_id,
               unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tk
        FROM documents WHERE doc_id % 5 <> 0),
      lrlab AS MATERIALIZED (
        SELECT doc_id,
               CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
        FROM documents WHERE doc_id % 5 <> 0),
      lrcnt AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(tk), 1, 15))::UBIGINT % ${graft.operators.QualityLr.Buckets} AS BIGINT) AS b,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lrtok GROUP BY 1, 2),
      lrlen AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS len FROM lrtok GROUP BY 1),
      lrfeat AS MATERIALIZED (
        SELECT c.doc_id, c.b, ${lrFdivSql("c.cnt * 1000000", "l.len")} AS x
        FROM lrcnt c JOIN lrlen l ON l.doc_id = c.doc_id
        UNION ALL
        SELECT doc_id, CAST(-1 AS BIGINT) AS b, CAST(1000000 AS BIGINT) AS x FROM lrlab),
      lrn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lrlab),
      lrspine AS (SELECT CAST(range AS BIGINT) AS b
                  FROM range(-1, ${graft.operators.QualityLr.Buckets})),
      lrw0 AS (SELECT b, CAST(0 AS BIGINT) AS w FROM lrspine)"""

  /** Portable floor(e / m), m > 0 — the pmod identity (exactly QualityLr
    * .fdiv): e − posmod(e, m) is divisible by m, so the division is
    * exact on both engines.
    */
  private def lrFdivSql(e: String, m: String): String =
    s"CAST((($e) - ((($e) % ($m)) + ($m)) % ($m)) / ($m) AS BIGINT)"

  private def lrHardSig(z: String): String =
    s"LEAST(GREATEST(500000 + ${lrFdivSql(z, "4")}, 0), 1000000)"

  /** One GD round: z under w(r−1) → residual gradient → floor-step.
    * z_raw = Σ w·x is micro² (w micro × x micro-normalized), descaled
    * by ⌊/10⁶⌋; the step denominator carries the same 10⁶.
    */
  private def lrRoundSql(r: Int): String = {
    val eta = s"(${graft.operators.QualityLr.EtaDen} * lrn.n * 1000000)"
    s"""
      lrz$r AS MATERIALIZED (
        SELECT doc_id, y, ${lrFdivSql("zr", "1000000")} AS z FROM (
          SELECT f.doc_id, MIN(l.y) AS y, CAST(SUM(w.w * f.x) AS BIGINT) AS zr
          FROM lrfeat f
          JOIN lrw${r - 1} w ON w.b = f.b
          JOIN lrlab l ON l.doc_id = f.doc_id
          GROUP BY 1)),
      lrg$r AS MATERIALIZED (
        SELECT f.b,
               CAST(SUM((z.y * 1000000 - ${lrHardSig("z.z")}) * f.x) AS BIGINT) AS g
        FROM lrz$r z JOIN lrfeat f ON f.doc_id = z.doc_id
        GROUP BY 1),
      lrw$r AS MATERIALIZED (
        SELECT s.b,
               CAST(wp.w + ${lrFdivSql("COALESCE(g.g, 0)", eta)} AS BIGINT) AS w
        FROM lrspine s
        JOIN lrw${r - 1} wp ON wp.b = s.b
        LEFT JOIN lrg$r g ON g.b = s.b, lrn)"""
  }

  private val lrChainSql: String =
    lrProloguesSql + (1 to graft.operators.QualityLr.Rounds).map(r => "," + lrRoundSql(r)).mkString

  /** Hard-sigmoid LR training trajectory: hashed-unigram + intercept
    * features, integer micro-unit weights, [[graft.operators.QualityLr]]
    * semantics. Output = every (round, bucket) weight — the FULL GD
    * trajectory is hash-checked, not just the final model.
    */
  val qLrTrain: GQuery = GQuery(
    "q_quality_lr_train",
    Some(lrChainSql + s"""
      ${(1 to graft.operators.QualityLr.Rounds).map(r =>
        s"SELECT $r AS round, b, w AS w_micro FROM lrw$r").mkString("\n      UNION ALL\n      ")}
      ORDER BY round, b""")
  ) { (spark, dir) =>
    import spark.implicits._
    val train = t(spark, dir).documents.filter($"doc_id" % 5 =!= 0)
    graft.operators.QualityLr
      .train(
        graft.operators.QualityLr.features(train),
        graft.operators.QualityLr.labels(train))
      .orderBy($"round", $"b")
  }

  /** Serve the trained LR on the held-out split: one broadcast join of
    * the 65-row model — the corpus-wide quality-sweep shape. Integer
    * z/p and the 500000-threshold prediction are exact on both engines.
    */
  val qLrScore: GQuery = GQuery(
    "q_quality_lr_score",
    Some(lrChainSql + s""",
      lrtokt AS MATERIALIZED (
        SELECT doc_id,
               unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tk
        FROM documents WHERE doc_id % 5 = 0),
      lrlabt AS (
        SELECT doc_id,
               CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
        FROM documents WHERE doc_id % 5 = 0),
      lrcntt AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(tk), 1, 15))::UBIGINT % ${graft.operators.QualityLr.Buckets} AS BIGINT) AS b,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lrtokt GROUP BY 1, 2),
      lrlent AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS len FROM lrtokt GROUP BY 1),
      lrfeatt AS (
        SELECT c.doc_id, c.b, ${lrFdivSql("c.cnt * 1000000", "l.len")} AS x
        FROM lrcntt c JOIN lrlent l ON l.doc_id = c.doc_id
        UNION ALL
        SELECT doc_id, CAST(-1 AS BIGINT) AS b, CAST(1000000 AS BIGINT) AS x FROM lrlabt),
      lrzt AS (
        SELECT doc_id, ${lrFdivSql("zr", "1000000")} AS z FROM (
          SELECT f.doc_id, CAST(SUM(w.w * f.x) AS BIGINT) AS zr
          FROM lrfeatt f JOIN lrw${graft.operators.QualityLr.Rounds} w ON w.b = f.b
          GROUP BY 1)),
      lrsc AS (
        SELECT doc_id, z, ${lrHardSig("z")} AS p FROM lrzt)
      SELECT s.doc_id, l.y AS label, s.z AS z_micro, s.p AS p_micro,
             CASE WHEN s.p >= 500000 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS pred
      FROM lrsc s JOIN lrlabt l ON l.doc_id = s.doc_id
      ORDER BY s.doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val docs = t(spark, dir).documents
    val train = docs.filter($"doc_id" % 5 =!= 0)
    val test = docs.filter($"doc_id" % 5 === 0)
    val wFinal = graft.operators.QualityLr
      .train(
        graft.operators.QualityLr.features(train),
        graft.operators.QualityLr.labels(train))
      .filter($"round" === graft.operators.QualityLr.Rounds)
      .select($"b", $"w_micro")
    graft.operators.QualityLr
      .score(graft.operators.QualityLr.features(test), wFinal)
      .join(graft.operators.QualityLr.labels(test)
        .select($"doc_id", $"y".as("label")), Seq("doc_id"))
      .select($"doc_id", $"label", $"z_micro", $"p_micro", $"pred")
      .orderBy($"doc_id")
  }

  override def queries: Seq[GQuery] = Seq(
    qNgramLm, qPackLpt, qDpCounts, qGzipJsonl, qAnova, qChatAssembly, qMatryoshka,
    qEmbedOutlier, qAugment, qLrTrain, qLrScore)
}
