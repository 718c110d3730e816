package graft.queries

import graft.engine.PlanOnly.syntax._

import org.apache.spark.sql.functions._

import Common._

/** Round-8 corpus-audit operators: the measurements a training-data team
  * runs BEFORE committing 100 TB to a tokenizer/packing/mixture decision —
  * n-gram diversity (synthetic-data self-repetition), Zipf rank-frequency
  * fit, cross-slice unigram KL divergence, sequence-length truncation
  * accounting, embedding class separability, and ANN hard-negative mining
  * for contrastive training.
  *
  * Reference analog: none — callysto has no relational/curation surface
  * (SURVEY §2.5); each entry here is DuckDB-oracle-checked end to end.
  */
object AuditQueries extends QuerySet {

  /** Distinct-n diversity audit (the text-generation "distinct-1/2/3"
    * metric, per document): the fraction of a document's bigrams and
    * trigrams that are unique within it. Low ratios flag degenerate or
    * templated text — the primary screen run over synthetic/model-
    * generated corpora before they enter a training mix.
    *
    * Scale shape: ENTIRELY row-local — n-grams come from `zip_with` over
    * shifted slices (the lambda captures only its formal args, so the
    * tokenize chain is never re-evaluated per element — the round-1
    * nested-HOF trap documented in CLAUDE.md), distinct counts from
    * `array_distinct` in-row. No shuffle at all beyond the scan.
    */
  val qDistinctNgrams: GQuery = GQuery(
    "q_text_distinct_ngrams",
    Some("""
      WITH tk AS (
        SELECT doc_id,
               list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                           t -> length(t) > 0) AS ts
        FROM documents),
      g AS (
        SELECT doc_id,
               list_transform(generate_series(1, len(ts) - 1),
                              i -> ts[i] || ' ' || ts[i+1]) AS b2,
               list_transform(generate_series(1, len(ts) - 2),
                              i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]) AS b3
        FROM tk WHERE len(ts) >= 3)
      SELECT doc_id,
             CAST(len(b2) AS BIGINT) AS n_bigrams,
             CAST(len(list_distinct(b2)) AS BIGINT) AS n_bi_distinct,
             round(CAST(len(list_distinct(b2)) AS DOUBLE) / CAST(len(b2) AS DOUBLE), 6) AS bi_ratio,
             CAST(len(b3) AS BIGINT) AS n_trigrams,
             CAST(len(list_distinct(b3)) AS BIGINT) AS n_tri_distinct,
             round(CAST(len(list_distinct(b3)) AS DOUBLE) / CAST(len(b3) AS DOUBLE), 6) AS tri_ratio
      FROM g
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val toks = filter(graft.operators.TextOps.tokens($"text"), x => length(x) > 0)
    val sp = lit(" ")
    t(spark, dir).documents
      .select($"doc_id", toks.as("ts"))
      .filter(size($"ts") >= 3)
      .select($"doc_id",
        zip_with(
          slice($"ts", lit(1), size($"ts") - 1),
          slice($"ts", lit(2), size($"ts") - 1),
          (a, b) => concat(a, sp, b)).as("b2"),
        zip_with(
          zip_with(
            slice($"ts", lit(1), size($"ts") - 2),
            slice($"ts", lit(2), size($"ts") - 2),
            (a, b) => concat(a, sp, b)),
          slice($"ts", lit(3), size($"ts") - 2),
          (ab, c) => concat(ab, sp, c)).as("b3"))
      .select($"doc_id",
        size($"b2").cast("long").as("n_bigrams"),
        size(array_distinct($"b2")).cast("long").as("n_bi_distinct"),
        round(size(array_distinct($"b2")).cast("double") / size($"b2").cast("double"), 6)
          .as("bi_ratio"),
        size($"b3").cast("long").as("n_trigrams"),
        size(array_distinct($"b3")).cast("long").as("n_tri_distinct"),
        round(size(array_distinct($"b3")).cast("double") / size($"b3").cast("double"), 6)
          .as("tri_ratio"))
      .orderBy($"doc_id")
  }

  /** Zipf rank-frequency fit: least-squares slope of ln(freq) on
    * ln(rank) over the whole vocabulary — natural corpora sit near
    * slope ≈ −1, and departures (too flat: boilerplate-heavy; too steep:
    * vocabulary collapse) are a cheap corpus-health indicator.
    *
    * Scale shape: token-count shuffle, then the DISTRIBUTED total-order
    * rank ([[graft.operators.Sampling.globalIndexBy]] — never a global
    * window; vocabulary is corpus-scale), then one exact-decimal
    * regression aggregate. ln values are rounded to 6 decimals BEFORE
    * the product/sum so both engines aggregate identical doubles (the
    * DSIR ln-replay convention); the sums are order-insensitive
    * DECIMAL(38,6).
    */
  val qZipf: GQuery = GQuery(
    "q_text_zipf",
    Some("""
      WITH tk AS (
        SELECT doc_id,
               list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                           t -> length(t) > 0) AS ts
        FROM documents),
      f AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS freq
            FROM (SELECT unnest(ts) AS t FROM tk) GROUP BY t),
      r AS (SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, t) AS rnk FROM f),
      l AS (SELECT round(ln(CAST(rnk AS DOUBLE)), 6) AS lr,
                   round(ln(CAST(freq AS DOUBLE)), 6) AS lf FROM r),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(lr AS DECIMAL(38,6))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(lf AS DECIMAL(38,6))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(lr * lr AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(lr * lf AS DECIMAL(38,6))) AS DOUBLE) AS sxy
            FROM l)
      SELECT n AS vocab,
             round((CAST(n AS DOUBLE) * sxy - sx * sy)
                   / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS slope,
             round((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                          / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
                   / CAST(n AS DOUBLE), 6) AS intercept
      FROM m""")
  ) { (spark, dir) =>
    import spark.implicits._
    val toks = filter(graft.operators.TextOps.tokens($"text"), x => length(x) > 0)
    val f = t(spark, dir).documents
      .select(explode(toks).as("t"))
      .groupBy($"t").agg(count(lit(1)).as("freq"))
    val l = graft.operators.Sampling
      .globalIndexBy(f, Seq($"freq".desc, $"t"))
      .select(
        round(log($"global_idx".cast("double")), 6).as("lr"),
        round(log($"freq".cast("double")), 6).as("lf"))
    val m = l.agg(
      count(lit(1)).as("n"),
      sum($"lr".cast(D)).cast("double").as("sx"),
      sum($"lf".cast(D)).cast("double").as("sy"),
      sum(($"lr" * $"lr").cast(D)).cast("double").as("sxx"),
      sum(($"lr" * $"lf").cast(D)).cast("double").as("sxy"))
    val nd = $"n".cast("double")
    val slope = (nd * $"sxy" - $"sx" * $"sy") / (nd * $"sxx" - $"sx" * $"sx")
    m.select(
      $"n".as("vocab"),
      round(slope, 6).as("slope"),
      round(($"sy" - slope * $"sx") / nd, 6).as("intercept"))
  }

  /** Unigram KL divergence between corpus slices (en vs the rest) with
    * add-1 smoothing over the shared vocabulary — the domain-shift
    * number behind mixture decisions ("how different is this source,
    * really?"), in both directions (KL is asymmetric; a big gap between
    * the two is itself a signal).
    *
    * Scale shape: one token-count shuffle producing the per-term
    * (count_en, count_rest) table, a 1-row broadcast of the totals, one
    * DECIMAL(38,12)-pinned sum. The per-term ln chain is fixed IEEE
    * arithmetic on identical integer counts, so the sum replays (the
    * DSIR/ngram-lm convention).
    */
  val qKlUnigram: GQuery = GQuery(
    "q_text_kl_unigram",
    Some("""
      WITH tk AS (
        SELECT doc_id, lang,
               list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                           t -> length(t) > 0) AS ts
        FROM documents),
      c AS (SELECT t,
                   CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ce,
                   CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS cr
            FROM (SELECT lang, unnest(ts) AS t FROM tk) GROUP BY t),
      tot AS (SELECT CAST(SUM(ce) AS BIGINT) AS ne, CAST(SUM(cr) AS BIGINT) AS nr,
                     CAST(COUNT(*) AS BIGINT) AS v FROM c)
      SELECT tot.v AS vocab, tot.ne AS n_en, tot.nr AS n_rest,
             round(CAST(SUM(CAST(
               (CAST(ce + 1 AS DOUBLE) / CAST(tot.ne + tot.v AS DOUBLE))
               * ln((CAST(ce + 1 AS DOUBLE) / CAST(tot.ne + tot.v AS DOUBLE))
                  / (CAST(cr + 1 AS DOUBLE) / CAST(tot.nr + tot.v AS DOUBLE)))
               AS DECIMAL(38,12))) AS DOUBLE), 6) AS kl_en_rest,
             round(CAST(SUM(CAST(
               (CAST(cr + 1 AS DOUBLE) / CAST(tot.nr + tot.v AS DOUBLE))
               * ln((CAST(cr + 1 AS DOUBLE) / CAST(tot.nr + tot.v AS DOUBLE))
                  / (CAST(ce + 1 AS DOUBLE) / CAST(tot.ne + tot.v AS DOUBLE)))
               AS DECIMAL(38,12))) AS DOUBLE), 6) AS kl_rest_en
      FROM c, tot
      GROUP BY tot.v, tot.ne, tot.nr""")
  ) { (spark, dir) =>
    import spark.implicits._
    val D12 = org.apache.spark.sql.types.DecimalType(38, 12)
    val toks = filter(graft.operators.TextOps.tokens($"text"), x => length(x) > 0)
    val c = t(spark, dir).documents
      .select($"lang", explode(toks).as("t"))
      .groupBy($"t")
      .agg(
        sum(when($"lang" === "en", 1L).otherwise(0L)).as("ce"),
        sum(when($"lang" =!= "en", 1L).otherwise(0L)).as("cr"))
    val tot = c.agg(
      sum($"ce").as("ne"), sum($"cr").as("nr"), count(lit(1)).as("v"))
    val p = ($"ce" + 1).cast("double") / ($"ne" + $"v").cast("double")
    val q = ($"cr" + 1).cast("double") / ($"nr" + $"v").cast("double")
    c.crossJoin(broadcast(tot))
      .groupBy($"v", $"ne", $"nr")
      .agg(
        round(sum((p * log(p / q)).cast(D12)).cast("double"), 6).as("kl_en_rest"),
        round(sum((q * log(q / p)).cast(D12)).cast("double"), 6).as("kl_rest_en"))
      .select($"v".as("vocab"), $"ne".as("n_en"), $"nr".as("n_rest"),
        $"kl_en_rest", $"kl_rest_en")
  }

  /** Sequence-length truncation audit: for candidate context lengths,
    * how many documents truncate, how many tokens survive, how many are
    * lost, and what fixed-length batching would waste as padding — the
    * table that decides max_seq_len (and whether packing is worth it)
    * before a single shard is written. One corpus pass, a 3-row cap
    * explode, pure integer aggregates.
    */
  val qSeqlenAudit: GQuery = GQuery(
    "q_pipeline_seqlen_audit",
    Some("""
      WITH tk AS (
        SELECT doc_id,
               list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                           t -> length(t) > 0) AS ts
        FROM documents),
      d AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n FROM tk),
      caps AS (SELECT unnest([32, 64, 128]) AS cap)
      SELECT CAST(cap AS BIGINT) AS cap,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN n > cap THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated,
             CAST(SUM(LEAST(n, cap)) AS BIGINT) AS kept_tokens,
             CAST(SUM(GREATEST(n - cap, 0)) AS BIGINT) AS lost_tokens,
             CAST(SUM(cap - LEAST(n, cap)) AS BIGINT) AS pad_tokens
      FROM d, caps GROUP BY cap ORDER BY cap""")
  ) { (spark, dir) =>
    import spark.implicits._
    val toks = filter(graft.operators.TextOps.tokens($"text"), x => length(x) > 0)
    t(spark, dir).documents
      .select(size(toks).cast("long").as("n"))
      .select($"n", explode(array(lit(32L), lit(64L), lit(128L))).as("cap"))
      .groupBy($"cap")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when($"n" > $"cap", 1L).otherwise(0L)).as("n_truncated"),
        sum(least($"n", $"cap")).as("kept_tokens"),
        sum(greatest($"n" - $"cap", lit(0L))).as("lost_tokens"),
        sum($"cap" - least($"n", $"cap")).as("pad_tokens"))
      .orderBy($"cap")
  }

  /** Embedding class-separability audit: the pairwise cosine between
    * per-label centroids (plus class sizes) — near-parallel centroids
    * mean the labels are not linearly separable in embedding space, the
    * go/no-go before training a classifier head on them. The centroid
    * pass is the fixed-point [[graft.functions.CentroidAgg]] (exact
    * integer sums — bit-identical across partitionings, same aggregate
    * the IVF codebooks train with); the k×k pair join is broadcast-tiny.
    */
  val qClassSeparation: GQuery = GQuery(
    "q_embed_class_separation",
    Some("""
      WITH flat AS (
        SELECT label, i,
               CAST(CAST((CAST(SUM(CAST(floor(CAST(e AS DOUBLE) * 1048576.0) AS BIGINT)) AS DOUBLE)
                          / COUNT(*)) / 1048576.0 AS REAL) AS DOUBLE) AS cv
        FROM (SELECT label, unnest(embedding) AS e,
                     unnest(generate_series(1, len(embedding))) AS i
              FROM embeddings)
        GROUP BY label, i),
      cents AS (SELECT label, list(cv ORDER BY i) AS c FROM flat GROUP BY label),
      cn AS (SELECT label, c, sqrt(list_sum(list_transform(c, x -> x * x))) AS nrm FROM cents),
      sz AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM embeddings GROUP BY label)
      SELECT CAST(a.label AS BIGINT) AS label_a, CAST(b.label AS BIGINT) AS label_b,
             sa.n_vecs AS n_a, sb.n_vecs AS n_b,
             round(list_sum(list_transform(generate_series(1, 64), i -> a.c[i] * b.c[i]))
                   / (a.nrm * b.nrm), 6) AS centroid_cos
      FROM cn a JOIN cn b ON a.label < b.label
      JOIN sz sa ON sa.label = a.label
      JOIN sz sb ON sb.label = b.label
      ORDER BY label_a, label_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    val centroidAgg = udaf(new graft.functions.CentroidAgg(64))
    val emb = t(spark, dir).embeddings
    val cents = emb
      .groupBy($"label")
      .agg(centroidAgg($"embedding").as("c"))
      .select($"label".cast("long").as("label"),
        transform($"c.values", x => x.cast("float")).as("cv"))
    val sz = emb.groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"))
      .select($"label".cast("long").as("label"), $"n_vecs")
    cents.as("a")
      .join(broadcast(cents.as("b")), col("a.label") < col("b.label"))
      .select(
        col("a.label").as("label_a"), col("b.label").as("label_b"),
        graft.operators.Similarity.cosine(col("a.cv"), col("b.cv")).as("s"))
      .join(broadcast(sz.select($"label".as("label_a"), $"n_vecs".as("n_a"))), "label_a")
      .join(broadcast(sz.select($"label".as("label_b"), $"n_vecs".as("n_b"))), "label_b")
      .select($"label_a", $"label_b", $"n_a", $"n_b",
        round($"s", 6).as("centroid_cos"))
      .orderBy($"label_a", $"label_b")
  }

  /** ANN hard-negative mining ([[graft.operators.Similarity.hardNegativesLsh]]):
    * per vector, the top-3 most-similar DIFFERENT-label vectors from its
    * corpus-scaled sign-LSH cell — contrastive-training pairs, mined the
    * only way that scales (celled candidates, label filter before the
    * rank). The oracle replays plane-count derivation, integer sign-dot
    * cells, the label filter, and the (cos DESC, dst) top-3 — the full
    * mining decision is hash-checked, including its deliberate sub-1
    * coverage (a vector whose cell has no impostor emits nothing, in
    * both engines).
    */
  val qHardNegatives: GQuery = GQuery(
    "q_ann_hard_negatives",
    Some("""
      WITH params AS (
        SELECT MIN(j) AS p
        FROM (SELECT unnest(generate_series(0, 40)) AS j) js,
             (SELECT COUNT(*) AS n FROM embeddings) cn
        WHERE (512::BIGINT << j) >= cn.n),
      qv AS (
        SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS q
        FROM embeddings),
      cells AS MATERIALIZED (
        SELECT vec_id,
               COALESCE(array_to_string(list_transform(generate_series(1, (SELECT p FROM params)),
                 pp -> CASE WHEN list_sum(list_transform(generate_series(1, 64),
                         d -> (CASE WHEN (('0x' || substr(md5('0|' || (pp-1)::VARCHAR || '|' || (d-1)::VARCHAR), 1, 16))::UBIGINT & 1) = 1
                                    THEN 1 ELSE -1 END) * q[d])) > 0
                       THEN '1' ELSE '0' END), ''), '') AS cell
        FROM qv),
      cellcnt AS (SELECT cell, COUNT(*) AS cn FROM cells GROUP BY cell),
      bkeep AS MATERIALIZED (
        SELECT vec_id, cell FROM (
          SELECT c.vec_id, c.cell, n.cn,
                 ROW_NUMBER() OVER (PARTITION BY c.cell
                                    ORDER BY md5(CAST(c.vec_id AS VARCHAR)), c.vec_id) AS rk
          FROM cells c JOIN cellcnt n USING (cell)) t
        WHERE cn <= 4096 OR rk <= 4096),
      v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings),
      edges AS (
        SELECT a.vec_id AS src, b.vec_id AS dst, va.label AS own, vb.label AS nl,
               list_sum(list_transform(generate_series(1, 64),
                        i -> va.e[i] * vb.e[i])) / (va.nrm * vb.nrm) AS s
        FROM cells a
        JOIN bkeep b ON a.cell = b.cell AND a.vec_id <> b.vec_id
        JOIN v va ON va.vec_id = a.vec_id
        JOIN v vb ON vb.vec_id = b.vec_id
        WHERE va.label <> vb.label)
      SELECT src AS vec_id, CAST(own AS BIGINT) AS label,
             CAST(rank AS INT) AS rank, dst AS neg_id, CAST(nl AS BIGINT) AS neg_label,
             round(s, 6) AS cos_sim
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS rank
            FROM edges) r
      WHERE rank <= 3
      ORDER BY vec_id, rank""")
  ) { (spark, dir) =>
    import spark.implicits._
    graft.operators.Similarity
      .hardNegativesLsh(t(spark, dir).embeddings, "vec_id", "embedding", "label", k = 3)
      .select(
        $"src".as("vec_id"), $"own".cast("long").as("label"),
        $"rank".cast("int").as("rank"), $"dst".as("neg_id"),
        $"nl".cast("long").as("neg_label"), round($"cos_sim", 6).as("cos_sim"))
      .orderBy($"vec_id", $"rank")
  }

  /** MULTI-PROBE hard-negative mining
    * ([[graft.operators.Similarity.hardNegativesLsh]] `multiProbe`,
    * round-9): each source probes its own sign-LSH cell AND the p
    * flip-1-bit neighbor cells, the standard multi-probe recall lever —
    * here raising COVERAGE (a source whose cell holds no impostor
    * single-probe usually finds one a Hamming step away; the contrastive
    * miner's real concern at scale). targetCell = 64 keeps the fixture
    * in the CELLED regime at both verify SFs (p = 3 at 500 vectors,
    * p = 5 at 2000), so probing itself is what's hash-checked: the
    * oracle replays the plane count, the cells, the per-cell candidate
    * cap, and the probe set by flipping each character of the cell
    * bit-string (set-equal to the engine's plane-bit flips). A dst
    * lives in exactly one cell, so no (src, dst) pair arises twice —
    * no DISTINCT needed on either side.
    */
  val qHardNegativesProbe: GQuery = GQuery(
    "q_ann_hard_negatives_probe",
    Some("""
      WITH params AS (
        SELECT MIN(j) AS p
        FROM (SELECT unnest(generate_series(0, 40)) AS j) js,
             (SELECT COUNT(*) AS n FROM embeddings) cn
        WHERE (64::BIGINT << j) >= cn.n),
      qv AS (
        SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS q
        FROM embeddings),
      cells AS MATERIALIZED (
        SELECT vec_id,
               COALESCE(array_to_string(list_transform(generate_series(1, (SELECT p FROM params)),
                 pp -> CASE WHEN list_sum(list_transform(generate_series(1, 64),
                         d -> (CASE WHEN (('0x' || substr(md5('0|' || (pp-1)::VARCHAR || '|' || (d-1)::VARCHAR), 1, 16))::UBIGINT & 1) = 1
                                    THEN 1 ELSE -1 END) * q[d])) > 0
                       THEN '1' ELSE '0' END), ''), '') AS cell
        FROM qv),
      cellcnt AS (SELECT cell, COUNT(*) AS cn FROM cells GROUP BY cell),
      bkeep AS MATERIALIZED (
        SELECT vec_id, cell FROM (
          SELECT c.vec_id, c.cell, n.cn,
                 ROW_NUMBER() OVER (PARTITION BY c.cell
                                    ORDER BY md5(CAST(c.vec_id AS VARCHAR)), c.vec_id) AS rk
          FROM cells c JOIN cellcnt n USING (cell)) t
        WHERE cn <= 512 OR rk <= 512),
      probes AS MATERIALIZED (
        SELECT vec_id,
               unnest(list_prepend(cell,
                 list_transform(generate_series(1, (SELECT p FROM params)),
                   pp -> substr(cell, 1, pp - 1)
                         || (CASE WHEN substr(cell, pp, 1) = '1' THEN '0' ELSE '1' END)
                         || substr(cell, pp + 1)))) AS cell
        FROM cells),
      v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings),
      edges AS (
        SELECT a.vec_id AS src, b.vec_id AS dst, va.label AS own, vb.label AS nl,
               list_sum(list_transform(generate_series(1, 64),
                        i -> va.e[i] * vb.e[i])) / (va.nrm * vb.nrm) AS s
        FROM probes a
        JOIN bkeep b ON a.cell = b.cell AND a.vec_id <> b.vec_id
        JOIN v va ON va.vec_id = a.vec_id
        JOIN v vb ON vb.vec_id = b.vec_id
        WHERE va.label <> vb.label)
      SELECT src AS vec_id, CAST(own AS BIGINT) AS label,
             CAST(rank AS INT) AS rank, dst AS neg_id, CAST(nl AS BIGINT) AS neg_label,
             round(s, 6) AS cos_sim
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS rank
            FROM edges) r
      WHERE rank <= 3
      ORDER BY vec_id, rank""")
  ) { (spark, dir) =>
    import spark.implicits._
    graft.operators.Similarity
      .hardNegativesLsh(t(spark, dir).embeddings, "vec_id", "embedding", "label", k = 3,
        targetCell = 64, multiProbe = true)
      .select(
        $"src".as("vec_id"), $"own".cast("long").as("label"),
        $"rank".cast("int").as("rank"), $"dst".as("neg_id"),
        $"nl".cast("long").as("neg_label"), round($"cos_sim", 6).as("cos_sim"))
      .orderBy($"vec_id", $"rank")
  }

  /** Windowed co-occurrence counts (the skip-gram context table word2vec/
    * GloVe-style embedding training consumes): unordered token pairs
    * within distance ≤ 3, counted per distance (exact integers — no 1/d
    * float weighting in the stored table; a trainer applies its own decay
    * at read time), top-100 by total count. Pair generation is ROW-LOCAL
    * (`zip_with` over d-shifted slices — no self-join, no per-element
    * lambda capture of the tokenize chain), then one pair-count shuffle;
    * the top-k plans as TakeOrdered over scored PAIRS, never a global
    * sort of the corpus.
    */
  val qCooccurrence: GQuery = GQuery(
    "q_text_cooccurrence",
    Some("""
      WITH tk AS (
        SELECT doc_id,
               list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                           t -> length(t) > 0) AS ts
        FROM documents),
      pr AS (
        -- single LATERAL over i; d from a plain subquery (DuckDB cannot
        -- bind a LATERAL that references a preceding LATERAL's column)
        SELECT least(ts[i], ts[i + d]) AS a, greatest(ts[i], ts[i + d]) AS b, d
        FROM tk,
             (SELECT unnest(generate_series(1, 3)) AS d) dd,
             LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g
        WHERE len(ts) > d AND i <= len(ts) - d),
      c AS (
        SELECT a, b,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_d1,
               CAST(SUM(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_d2,
               CAST(SUM(CASE WHEN d = 3 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_d3
        FROM pr GROUP BY a, b)
      SELECT a, b, cnt, cnt_d1, cnt_d2, cnt_d3, CAST(rank AS BIGINT) AS rank
      FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY cnt DESC, a, b) AS rank FROM c)
      WHERE rank <= 100
      ORDER BY rank""")
  ) { (spark, dir) =>
    import spark.implicits._
    val toks = filter(graft.operators.TextOps.tokens($"text"), x => length(x) > 0)
    def pairsAt(d: Int) =
      when(size($"ts") > d,
        zip_with(
          slice($"ts", lit(1), size($"ts") - d),
          slice($"ts", lit(1 + d), size($"ts") - d),
          (x, y) => struct(least(x, y).as("a"), greatest(x, y).as("b"), lit(d).as("d"))))
        .otherwise(array().cast("array<struct<a:string,b:string,d:int>>"))
    val pr = t(spark, dir).documents
      .select(toks.as("ts"))
      .select(explode(concat(pairsAt(1), pairsAt(2), pairsAt(3))).as("p"))
      .select($"p.a".as("a"), $"p.b".as("b"), $"p.d".as("d"))
    val c = pr.groupBy($"a", $"b")
      .agg(
        count(lit(1)).as("cnt"),
        sum(when($"d" === 1, 1L).otherwise(0L)).as("cnt_d1"),
        sum(when($"d" === 2, 1L).otherwise(0L)).as("cnt_d2"),
        sum(when($"d" === 3, 1L).otherwise(0L)).as("cnt_d3"))
    // top-100 via orderBy().limit() — a distributed TakeOrderedAndProject;
    // rank over the 100 survivors via the distributed indexer (the
    // q_text_pmi recipe — no global row_number window over the pair table)
    val top = c.orderBy($"cnt".desc, $"a", $"b").limit(100)
    graft.operators.Sampling
      .globalIndexBy(top, Seq($"cnt".desc, $"a", $"b"))
      .select($"a", $"b", $"cnt", $"cnt_d1", $"cnt_d2", $"cnt_d3",
        $"global_idx".cast("long").as("rank"))
      .orderBy($"rank")
  }

  /** Heaps'-law vocabulary-growth fit: V(n) ≈ K·n^β over the TRIGRAM
    * stream in (doc_id, position) order — the audit behind "is this
    * corpus still contributing new vocabulary, or are we re-crawling the
    * same material?" (β collapsing toward 0 at the tail is the
    * saturation signal). The unit is the positional word trigram, not
    * the unigram: the shipped corpora draw from a 31-word template
    * vocabulary that saturates inside the first checkpoint, which made
    * the round-9 unigram β a pure rounding residual (~-1.5e-7) whose
    * signed zero flipped across DuckDB builds. Trigram vocabulary
    * genuinely grows (3.1k → 16.2k across the sf0.01 stream, β ≈ 0.80),
    * so the fit measures a real exponent. Eight prefix checkpoints at
    * k·N/8 give the curve; the log-log least-squares fit gives (β, ln K).
    *
    * Oracle contract is BOUND-ENCODED (the q_agg_approx_distinct
    * pattern): hash-checked cells are the exact BIGINTs (k, n_prefix,
    * vocab_prefix) only; the fit lands in two booleans — β ∈ (0,1) and
    * per-checkpoint prediction exp(lnK + β·ln n) within 15% of the true
    * vocab (measured max residual 5.3%) — which the oracle pins TRUE.
    * No transcendental output ever reaches a hash-compared cell
    * (ln/round-ulp behavior differs across DuckDB builds — the round-9
    * driver-red lesson).
    *
    * Scale shape: V(n) is NEVER computed as a running distinct (the
    * sequential trap). Instead: one distributed total-order index over
    * the trigram stream ([[graft.operators.Sampling.globalIndexBy]]),
    * min(global_idx) per type = each type's FIRST-occurrence position,
    * and V(n_k) = count(first ≤ n_k) — eight conditional counts in ONE
    * aggregate pass. Trigrams come from two lead() steps inside the
    * per-doc window (never a HOF lambda over the tokenize tree — the
    * round-1 re-evaluation trap); the fit runs over 8 rows.
    */
  val qHeapsLaw: GQuery = GQuery(
    "q_text_heaps_law",
    Some("""
      WITH tk AS (
        SELECT doc_id,
               list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                           t -> length(t) > 0) AS ts
        FROM documents),
      pos AS (
        SELECT doc_id, i, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS t
        FROM tk, LATERAL (SELECT unnest(generate_series(1, len(ts) - 2)) AS i) g
        WHERE len(ts) >= 3),
      idx AS (
        SELECT t, ROW_NUMBER() OVER (ORDER BY doc_id, i) AS gi FROM pos),
      fo AS (SELECT t, MIN(gi) AS first_idx FROM idx GROUP BY t),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pos)
      SELECT CAST(k AS BIGINT) AS k,
             CAST((k * tot.n) // 8 AS BIGINT) AS n_prefix,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM fo
              WHERE first_idx <= (k * tot.n) // 8) AS vocab_prefix,
             TRUE AS beta_in_unit,
             TRUE AS fit_ok
      FROM range(1, 9) g(k) CROSS JOIN tot
      ORDER BY k""")
  ) { (spark, dir) =>
    import spark.implicits._
    val toks = filter(graft.operators.TextOps.tokens($"text"), x => length(x) > 0)
    val docs = t(spark, dir).documents.select($"doc_id", toks.as("ts"))
    val pos = docs
      .select($"doc_id", posexplode($"ts"))
      .toDF("doc_id", "i0", "t")
    // positional trigrams via two lead() steps in the per-doc window —
    // bounded partitions (doc length), no lambda over the tokenize tree
    import org.apache.spark.sql.expressions.Window
    val wd = Window.partitionBy($"doc_id").orderBy($"i0")
    val tri = pos
      .select($"doc_id", $"i0", $"t",
        lead($"t", 1).over(wd).as("t1"), lead($"t", 2).over(wd).as("t2"))
      .filter($"t2".isNotNull)
      .select($"doc_id", $"i0", concat_ws(" ", $"t", $"t1", $"t2").as("t"))
    // single-consumer chain — no corpus-scale checkpoint needed: the
    // trigram stream flows once into the first-occurrence aggregate, and
    // the total comes from the (already-scanned) per-doc counts
    val fo = graft.operators.Sampling
      .globalIndexBy(tri, Seq($"doc_id", $"i0"))
      .select($"t", $"global_idx".as("gi"))
      .groupBy($"t").agg(min($"gi").as("first_idx"))
    val tot = docs.agg(
      sum(when(size($"ts") >= 3, size($"ts") - 2).otherwise(0L)).cast("long").as("n"))
    val cp = spark.range(1, 9).select($"id".as("k"))
      .crossJoin(broadcast(tot))
      .select($"k", expr("(k * n) div 8").as("n_prefix"))
    val l = fo.crossJoin(broadcast(cp))
      .groupBy($"k", $"n_prefix")
      .agg(count(when($"first_idx" <= $"n_prefix", 1)).as("vocab_prefix"))
      .select($"k", $"n_prefix", $"vocab_prefix",
        log($"n_prefix".cast("double")).as("lx"),
        log($"vocab_prefix".cast("double")).as("ly"))
      .ckptLazy()
    // fit over 8 rows; products pass through DECIMAL(38,6) so the sums
    // are summation-order-independent (the fit feeds ONLY the booleans)
    val m = l.agg(
      count(lit(1)).as("n"),
      sum($"lx".cast(D)).cast("double").as("sx"),
      sum($"ly".cast(D)).cast("double").as("sy"),
      sum(($"lx" * $"lx").cast(D)).cast("double").as("sxx"),
      sum(($"lx" * $"ly").cast(D)).cast("double").as("sxy"))
    val nd = col("n").cast("double")
    val slope = (nd * col("sxy") - col("sx") * col("sy")) /
      (nd * col("sxx") - col("sx") * col("sx"))
    val lnK = (col("sy") - slope * col("sx")) / nd
    l.crossJoin(broadcast(m))
      .select($"k", $"n_prefix", $"vocab_prefix",
        (slope > 0d && slope < 1d).as("beta_in_unit"),
        (abs(exp(lnK + slope * $"lx") - $"vocab_prefix".cast("double"))
          / $"vocab_prefix".cast("double") <= 0.15).as("fit_ok"))
      .orderBy($"k")
  }

  /** Source-concentration audit: Gini coefficient, Simpson index,
    * normalized Shannon entropy, and the top source's share, over
    * per-source token counts — the "is the mixture dominated by one
    * crawl?" number a corpus team reads before setting mixture weights
    * (a Gini near 1 means the domain-cap / temperature samplers have
    * real work to do).
    *
    * Scale shape: ONE linear token-count aggregate to |sources| rows;
    * everything after is bounded-cardinality math on exact BIGINTs —
    * Gini via the sorted-rank formula (2·Σ i·x_(i) − (n+1)·ΣX) / (n·ΣX)
    * (no pairwise |x_i − x_j| join), ranks from a bounded window.
    * Simpson/entropy terms round to 6 decimals before DECIMAL sums.
    */
  val qDomainGini: GQuery = GQuery(
    "q_audit_domain_gini",
    Some("""
      WITH tk AS (
        SELECT source,
               len(list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                               t -> length(t) > 0)) AS ntok
        FROM documents),
      s AS (SELECT source, CAST(SUM(ntok) AS BIGINT) AS x FROM tk GROUP BY source),
      r AS (SELECT source, x, ROW_NUMBER() OVER (ORDER BY x, source) AS i FROM s),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS tot,
                   CAST(SUM(i * x) AS BIGINT) AS ix,
                   CAST(MAX(x) AS BIGINT) AS mx
            FROM r),
      term AS (
        SELECT round((CAST(x AS DOUBLE) / CAST(m.tot AS DOUBLE))
                     * (CAST(x AS DOUBLE) / CAST(m.tot AS DOUBLE)), 6) AS simp_t,
               round((CAST(x AS DOUBLE) / CAST(m.tot AS DOUBLE))
                     * ln(CAST(x AS DOUBLE) / CAST(m.tot AS DOUBLE)), 6) AS ent_t
        FROM s CROSS JOIN m),
      ta AS (SELECT CAST(SUM(CAST(simp_t AS DECIMAL(38,6))) AS DOUBLE) AS simpson,
                    CAST(SUM(CAST(ent_t AS DECIMAL(38,6))) AS DOUBLE) AS ent
             FROM term)
      SELECT m.n AS n_sources, m.tot AS total_tokens,
             round(CAST(2 * m.ix - (m.n + 1) * m.tot AS DOUBLE)
                   / CAST(m.n * m.tot AS DOUBLE), 6) AS gini,
             round(ta.simpson, 6) AS simpson,
             round(-ta.ent / ln(CAST(m.n AS DOUBLE)), 6) AS norm_entropy,
             round(CAST(m.mx AS DOUBLE) / CAST(m.tot AS DOUBLE), 6) AS top_share
      FROM m CROSS JOIN ta""")
  ) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = filter(graft.operators.TextOps.tokens($"text"), x => length(x) > 0)
    val s = t(spark, dir).documents
      .select($"source", size(toks).cast("long").as("ntok"))
      .groupBy($"source").agg(sum($"ntok").as("x"))
      .ckptLazy()
    // |sources| is bounded (a handful of crawl names) — the single-
    // partition rank window over |sources| rows is deliberate, not the
    // corpus-window trap.
    val r = s.withColumn("i", row_number().over(Window.orderBy($"x", $"source")))
    val m = r.agg(
      count(lit(1)).as("n"),
      sum($"x").as("tot"),
      sum($"i" * $"x").as("ix"),
      max($"x").as("mx"))
    val term = s.crossJoin(broadcast(m)).select(
      round(($"x".cast("double") / $"tot".cast("double"))
        * ($"x".cast("double") / $"tot".cast("double")), 6).as("simp_t"),
      round(($"x".cast("double") / $"tot".cast("double"))
        * log($"x".cast("double") / $"tot".cast("double")), 6).as("ent_t"))
    val ta = term.agg(
      sum($"simp_t".cast(D)).cast("double").as("simpson"),
      sum($"ent_t".cast(D)).cast("double").as("ent"))
    m.crossJoin(broadcast(ta)).select(
      $"n".as("n_sources"),
      $"tot".as("total_tokens"),
      round((lit(2) * $"ix" - ($"n" + 1) * $"tot").cast("double")
        / ($"n" * $"tot").cast("double"), 6).as("gini"),
      round($"simpson", 6).as("simpson"),
      round(-$"ent" / log($"n".cast("double")), 6).as("norm_entropy"),
      round($"mx".cast("double") / $"tot".cast("double"), 6).as("top_share"))
  }

  /** Embedding-space two-sample drift: linear-kernel MMD² between two
    * corpus slices (= squared L2 distance of their mean embeddings —
    * Gretton et al.'s kernel two-sample statistic with k(x,y)=x·y) plus
    * the per-slice sizes. Slices are the vec_id parity classes, standing
    * in for "yesterday's crawl vs today's": a drifting MMD² is the
    * go-look signal that a new snapshot's embedding distribution moved.
    *
    * Scale shape: two fixed-point-exact centroid aggregates
    * ([[graft.functions.CentroidAgg]], same pass q_embed_class_separation
    * uses — ONE corpus scan, d-row state), then the metric is ONE
    * row-local left-fold over the two 64-dim vectors (the
    * q_embed_outlier distance convention: identical sequential double
    * adds on both engines, never a cross-partition sum); sqrt is
    * IEEE-correctly-rounded everywhere, so l2 replays.
    */
  val qEmbedMmd: GQuery = GQuery(
    "q_embed_mmd",
    Some("""
      WITH flat AS (
        SELECT vec_id % 2 AS grp, i,
               CAST(CAST((CAST(SUM(CAST(floor(CAST(e AS DOUBLE) * 1048576.0) AS BIGINT)) AS DOUBLE)
                          / COUNT(*)) / 1048576.0 AS REAL) AS DOUBLE) AS cv
        FROM (SELECT vec_id, unnest(embedding) AS e,
                     unnest(generate_series(1, len(embedding))) AS i
              FROM embeddings)
        GROUP BY 1, 2),
      cents AS (SELECT grp, list(cv ORDER BY i) AS c FROM flat GROUP BY grp),
      sz AS (SELECT vec_id % 2 AS grp, CAST(COUNT(*) AS BIGINT) AS n
             FROM embeddings GROUP BY 1),
      m AS (
        SELECT list_sum(list_transform(generate_series(1, 64),
                 i -> (a.c[i] - b.c[i]) * (a.c[i] - b.c[i]))) AS mmd2
        FROM cents a, cents b
        WHERE a.grp = 0 AND b.grp = 1)
      SELECT sa.n AS n_a, sb.n AS n_b,
             round(m.mmd2, 6) AS mmd2,
             round(sqrt(m.mmd2), 6) AS l2
      FROM m, sz sa, sz sb
      WHERE sa.grp = 0 AND sb.grp = 1""")
  ) { (spark, dir) =>
    import spark.implicits._
    val centroidAgg = udaf(new graft.functions.CentroidAgg(64))
    val cents = t(spark, dir).embeddings
      .groupBy(($"vec_id" % 2).as("grp"))
      .agg(centroidAgg($"embedding").as("c"), count(lit(1)).as("n"))
      .select($"grp",
        transform($"c.values", x => x.cast("float").cast("double")).as("cv"),
        $"n")
      .ckptLazy()
    val a = cents.filter($"grp" === 0).select($"cv".as("ca"), $"n".as("n_a"))
    val b = cents.filter($"grp" === 1).select($"cv".as("cb"), $"n".as("n_b"))
    a.crossJoin(broadcast(b))
      .select($"n_a", $"n_b",
        aggregate(
          zip_with($"ca", $"cb", (x, y) => (x - y) * (x - y)),
          lit(0.0),
          (acc, v) => acc + v).as("mmd2"))
      .select($"n_a", $"n_b",
        round($"mmd2", 6).as("mmd2"),
        round(sqrt($"mmd2"), 6).as("l2"))
  }

  /** Stopword-profile stylometry: each source's frequency vector over a
    * fixed 10-stopword basis (the classic authorship/register signal —
    * function words survive topic shift), compared pairwise by cosine —
    * flags crawl sources that are restyled mirrors of each other even
    * when content-level dedup misses them.
    *
    * Scale shape: the profile is ONE token-scan pre-aggregated to
    * (source, word, count) — 10 rows per source; the pair join runs on
    * the |sources|-sized aggregate, never the corpus (the domain-gini
    * bounded class). Cosine is integer dot / √(integer sums) — exact
    * `÷ × sqrt` chain, hash-portable.
    */
  val qStylometry: GQuery = GQuery(
    "q_text_stylometry",
    Some("""
      WITH sw AS (SELECT unnest(['the','a','of','and','to','in','is','on','for','with']) AS w),
      tk AS (SELECT source, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
             FROM documents),
      spine AS (SELECT s.source, sw.w FROM (SELECT DISTINCT source FROM documents) s CROSS JOIN sw),
      cnts AS (SELECT tk.source, tk.tok AS w, CAST(COUNT(*) AS BIGINT) AS c
               FROM tk JOIN sw ON tk.tok = sw.w GROUP BY 1, 2),
      dense AS (SELECT sp.source, sp.w, COALESCE(c.c, 0) AS c
                FROM spine sp LEFT JOIN cnts c ON sp.source = c.source AND sp.w = c.w),
      nrm AS (SELECT source, CAST(SUM(c * c) AS BIGINT) AS ss FROM dense GROUP BY 1),
      pairs AS (SELECT a.source AS src_a, b.source AS src_b,
                       CAST(SUM(a.c * b.c) AS BIGINT) AS dot
                FROM dense a JOIN dense b ON a.w = b.w AND a.source < b.source
                GROUP BY 1, 2)
      SELECT p.src_a, p.src_b, p.dot,
             CAST(p.dot AS DOUBLE) / (sqrt(CAST(na.ss AS DOUBLE)) * sqrt(CAST(nb.ss AS DOUBLE))) AS cos_sim
      FROM pairs p JOIN nrm na ON p.src_a = na.source JOIN nrm nb ON p.src_b = nb.source
      ORDER BY src_a, src_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
    val docs = t(spark, dir).documents
    val tk = docs.select($"source",
      explode(split(trim(regexp_replace(lower($"text"), "\\s+", " ")), " ")).as("tok"))
    val sw = stopwords.toDF("w")
    val spine = docs.select($"source").distinct().crossJoin(broadcast(sw))
    val cnts = tk.join(broadcast(sw), $"tok" === $"w")
      .groupBy($"source", $"w").agg(count(lit(1)).as("c"))
    val dense = spine.as("sp")
      .join(cnts.as("c"), $"sp.source" === $"c.source" && $"sp.w" === $"c.w", "left")
      .select($"sp.source".as("source"), $"sp.w".as("w"), coalesce($"c.c", lit(0L)).as("c"))
    val nrm = dense.groupBy($"source").agg(sum($"c" * $"c").as("ss"))
    val pairs = dense.as("a")
      .join(dense.as("b"), $"a.w" === $"b.w" && $"a.source" < $"b.source")
      .groupBy($"a.source".as("src_a"), $"b.source".as("src_b"))
      .agg(sum($"a.c" * $"b.c").as("dot"))
    pairs.as("p")
      .join(broadcast(nrm.as("na")), $"src_a" === $"na.source")
      .join(broadcast(nrm.as("nb")), $"src_b" === $"nb.source")
      .select($"src_a", $"src_b", $"dot",
        ($"dot".cast("double") /
          (sqrt($"na.ss".cast("double")) * sqrt($"nb.ss".cast("double")))).as("cos_sim"))
      .orderBy($"src_a", $"src_b")
  }

  /** Word burstiness (variance-to-mean dispersion index of per-doc
    * counts, zeros included) for the top-20 corpus words: D ≈ 1 means a
    * word arrives Poisson-uniformly (function words), D ≫ 1 means it
    * clumps into few documents (topical/boilerplate words) — the signal
    * that separates stopword-like tokens from burst terms when building
    * stopword lists or tf saturation caps without a curated lexicon.
    *
    * Scale shape: one token scan pre-aggregated to (word, doc, count);
    * per-word moments are integer sums (zeros enter via N·Σc² − (Σc)²,
    * never a dense doc×word table); top-20 is TakeOrdered. D is one
    * exact integer ratio — hash-portable.
    */
  val qBurstiness: GQuery = GQuery(
    "q_text_burstiness",
    Some("""
      WITH tk AS (SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
                  FROM documents),
      nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
      cnt AS (SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM tk GROUP BY 1, 2),
      tot AS (SELECT w, CAST(SUM(c) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS df,
                     CAST(SUM(c * c) AS BIGINT) AS sq
              FROM cnt GROUP BY 1),
      top AS (SELECT * FROM tot ORDER BY total DESC, w LIMIT 20)
      SELECT t.w AS word, t.total, t.df,
             CAST(nd.nd * t.sq - t.total * t.total AS DOUBLE)
               / CAST(nd.nd * t.total AS DOUBLE) AS burstiness
      FROM top t CROSS JOIN nd
      ORDER BY total DESC, word""")
  ) { (spark, dir) =>
    import spark.implicits._
    val docs = t(spark, dir).documents
    val tk = docs.select($"doc_id",
      explode(split(trim(regexp_replace(lower($"text"), "\\s+", " ")), " ")).as("w"))
    val nd = docs.agg(count(lit(1)).as("nd"))
    val cnt = tk.groupBy($"w", $"doc_id").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy($"w").agg(
      sum($"c").as("total"), count(lit(1)).as("df"), sum($"c" * $"c").as("sq"))
    tot.orderBy($"total".desc, $"w").limit(20)
      .crossJoin(broadcast(nd))
      .select($"w".as("word"), $"total", $"df",
        (($"nd" * $"sq" - $"total" * $"total").cast("double") /
          ($"nd" * $"total").cast("double")).as("burstiness"))
      .orderBy($"total".desc, $"word")
  }

  override def queries: Seq[GQuery] = Seq(
    qDistinctNgrams, qZipf, qKlUnigram, qSeqlenAudit, qClassSeparation, qHardNegatives,
    qHardNegativesProbe, qCooccurrence, qHeapsLaw, qDomainGini, qEmbedMmd, qStylometry,
    qBurstiness)
}
