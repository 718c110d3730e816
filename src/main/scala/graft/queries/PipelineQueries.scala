package graft.queries

import graft.engine.PlanOnly.syntax._

import org.apache.spark.sql.functions._

import Common._
import graft.operators.Dedup

/** The flagship LLM-training-data preparation pipeline, composed from the
  * engine's own operators in ONE declarative DAG — the end-to-end shape a
  * real 100 TB corpus prep runs:
  *
  *   1. per-document quality + token stats (pure column expressions);
  *   2. exact-dedup decision table (hash groupBy) joined back as a
  *      keep-list (left-semi);
  *   3. quality/length gates;
  *   4. corpus-level accounting per source.
  *
  * Everything is SQL-expressible, so the whole composition — not just the
  * pieces — is oracle-checked. At scale: one scan of the corpus, one
  * groupBy for the decision table, one broadcast-ish semi join, one final
  * aggregation; no operator materializes text more than once.
  */
object PipelineQueries extends QuerySet {

  val qCorpusPrep: GQuery = GQuery(
    "q_pipeline_corpus_prep",
    Some("""
      WITH keep AS (
        SELECT min(doc_id) AS doc_id
        FROM documents
        GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))),
      scored AS (
        SELECT d.doc_id, d.source,
               len(string_split(d.text, ' ')) AS n_tokens,
               CAST(len(list_distinct(string_split(d.text, ' '))) AS DOUBLE)
                 / len(string_split(d.text, ' ')) AS diversity
        FROM documents d
        JOIN keep k ON d.doc_id = k.doc_id),
      gated AS (
        SELECT * FROM scored
        WHERE n_tokens BETWEEN 10 AND 5000 AND diversity >= 0.3)
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             CAST(SUM(CAST(diversity AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avg_diversity
      FROM gated
      GROUP BY source
      ORDER BY source""")
  ) { (spark, dir) =>
    import spark.implicits._
    val docs = t(spark, dir).documents
    // 1. dedup decision table → keep-list (exact-dedup operator)
    val keep = Dedup
      .exact(docs, "doc_id", "text")
      .select($"keep_id".as("doc_id"))
    // 2.+3. per-doc stats and gates on the surviving docs
    val toks = split($"text", " ")
    val scored = docs
      .join(keep, Seq("doc_id"), "left_semi")
      .select(
        $"doc_id",
        $"source",
        size(toks).as("n_tokens"),
        (size(array_distinct(toks)).cast("double") / size(toks)).as("diversity")
      )
      .filter($"n_tokens".between(10, 5000) && $"diversity" >= 0.3)
    // 4. corpus accounting per source
    scored
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tokens").cast("long").as("total_tokens"),
        davg($"diversity").as("avg_diversity")
      )
      .orderBy($"source")
  }

  /** Deterministic stratified sample of documents by source (hash-gated —
    * reproducible across partitionings/retries, unlike RNG-stream
    * sampling). The portable md5 gate lets DuckDB replay the exact keep
    * decision, so this is fully oracle-checked; the xxhash64 fast path and
    * repartition-invariance are asserted in SamplingSpec.
    */
  val qSample: GQuery = GQuery(
    "q_sample_stratified",
    Some("""
      SELECT doc_id, source FROM documents
      WHERE (source = 'src0' AND substr(md5(doc_id::VARCHAR || ':7'), 1, 4) < '8000')
         OR (source = 'src1' AND substr(md5(doc_id::VARCHAR || ':7'), 1, 4) < '4000')
         OR (source = 'src2' AND substr(md5(doc_id::VARCHAR || ':7'), 1, 4) < '1999')
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    graft.operators.Sampling
      .stratifiedPortable(
        t(spark, dir).documents,
        strataCol = "source",
        fractions = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.1),
        keyCol = "doc_id",
        seed = 7
      )
      .select($"doc_id", $"source")
      .orderBy($"doc_id")
  }

  /** Deterministic portable train/val/test split (80/10/10): the md5
    * 16-bit prefix of (doc_id, seed) cut at cumulative-weight boundaries —
    * the same split every engine, rerun, and partitioning reproduces. The
    * oracle replays the cut points verbatim (0.8 → 'cccc', 0.9 → 'e666').
    */
  val qSplit: GQuery = GQuery(
    "q_sample_split",
    Some("""
      SELECT doc_id,
             CASE WHEN substr(md5(doc_id::VARCHAR || ':13'), 1, 4) < 'cccc' THEN 'train'
                  WHEN substr(md5(doc_id::VARCHAR || ':13'), 1, 4) < 'e666' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    graft.operators.Sampling
      .splitAssign(
        t(spark, dir).documents,
        keyCol = "doc_id",
        splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        seed = 13
      )
      .select($"doc_id", $"split")
      .orderBy($"doc_id")
  }

  /** Train/test contamination audit ([[Dedup.contamination]]): the test
    * side is the portable 10% md5-gated sample, the train side is its
    * complement; per test doc, the fraction of its distinct 5-gram
    * shingles that leak from the train corpus. Fully oracle-checked —
    * split, shingling (incl. the <n-token whole-text fallback), hit
    * counting, and the double ratio all replay in SQL.
    */
  val qContamination: GQuery = GQuery(
    "q_pipeline_contamination",
    Some("""
      WITH t AS (SELECT doc_id,
                        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
                 FROM documents),
      sh AS (SELECT DISTINCT doc_id,
                    ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4] AS s
             FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts)-4)) AS i) g
             WHERE len(ts) >= 5
             UNION
             SELECT doc_id, array_to_string(ts, ' ') AS s FROM t WHERE len(ts) < 5),
      test AS (SELECT doc_id FROM documents
               WHERE substr(md5(doc_id::VARCHAR || ':17'), 1, 4) < '1999'),
      trainsh AS (SELECT DISTINCT s FROM sh
                  WHERE doc_id NOT IN (SELECT doc_id FROM test)),
      tsh AS (SELECT sh.doc_id, sh.s FROM sh JOIN test USING (doc_id))
      SELECT tsh.doc_id,
             COUNT(*) AS n_shingles,
             CAST(SUM(CASE WHEN trainsh.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
             CAST(SUM(CASE WHEN trainsh.s IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS contamination
      FROM tsh LEFT JOIN trainsh ON tsh.s = trainsh.s
      GROUP BY tsh.doc_id
      ORDER BY tsh.doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val docs = t(spark, dir).documents
    val test = graft.operators.Sampling.bernoulliPortable(docs, "doc_id", 0.1, seed = 17)
    val train = docs.join(test, Seq("doc_id"), "left_anti")
    Dedup
      .contamination(train, test, "doc_id", "text", shingleN = 5)
      .select($"id".as("doc_id"), $"n_shingles", $"n_hit", $"contamination")
      .orderBy($"doc_id")
  }

  /** Sequence packing ([[graft.operators.Packing.packBins]]): documents
    * are concat-and-chunk packed into 512-token training bins within 8
    * deterministic shards (packing is sequential, so sharding is what
    * parallelizes it at scale). The oracle replays the shard, the
    * exclusive running token total, and the bin/offset arithmetic.
    */
  val qPack: GQuery = GQuery(
    "q_pipeline_pack",
    Some("""
      WITH d AS (
        SELECT doc_id,
               doc_id % 8 AS shard,
               len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, shard, n_tokens,
               COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS cum_before
        FROM d)
      SELECT doc_id, shard, n_tokens,
             CAST(floor(cum_before / 512.0) AS BIGINT) AS bin,
             CAST(cum_before % 512 AS BIGINT) AS bin_offset
      FROM c
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.operators.{Packing, TextOps}
    val withTokens = t(spark, dir).documents
      .select($"doc_id", size(TextOps.tokens($"text")).cast("long").as("n_tokens"))
    Packing
      .packBins(withTokens, "doc_id", "n_tokens", binTokens = 512, nShards = 8)
      .select($"doc_id", $"shard", $"n_tokens", $"bin", $"bin_offset")
      .orderBy($"doc_id")
  }

  /** Per-domain quota cap ([[graft.operators.Sampling.domainCap]]): at
    * most 10 documents per source, best-first by length (n_chars desc,
    * doc_id tie-break) — the corpus-balancing op that stops one
    * mega-domain from dominating a training mix. Deterministic ranking,
    * so the oracle's row_number replays it exactly.
    */
  val qDomainCap: GQuery = GQuery(
    "q_sample_domain_cap",
    Some("""
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
      FROM (SELECT doc_id, source, n_chars,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id) AS rk
            FROM documents)
      WHERE rk <= 10
      ORDER BY source, n_chars DESC, doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    graft.operators.Sampling
      .domainCap(t(spark, dir).documents, "source", $"n_chars".desc, $"doc_id".asc, 10)
      .select($"doc_id", $"source", $"n_chars")
      .orderBy($"source", $"n_chars".desc, $"doc_id")
  }

  /** Deterministic corpus shuffle ([[graft.operators.Sampling.shuffleDeterministic]]):
    * the head of the seeded global permutation, with the md5 sort key
    * exposed so the oracle proves the ORDER, not just the membership
    * (the harness hash is row-order-insensitive). ORDER BY + LIMIT plans
    * as TakeOrderedAndProject — top-k per partition then a driver merge,
    * no global single-task sort for the probe.
    */
  val qShuffle: GQuery = GQuery(
    "q_sample_shuffle",
    Some("""
      SELECT doc_id, md5(doc_id::VARCHAR || ':41') AS shuffle_key
      FROM documents
      ORDER BY shuffle_key, doc_id
      LIMIT 100""")
  ) { (spark, dir) =>
    import spark.implicits._
    graft.operators.Sampling
      .shuffleDeterministic(t(spark, dir).documents, "doc_id", seed = 41)
      .select($"doc_id", md5(concat($"doc_id".cast("string"), lit(":41"))).as("shuffle_key"))
      .limit(100)
  }

  /** Weighted portable Bernoulli ([[graft.operators.Sampling.weightedPortable]]):
    * keep-probability derived per row (length-proportional quality proxy,
    * clamped at 1), decided by the row's 16-bit md5 value against a
    * per-row hex threshold. The importance-sampling step of corpus
    * construction, fully replayable: the oracle rebuilds the identical
    * weight, threshold, and gate.
    */
  val qWeighted: GQuery = GQuery(
    "q_sample_weighted",
    Some("""
      WITH w AS (SELECT doc_id, source,
                        least(greatest(n_chars / 1200.0, 0.0), 1.0) AS wt
                 FROM documents)
      SELECT doc_id, source FROM w
      WHERE wt >= 1.0
         OR substr(md5(doc_id::VARCHAR || ':19'), 1, 4)
            < printf('%04x', CAST(floor(wt * 65536) AS INT))
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    graft.operators.Sampling
      .weightedPortable(
        t(spark, dir).documents,
        keyCol = "doc_id",
        weight = $"n_chars" / 1200.0,
        seed = 19
      )
      .select($"doc_id", $"source")
      .orderBy($"doc_id")
  }

  /** Deterministic corpus mixing ([[graft.operators.Sampling.mixByStratum]]):
    * src0 upsampled to 2.5 epochs, src1 kept at 1, src2 downsampled to
    * 0.25 — each row's copy count is 'floor(epochs) + one md5-gated
    * fractional copy', so the mix is identical across engines and reruns.
    * The oracle replays copy counts and the copy-index explode verbatim.
    */
  val qMix: GQuery = GQuery(
    "q_sample_mix",
    Some("""
      WITH r AS (SELECT doc_id, source,
                        CASE source WHEN 'src0' THEN 2.5
                                    WHEN 'src1' THEN 1.0
                                    WHEN 'src2' THEN 0.25 END AS reps
                 FROM documents),
      c AS (SELECT doc_id, source,
                   CAST(floor(reps) AS INT)
                   + CASE WHEN substr(md5(doc_id::VARCHAR || ':21'), 1, 4)
                               < printf('%04x', CAST(floor((reps - floor(reps)) * 65536) AS INT))
                          THEN 1 ELSE 0 END AS n
            FROM r WHERE reps IS NOT NULL)
      SELECT doc_id, source, CAST(unnest(generate_series(1, n)) AS INT) AS copy
      FROM c WHERE n >= 1
      ORDER BY doc_id, copy""")
  ) { (spark, dir) =>
    import spark.implicits._
    graft.operators.Sampling
      .mixByStratum(
        t(spark, dir).documents,
        strataCol = "source",
        epochs = Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25),
        keyCol = "doc_id",
        seed = 21
      )
      .select($"doc_id", $"source", $"copy")
      .orderBy($"doc_id", $"copy")
  }

  /** Temperature-scaled source mixing ([[graft.operators.Sampling
    * .temperatureMix]], α = 0.5, target = half the corpus): stratum keep
    * fractions derived from exact per-source counts via `n^α`
    * normalization, gated per row by the portable md5/2^16 gate. The
    * oracle rebuilds the identical count → pow → decimal-summed
    * normalizer → fraction → threshold chain, so the hash match proves
    * the whole mixing computation equal cross-engine.
    */
  /** Shard-merge proof for weighted reservoir sampling: the property
    * that makes [[graft.operators.Sampling.weightedReservoirPerGroup]]
    * usable on a 1000-shard corpus — per-shard top-k samples UNION'd
    * and re-ranked equal the single-pass global sample, because the
    * A-ES priority is a pure per-row function (a row in the global
    * top-k is in its shard's top-k a fortiori). The ENGINE runs the
    * two-level merge (4 doc_id%4 shards → per-shard k-cut → global
    * re-rank); the ORACLE computes the direct global sample — the hash
    * match IS the mergeability proof, the implementation-equality
    * pattern (HtmlStripText precedent). Priorities round to 9 dp
    * before every rank on both sides (the round-9 cross-engine ulp
    * rule).
    */
  val qReservoirMerge: GQuery = GQuery(
    "q_sample_reservoir_merge",
    Some("""
      WITH u AS (
        SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS w,
               (('0x' || substr(md5(doc_id::VARCHAR || ':23'), 1, 4))::BIGINT + 1.0)
                 / 65536.0 AS u
        FROM documents WHERE n_chars > 0),
      p AS (
        SELECT lang, doc_id, w, round(ln(u) / CAST(w AS DOUBLE), 9) AS prio,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY round(ln(u) / CAST(w AS DOUBLE), 9) DESC, doc_id) AS rk
        FROM u)
      SELECT lang, doc_id, w, prio AS priority, CAST(rk AS BIGINT) AS sample_rank
      FROM p WHERE rk <= 5
      ORDER BY lang, sample_rank""")
  ) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // stage 1: each shard computes its own k-cut independently
    val d = t(spark, dir).documents
      .filter($"n_chars" > 0)
      .select($"lang", $"doc_id", $"n_chars".cast("long").as("w"),
        ($"doc_id" % 4).as("shard"))
    val u = (conv(substring(md5(concat($"doc_id".cast("string"), lit(":23"))), 1, 4), 16, 10)
      .cast("double") + 1.0) / 65536.0
    val prio = round(log(u) / $"w".cast("double"), 9)
    val wShard = Window.partitionBy($"lang", $"shard").orderBy($"priority".desc, $"doc_id")
    val shardTop = d.withColumn("priority", prio)
      .withColumn("srk", row_number().over(wShard))
      .filter($"srk" <= 5)
    // stage 2: merge the 4 shard samples, global re-rank, same k-cut
    val wGlobal = Window.partitionBy($"lang").orderBy($"priority".desc, $"doc_id")
    shardTop
      .withColumn("sample_rank", row_number().over(wGlobal).cast("long"))
      .filter($"sample_rank" <= 5)
      .select($"lang", $"doc_id", $"w", $"priority", $"sample_rank")
      .orderBy($"lang", $"sample_rank")
  }

  /** Curation attrition funnel: the per-stage survival report every
    * corpus prep publishes (and the first thing a data audit asks for —
    * WHERE did the tokens go). Four chained gates over documents:
    * token-length window → token-diversity floor (the dup-token
    * repetition proxy) → language whitelist → exact dedup (min doc_id
    * per normalized-text md5). Each stage's count comes from ONE
    * cumulative filter chain over a single scan (the dedup decision
    * table is the only shuffle); attrition is reported per stage as
    * exact BIGINTs + one IEEE rate. Fully replayed by the oracle, so
    * the funnel's every cell is hash-checked.
    */
  val qAttrition: GQuery = GQuery(
    "q_pipeline_attrition",
    Some("""
      WITH d AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_tok,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) AS diversity,
               md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h
        FROM documents),
      s1 AS (SELECT * FROM d WHERE n_tok BETWEEN 10 AND 5000),
      s2 AS (SELECT * FROM s1 WHERE diversity >= 0.4),
      s3 AS (SELECT * FROM s2 WHERE lang IN ('en', 'es', 'fr', 'de')),
      keep AS (SELECT MIN(doc_id) AS doc_id FROM s3 GROUP BY h),
      s4 AS (SELECT s3.* FROM s3 JOIN keep USING (doc_id)),
      counts AS (
        SELECT 0 AS stage_ord, 'input' AS stage, (SELECT COUNT(*) FROM d) AS survivors
        UNION ALL SELECT 1, 'len_gate', (SELECT COUNT(*) FROM s1)
        UNION ALL SELECT 2, 'diversity_gate', (SELECT COUNT(*) FROM s2)
        UNION ALL SELECT 3, 'lang_gate', (SELECT COUNT(*) FROM s3)
        UNION ALL SELECT 4, 'exact_dedup', (SELECT COUNT(*) FROM s4))
      SELECT CAST(stage_ord AS INT) AS stage_ord, stage,
             CAST(survivors AS BIGINT) AS survivors,
             CAST(COALESCE(LAG(survivors) OVER (ORDER BY stage_ord) - survivors, 0) AS BIGINT) AS dropped,
             round(CASE WHEN stage_ord = 0 THEN 0.0
                        ELSE CAST(LAG(survivors) OVER (ORDER BY stage_ord) - survivors AS DOUBLE)
                             / CAST(LAG(survivors) OVER (ORDER BY stage_ord) AS DOUBLE) END,
                   6) AS drop_rate
      FROM counts
      ORDER BY stage_ord""")
  ) { (spark, dir) =>
    import spark.implicits._
    val toks = split($"text", " ")
    val d = t(spark, dir).documents.select(
      $"doc_id", $"lang",
      size(toks).as("n_tok"),
      (size(array_distinct(toks)).cast("double") / size(toks)).as("diversity"),
      md5(trim(regexp_replace(lower($"text"), "\\s+", " "))).as("h"))
      .ckptLazy() // one scan feeds every cumulative stage count
    val s1 = d.filter($"n_tok".between(10, 5000))
    val s2 = s1.filter($"diversity" >= 0.4)
    val s3 = s2.filter($"lang".isin("en", "es", "fr", "de"))
    val keep = s3.groupBy($"h").agg(min($"doc_id").as("doc_id")).select($"doc_id")
    val s4 = s3.join(keep, Seq("doc_id"), "left_semi")
    def cnt(df: org.apache.spark.sql.DataFrame, ord: Int, name: String) =
      df.agg(count(lit(1)).as("survivors"))
        .select(lit(ord).as("stage_ord"), lit(name).as("stage"), $"survivors")
    val counts = cnt(d, 0, "input")
      .unionAll(cnt(s1, 1, "len_gate"))
      .unionAll(cnt(s2, 2, "diversity_gate"))
      .unionAll(cnt(s3, 3, "lang_gate"))
      .unionAll(cnt(s4, 4, "exact_dedup"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"stage_ord")
    counts
      .select($"stage_ord".cast("int").as("stage_ord"), $"stage", $"survivors",
        coalesce(lag($"survivors", 1).over(w) - $"survivors", lit(0L)).cast("long").as("dropped"),
        round(when($"stage_ord" === 0, 0.0)
          .otherwise((lag($"survivors", 1).over(w) - $"survivors").cast("double")
            / lag($"survivors", 1).over(w).cast("double")), 6).as("drop_rate"))
      .orderBy($"stage_ord")
  }

  /** Neyman-allocation stratified sampling (the survey-optimal split a
    * corpus profiler uses when strata differ in VARIANCE, not just
    * size): per language, n_h ∝ N_h·S_h over doc length — a
    * high-variance stratum earns more sample than proportional
    * allocation would give it. Exactness discipline: N_h, Σx, Σx² are
    * BIGINT; S_h is one IEEE chain from those exact ints; N_h·S_h is
    * rounded to 6 dp and summed as DECIMAL(38,6) (the normalizer must
    * not differ by an ulp between engines); n_h = ⌊100·share + 0.5⌋
    * (floor(x+0.5) spelled out — no engine-specific round-to-int).
    * Membership is the portable md5 draw (reservoirPerGroup's
    * convention), so the SAMPLE ITSELF is hash-checked, not just the
    * allocation. Σn_h may differ from 100 by rounding — by design, and
    * identically on both engines. Plan: one stats aggregate + a
    * partitioned top-n_h window — never a global sort.
    */
  val qNeyman: GQuery = GQuery(
    "q_sample_neyman",
    Some("""
      WITH st AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS nh,
               CAST(SUM(n_chars) AS BIGINT) AS sx,
               CAST(SUM(CAST(n_chars AS BIGINT) * n_chars) AS BIGINT) AS sx2
        FROM documents GROUP BY lang),
      sd AS (
        SELECT lang, nh,
               sqrt((CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(nh AS DOUBLE))
                    / (CAST(nh AS DOUBLE) - 1.0)) AS sh
        FROM st),
      wd AS (
        SELECT lang, nh, sh,
               CAST(round(CAST(nh AS DOUBLE) * sh, 6) AS DECIMAL(38,6)) AS nhsh
        FROM sd),
      alloc AS (
        SELECT lang, nh, sh,
               CAST(floor(100.0 * (CAST(nhsh AS DOUBLE) / CAST(d AS DOUBLE)) + 0.5) AS BIGINT) AS n_alloc
        FROM wd, (SELECT SUM(nhsh) AS d FROM wd)),
      ranked AS (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY md5(doc_id::VARCHAR || ':31'), doc_id) AS rk
        FROM documents)
      SELECT r.lang, r.doc_id, CAST(r.rk AS BIGINT) AS sample_rank,
             a.n_alloc, CAST(a.nh AS BIGINT) AS stratum_size, round(a.sh, 6) AS stratum_sd
      FROM ranked r JOIN alloc a USING (lang)
      WHERE r.rk <= a.n_alloc
      ORDER BY lang, sample_rank""")
  ) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val docs = t(spark, dir).documents
    val st = docs.groupBy($"lang").agg(
      count(lit(1)).as("nh"),
      sum($"n_chars".cast("long")).as("sx"),
      sum($"n_chars".cast("long") * $"n_chars").as("sx2"))
    val sd = st.select($"lang", $"nh",
      sqrt(($"sx2".cast("double") - $"sx".cast("double") * $"sx".cast("double") / $"nh".cast("double"))
        / ($"nh".cast("double") - 1.0)).as("sh"))
    val wd = sd.select($"lang", $"nh", $"sh",
      round($"nh".cast("double") * $"sh", 6).cast(DecimalType(38, 6)).as("nhsh"))
      .ckptLazy() // feeds the normalizer sum AND the per-stratum rows
    val dTot = wd.groupBy().agg(sum($"nhsh").as("d"))
    val alloc = wd.crossJoin(broadcast(dTot)).select(
      $"lang", $"nh", $"sh",
      floor(lit(100.0) * ($"nhsh".cast("double") / $"d".cast("double")) + 0.5)
        .cast("long").as("n_alloc"))
    val ranked = docs
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"lang")
          .orderBy(md5(concat($"doc_id".cast("string"), lit(":31"))), $"doc_id")))
      .select($"lang", $"doc_id", $"rk")
    ranked.join(broadcast(alloc), Seq("lang"))
      .filter($"rk" <= $"n_alloc")
      .select($"lang", $"doc_id", $"rk".cast("long").as("sample_rank"),
        $"n_alloc", $"nh".as("stratum_size"), round($"sh", 6).as("stratum_sd"))
      .orderBy($"lang", $"sample_rank")
  }

  /** Token-budget allocation across languages (the UniMax/multilingual
    * mixing-plan shape): a training budget B = 1.2 × corpus tokens is
    * split by √-temperature weights (α = 0.5 flattens the head), with a
    * per-language repetition cap of 1.5 epochs and ONE documented
    * waterfill redistribution round (capped languages return their
    * overflow, the uncapped re-share it by the same weights, the cap
    * applies again). Every comparison that picks a branch (capped or
    * not) is one IEEE chain from EXACT inputs on both engines: token
    * counts are BIGINT, weights are sqrt rounded to 6 dp and summed as
    * DECIMAL(38,6) (double sums are order-dependent; the normalizer and
    * the leftover must not differ by an ulp between engines), B and the
    * cap are integer-ratio doubles (12·T/10, 3·T/2). The oracle replays
    * the full two-round allocation, so the mixing PLAN itself — epochs
    * per language, who got capped — is hash-checked.
    */
  val qTokenBudget: GQuery = GQuery(
    "q_pipeline_token_budget",
    Some("""
      WITH tl AS (
        SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        FROM documents GROUP BY lang),
      w AS (
        SELECT lang, tokens,
               CAST(round(sqrt(CAST(tokens AS DOUBLE)), 6) AS DECIMAL(38,6)) AS wt
        FROM tl),
      tot AS (
        SELECT CAST(SUM(wt) AS DOUBLE) AS wsum,
               CAST(SUM(tokens) * 12 AS DOUBLE) / 10.0 AS budget
        FROM w),
      r1 AS (
        SELECT lang, tokens, wt,
               budget * (CAST(wt AS DOUBLE) / wsum) AS a1,
               CAST(tokens * 3 AS DOUBLE) / 2.0 AS cap
        FROM w, tot),
      r1m AS (
        SELECT *, a1 > cap AS capped1,
               CAST(round(least(a1, cap), 6) AS DECIMAL(38,6)) AS s1
        FROM r1),
      lo AS (
        SELECT CAST(CAST(round(budget, 6) AS DECIMAL(38,6)) - SUM(s1) AS DOUBLE) AS leftover,
               CAST(SUM(CASE WHEN capped1 THEN CAST(0 AS DECIMAL(38,6)) ELSE wt END) AS DOUBLE) AS wu
        FROM r1m, tot GROUP BY budget),
      r2 AS (
        SELECT lang, tokens, wt, cap, capped1,
               CASE WHEN capped1 THEN CAST(s1 AS DOUBLE)
                    ELSE a1 + leftover * (CAST(wt AS DOUBLE) / wu) END AS a2
        FROM r1m, lo)
      SELECT lang, tokens,
             CAST(wt AS DOUBLE) AS weight,
             round(least(a2, cap), 6) AS alloc_tokens,
             round(CAST(CAST(round(least(a2, cap), 6) AS DECIMAL(38,6)) AS DOUBLE)
                   / CAST(tokens AS DOUBLE), 6) AS epochs,
             (capped1 OR a2 > cap) AS capped
      FROM r2
      ORDER BY lang""")
  ) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val tl = t(spark, dir).documents
      .groupBy($"lang")
      .agg(sum(size(split($"text", " ")).cast("long")).as("tokens"))
    val w = tl.select($"lang", $"tokens",
      round(sqrt($"tokens".cast("double")), 6).cast(DecimalType(38, 6)).as("wt"))
      .ckptLazy() // feeds both rounds and both normalizer sums
    val tot = w.groupBy().agg(
      sum($"wt").cast("double").as("wsum"),
      ((sum($"tokens") * 12).cast("double") / 10.0).as("budget"))
    val r1 = w.crossJoin(broadcast(tot)).select(
      $"lang", $"tokens", $"wt", $"budget",
      ($"budget" * ($"wt".cast("double") / $"wsum")).as("a1"),
      (($"tokens" * 3).cast("double") / 2.0).as("cap"))
    val r1m = r1.select($"lang", $"tokens", $"wt", $"budget", $"a1", $"cap",
      ($"a1" > $"cap").as("capped1"),
      round(least($"a1", $"cap"), 6).cast(DecimalType(38, 6)).as("s1"))
      .ckptLazy() // feeds the leftover tally AND round 2
    val lo = r1m.groupBy($"budget").agg(
      (round($"budget", 6).cast(DecimalType(38, 6)) - sum($"s1")).cast("double").as("leftover"),
      sum(when($"capped1", lit(0).cast(DecimalType(38, 6))).otherwise($"wt"))
        .cast("double").as("wu"))
      .drop("budget")
    val r2 = r1m.crossJoin(broadcast(lo)).select(
      $"lang", $"tokens", $"wt", $"cap", $"capped1",
      when($"capped1", $"s1".cast("double"))
        .otherwise($"a1" + $"leftover" * ($"wt".cast("double") / $"wu")).as("a2"))
    r2.select(
      $"lang", $"tokens",
      $"wt".cast("double").as("weight"),
      round(least($"a2", $"cap"), 6).as("alloc_tokens"),
      round(round(least($"a2", $"cap"), 6).cast(DecimalType(38, 6)).cast("double")
        / $"tokens".cast("double"), 6).as("epochs"),
      ($"capped1" || $"a2" > $"cap").as("capped"))
      .orderBy($"lang")
  }

  val qTemperature: GQuery = GQuery(
    "q_sample_temperature",
    Some("""
      WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
      p AS (SELECT source, n, POWER(CAST(n AS DOUBLE), 0.5) AS pw FROM c),
      z AS (SELECT CAST(SUM(CAST(pw AS DECIMAL(38,6))) AS DOUBLE) AS zn,
                   CAST(SUM(n) AS DOUBLE) AS grand FROM p),
      f AS (SELECT source, least(1.0, 0.5 * grand * (pw / zn) / CAST(n AS DOUBLE)) AS frac
            FROM p, z)
      SELECT d.doc_id, d.source FROM documents d JOIN f USING (source)
      WHERE frac >= 1.0
         OR substr(md5(d.doc_id::VARCHAR || ':37'), 1, 4)
            < printf('%04x', CAST(least(floor(frac * 65536), 65535) AS INT))
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    graft.operators.Sampling
      .temperatureMix(
        t(spark, dir).documents,
        strataCol = "source",
        keyCol = "doc_id",
        alpha = 0.5,
        targetFraction = 0.5,
        seed = 37
      )
      .select($"doc_id", $"source")
      .orderBy($"doc_id")
  }

  /** Contrastive negative-pair mining ([[graft.operators.Sampling
    * .affinePairs]]): pair doc i with doc (48271·i + 173) mod n under an
    * affine permutation of the dense id domain — a deterministic,
    * RNG-free, 1-regular pairing that is one computed-key equi-join (no
    * global sort, no row_number window) — then EXCLUDE pairs that are not
    * negative: same normalized content hash (exact dups) or same source
    * (domain positives). The same exclusion join would take the near-dup
    * pair set where semantic negatives are needed. The oracle replays
    * permutation, hashes, and exclusions exactly.
    */
  val qNegativePairs: GQuery = GQuery(
    "q_sample_negative_pairs",
    Some("""
      WITH base AS (SELECT doc_id, source,
                           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h
                    FROM documents),
      p AS (SELECT doc_id AS id_a,
                   (doc_id * 48271 + 173) % (SELECT COUNT(*) FROM base) AS id_b
            FROM base
            WHERE (doc_id * 48271 + 173) % (SELECT COUNT(*) FROM base) <> doc_id)
      SELECT p.id_a, p.id_b, a.source AS source_a, b.source AS source_b
      FROM p
      JOIN base a ON a.doc_id = p.id_a
      JOIN base b ON b.doc_id = p.id_b
      WHERE a.h <> b.h AND a.source <> b.source
      ORDER BY id_a""")
  ) { (spark, dir) =>
    import spark.implicits._
    val docs = t(spark, dir).documents
    val n = docs.count()
    val base = docs
      .select(
        $"doc_id",
        $"source",
        md5(encode(graft.operators.TextOps.normText($"text"), "UTF-8")).as("h"))
      .ckptLazy()
    graft.operators.Sampling
      .affinePairs(base, "doc_id", n, a = 48271L, b = 173L)
      .join(base.select($"doc_id".as("id_a"), $"source".as("source_a"), $"h".as("h_a")), "id_a")
      .join(base.select($"doc_id".as("id_b"), $"source".as("source_b"), $"h".as("h_b")), "id_b")
      .filter($"h_a" =!= $"h_b" && $"source_a" =!= $"source_b")
      .select($"id_a", $"id_b", $"source_a", $"source_b")
      .orderBy($"id_a")
  }

  /** Contiguous global example ids ([[graft.operators.Sampling.globalIndex]]):
    * the two-pass zipWithIndex recipe (range-partition by the seeded md5
    * order, per-partition counts, offset-shifted local enumeration) that
    * replaces the single-task unpartitioned row_number window at 100 TB.
    * Emitting every (doc_id, global_idx) pair makes the hash match a
    * proof of the ENTIRE assigned permutation, not just membership.
    */
  val qGlobalIndex: GQuery = GQuery(
    "q_sample_global_index",
    Some("""
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY md5(doc_id::VARCHAR || ':17'), doc_id)
               AS global_idx
      FROM documents
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    graft.operators.Sampling
      .globalIndex(t(spark, dir).documents, "doc_id", seed = 17)
      .select($"doc_id", $"global_idx")
      .orderBy($"doc_id")
  }

  /** Padding-minimizing pair packing ([[graft.operators.Packing.pairPack]]):
    * docs ranked by token count descending, rank b paired with rank
    * n+1-b (longest with shortest), overflowing pairs degraded to
    * singletons — the whole-document alternative to [[qPack]]'s
    * concat-and-chunk. The oracle replays ranking, folding, and the
    * degrade rule with window functions, so the hash match proves the
    * exact bin assignment, fills, and padding.
    */
  val qPackPairs: GQuery = GQuery(
    "q_pipeline_pack_pairs",
    Some("""
      WITH d AS (
        SELECT doc_id,
               len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS n_tok
        FROM documents),
      i AS (
        SELECT doc_id, n_tok,
               ROW_NUMBER() OVER (ORDER BY n_tok DESC, doc_id) AS idx,
               COUNT(*) OVER () AS n
        FROM d),
      b AS (SELECT doc_id, n_tok, idx, least(idx, n + 1 - idx) AS bin FROM i),
      a AS (
        SELECT bin, COUNT(*) AS n_docs, SUM(n_tok) AS fill,
               MIN(doc_id) AS id1, MAX(doc_id) AS id2
        FROM b GROUP BY bin),
      pairs AS (
        SELECT 'p' || CAST(bin AS VARCHAR) AS final_bin,
               CAST(n_docs AS BIGINT) AS n_docs,
               CASE WHEN n_docs = 1 THEN CAST(id1 AS VARCHAR)
                    ELSE CAST(id1 AS VARCHAR) || ',' || CAST(id2 AS VARCHAR) END AS doc_ids,
               CAST(fill AS BIGINT) AS fill,
               CAST(greatest(256 - fill, 0) AS BIGINT) AS padding
        FROM a WHERE n_docs = 1 OR fill <= 256),
      splits AS (
        SELECT 's' || CAST(b.idx AS VARCHAR) AS final_bin,
               CAST(1 AS BIGINT) AS n_docs,
               CAST(b.doc_id AS VARCHAR) AS doc_ids,
               CAST(b.n_tok AS BIGINT) AS fill,
               CAST(greatest(256 - b.n_tok, 0) AS BIGINT) AS padding
        FROM b JOIN a USING (bin) WHERE a.n_docs = 2 AND a.fill > 256)
      SELECT * FROM pairs UNION ALL SELECT * FROM splits
      ORDER BY final_bin""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.operators.{Packing, TextOps}
    val withTokens = t(spark, dir).documents
      .select($"doc_id", size(TextOps.tokens($"text")).cast("long").as("n_tok"))
    Packing.pairPack(withTokens, "doc_id", "n_tok", budget = 256)
      .orderBy($"final_bin")
  }

  /** Tiered dedup cascade — the production stack runs CHEAP exact tiers
    * before any near-dup sketch, because each tier shrinks what the next
    * (more expensive) one scans:
    *
    *   1. canonical-URL dedup (no text read at all — recrawls/mirrors);
    *   2. exact normalized-text hash;
    *   3. token-SET signature (word-order- and repetition-insensitive —
    *      catches shuffled boilerplate exact hashing misses).
    *
    * Every tier is a linear hash-groupBy + semi-join keep-list; the
    * output is the attrition report a corpus team reads (per-tier
    * rows_in/survivors/removed + survivor id-sum pinning the exact
    * surviving SET, not just its size). The oracle replays all three
    * tiers, so the hash match proves each tier's decisions and their
    * composition. Near-dup tiers (minhash/simhash) stay separate gated
    * queries — here the contract is the exact cascade.
    */
  val qDedupCascade: GQuery = GQuery(
    "q_pipeline_dedup_cascade",
    Some(s"""
      WITH ${DedupQueries.syntheticUrlSql},
      ${DedupQueries.canonicalizeUrlSql("u")},
      k1 AS (SELECT MIN(doc_id) AS doc_id FROM canon GROUP BY canonical_url),
      s1 AS (SELECT d.doc_id, d.text FROM documents d JOIN k1 USING (doc_id)),
      sig2 AS (SELECT doc_id, text,
                      md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS sig
               FROM s1),
      k2 AS (SELECT MIN(doc_id) AS doc_id FROM sig2 GROUP BY sig),
      s2 AS (SELECT s.doc_id, s.text FROM sig2 s JOIN k2 USING (doc_id)),
      sig3 AS (SELECT doc_id,
                      md5(array_to_string(list_sort(list_distinct(
                        string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))), ' ')) AS sig
               FROM s2),
      k3 AS (SELECT MIN(doc_id) AS doc_id FROM sig3 GROUP BY sig),
      n0 AS (SELECT COUNT(*) AS n FROM documents),
      a1 AS (SELECT COUNT(*) AS n, SUM(doc_id) AS s FROM s1),
      a2 AS (SELECT COUNT(*) AS n, SUM(doc_id) AS s FROM s2),
      a3 AS (SELECT COUNT(*) AS n, SUM(doc_id) AS s FROM k3)
      SELECT CAST(1 AS BIGINT) AS tier, 'url_canonical' AS tier_name,
             CAST(n0.n AS BIGINT) AS rows_in, CAST(a1.n AS BIGINT) AS survivors,
             CAST(n0.n - a1.n AS BIGINT) AS removed, CAST(a1.s AS BIGINT) AS survivor_id_sum
      FROM n0, a1
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'exact_text', CAST(a1.n AS BIGINT), CAST(a2.n AS BIGINT),
             CAST(a1.n - a2.n AS BIGINT), CAST(a2.s AS BIGINT)
      FROM a1, a2
      UNION ALL
      SELECT CAST(3 AS BIGINT), 'token_set', CAST(a2.n AS BIGINT), CAST(a3.n AS BIGINT),
             CAST(a2.n - a3.n AS BIGINT), CAST(a3.s AS BIGINT)
      FROM a2, a3
      ORDER BY tier""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.operators.TextOps
    val docs = t(spark, dir).documents
    val canon = docs.select(
      $"doc_id", $"text",
      TextOps.canonicalizeUrl(DedupQueries.syntheticUrl).as("cu"))
    val k1 = canon.groupBy($"cu").agg(min($"doc_id").as("doc_id")).select($"doc_id")
    val s1 = canon.join(k1, Seq("doc_id"), "left_semi").select($"doc_id", $"text")
    val sig2 = s1.select(
      $"doc_id", $"text",
      md5(trim(regexp_replace(lower($"text"), "\\s+", " "))).as("sig"))
    val k2 = sig2.groupBy($"sig").agg(min($"doc_id").as("doc_id")).select($"doc_id")
    val s2 = sig2.join(k2, Seq("doc_id"), "left_semi").select($"doc_id", $"text")
    val sig3 = s2.select(
      $"doc_id",
      md5(array_join(array_sort(array_distinct(TextOps.tokens($"text"))), " ")).as("sig"))
    val k3 = sig3.groupBy($"sig").agg(min($"doc_id").as("doc_id")).select($"doc_id")

    val n0 = docs.agg(count(lit(1)).as("n0"))
    val a1 = s1.agg(count(lit(1)).as("n1"), sum($"doc_id").as("sum1"))
    val a2 = s2.agg(count(lit(1)).as("n2"), sum($"doc_id").as("sum2"))
    val a3 = k3.agg(count(lit(1)).as("n3"), sum($"doc_id").as("sum3"))
    val one =
      n0.crossJoin(broadcast(a1)).crossJoin(broadcast(a2)).crossJoin(broadcast(a3))
    one.select(
        lit(1L).as("tier"), lit("url_canonical").as("tier_name"),
        $"n0".as("rows_in"), $"n1".as("survivors"),
        ($"n0" - $"n1").as("removed"), $"sum1".as("survivor_id_sum"))
      .union(one.select(
        lit(2L), lit("exact_text"), $"n1", $"n2", $"n1" - $"n2", $"sum2"))
      .union(one.select(
        lit(3L), lit("token_set"), $"n2", $"n3", $"n2" - $"n3", $"sum3"))
      .orderBy($"tier")
  }

  /** Fixed-size uniform sample per source
    * ([[graft.operators.Sampling.reservoirPerGroup]], k = 10): the
    * distributed, order-free equivalent of reservoir sampling — keep the
    * k smallest md5-priority rows per group. Deterministic and portable,
    * so the oracle replays the exact draw, rank included.
    */
  val qReservoir: GQuery = GQuery(
    "q_sample_reservoir",
    Some("""
      SELECT doc_id, source, sample_rank FROM (
        SELECT doc_id, source,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY source
                 ORDER BY md5(doc_id::VARCHAR || ':29'), doc_id) AS BIGINT) AS sample_rank
        FROM documents)
      WHERE sample_rank <= 10
      ORDER BY source, sample_rank""")
  ) { (spark, dir) =>
    import spark.implicits._
    graft.operators.Sampling
      .reservoirPerGroup(t(spark, dir).documents, groupCol = "source",
        keyCol = "doc_id", k = 10, seed = 29)
      .select($"doc_id", $"source", $"sample_rank")
      .orderBy($"source", $"sample_rank")
  }

  /** DSIR importance resampling ([[graft.operators.TextOps.dsirLogWeights]],
    * target = English docs, 64 hashed-unigram bins, then keep the top 25%
    * by weight): the importance-resampling data-selection recipe of Xie
    * et al. 2023. The oracle replays the ENTIRE pipeline — md5 bucket
    * assignment, smoothed bin distributions, per-token log-ratio, the
    * DECIMAL-pinned per-doc sum, and the final rank/keep decision — so
    * the hash match proves the weights AND the selection. Ranking ties
    * break on doc_id; the keep threshold is ceil(0.25·n).
    */
  val qDsir: GQuery = GQuery(
    "q_sample_dsir",
    Some("""
      WITH tok AS (
        SELECT doc_id, lang = 'en' AS tgt, tk
        FROM (SELECT doc_id, lang,
                     unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tk
              FROM documents)
        WHERE length(tk) > 0),
      tb AS (
        SELECT doc_id, tgt,
               ('0x' || substr(md5(tk || ':41'), 1, 8))::BIGINT % 64 AS bucket
        FROM tok),
      cnts AS (
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS cr,
               CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct
        FROM tb GROUP BY bucket),
      tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS tr, CAST(SUM(ct) AS BIGINT) AS tt FROM cnts),
      llr AS (
        SELECT bucket,
               ln(CAST(ct + 1 AS DOUBLE) / CAST(tt + 64 AS DOUBLE))
             - ln(CAST(cr + 1 AS DOUBLE) / CAST(tr + 64 AS DOUBLE)) AS llr
        FROM cnts, tot),
      w AS (
        SELECT tb.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_toks,
               CAST(SUM(CAST(llr.llr AS DECIMAL(38,6))) AS DOUBLE) AS log_weight
        FROM tb JOIN llr USING (bucket)
        GROUP BY tb.doc_id),
      r AS (
        SELECT doc_id, n_toks, round(log_weight, 6) AS log_weight,
               CAST(ROW_NUMBER() OVER (ORDER BY round(log_weight, 6) DESC, doc_id) AS BIGINT) AS sel_rank,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM w)
      SELECT doc_id, n_toks, log_weight, sel_rank,
             sel_rank <= CAST(ceil(0.25 * CAST(n AS DOUBLE)) AS BIGINT) AS selected
      FROM r ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val w = graft.operators.TextOps
      .dsirLogWeights(t(spark, dir).documents, idCol = "doc_id", textCol = "text",
        isTarget = $"lang" === "en", buckets = 64, seed = 41)
      .withColumn("log_weight", round($"log_weight", 6))
      // materialize ONCE: the full-corpus weight pass (explode + two
      // shuffles) otherwise re-evaluates for the scalar count below AND
      // inside globalIndexBy's zipWithIndex count job
      .ckptLazy()
    // Global weight ranking via the distributed total-order rank
    // (range-partition + per-partition sort + zipWithIndex) — the weight
    // table grows with doc count (~10^9 at target scale), so a
    // single-partition row_number window is not acceptable here.
    val ranked = graft.operators.Sampling
      .globalIndexBy(w, Seq($"log_weight".desc, $"doc_id"))
      .withColumn("sel_rank", $"global_idx".cast("long"))
      .drop("global_idx")
    // total doc count as a broadcast 1-row join, not a global window
    // (counted off the pre-rank table so the zipWithIndex lineage isn't
    // re-evaluated for a scalar)
    val n = w.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(n))
      .select($"doc_id", $"n_toks", $"log_weight", $"sel_rank",
        ($"sel_rank" <= ceil(lit(0.25) * $"n".cast("double")).cast("long")).as("selected"))
      .orderBy($"doc_id")
  }

  /** Split-leakage audit at CHUNK granularity: validation documents
    * sharing content-defined chunks with the training split — the
    * evaluation-integrity check every split must pass before metrics on
    * `val` mean anything. Exact-duplicate leakage is the degenerate
    * case (a full-dup val doc shares ALL its chunks); the CDC tier also
    * catches the partial copies whole-doc hashing misses
    * (q_pipeline_contamination covers the n-gram tier from the test
    * side). Split assignment is the portable md5 gate
    * ([[graft.operators.Sampling.splitAssign]]); the val→train chunk
    * check is a LEFT-SEMI join against the DISTINCT train chunk-hash
    * set — an existence probe, so a boilerplate chunk in ten thousand
    * train docs matches each val chunk ONCE (no pair enumeration, no
    * df-cap needed). One row: sizes, touched (≥ 1 shared chunk) and
    * leaked (≥ 2) val docs, leak rate.
    */
  val qSplitLeakage: GQuery = GQuery(
    "q_pipeline_split_leakage",
    Some("""
      WITH d AS (
        SELECT doc_id, text, length(text) AS n,
               list_transform(generate_series(1, length(text)),
                              i -> ord(substr(text, i, 1))) AS cp
        FROM documents),
      pw AS (
        SELECT [1, 257, 66049, 16974593, 67503107, 168429323, 336663071, 623063367,
                1213495441, 483199522, 1775709275, 1090750511, 1150007217, 1346595130,
                330081243, 1079017218] AS p),
      bounds AS (
        SELECT doc_id, i
        FROM d, pw, LATERAL (SELECT unnest(generate_series(16, n)) AS i) g
        WHERE i < n
          AND (list_sum(list_transform(generate_series(0, 15),
                 k -> CAST(cp[i - k] AS BIGINT) * p[k + 1])) % 2147483647) % 64 = 0),
      starts AS (
        SELECT d.doc_id, d.text, d.n,
               [1] || COALESCE(list_sort(list(b.i + 1) FILTER (b.i IS NOT NULL)), []) AS s
        FROM d LEFT JOIN bounds b USING (doc_id)
        GROUP BY d.doc_id, d.text, d.n),
      chunks AS (
        SELECT DISTINCT doc_id,
               md5(substr(text, st, COALESCE(s[pos + 1], n + 1) - st)) AS h
        FROM (SELECT doc_id, text, n, s,
                     unnest(s) AS st,
                     unnest(generate_series(1, len(s))) AS pos
              FROM starts)),
      sp AS (
        SELECT doc_id,
               CASE WHEN substr(md5(doc_id::VARCHAR || ':13'), 1, 4) < 'e666' THEN 'train'
                    ELSE 'val' END AS split
        FROM documents),
      ch AS (SELECT c.doc_id, c.h, sp.split FROM chunks c JOIN sp USING (doc_id)),
      trainh AS (SELECT DISTINCT h FROM ch WHERE split = 'train'),
      valleak AS (
        SELECT v.doc_id, CAST(COUNT(*) AS BIGINT) AS shared
        FROM ch v JOIN trainh t USING (h)
        WHERE v.split = 'val'
        GROUP BY v.doc_id)
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sp WHERE split = 'train') AS n_train,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM sp WHERE split = 'val') AS n_val,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM valleak WHERE shared >= 1) AS n_val_touched,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM valleak WHERE shared >= 2) AS n_val_leaked,
             round(CAST((SELECT COUNT(*) FROM valleak WHERE shared >= 2) AS DOUBLE)
                   / CAST((SELECT COUNT(*) FROM sp WHERE split = 'val') AS DOUBLE), 6) AS leak_rate""")
  ) { (spark, dir) =>
    import spark.implicits._
    val chunks = t(spark, dir).documents
      .select($"doc_id", $"text",
        graft.functions.GraftFunctions.cdcChunkStarts($"text").as("s"))
      .select($"doc_id",
        explode(
          zip_with(
            $"s",
            concat(slice($"s", lit(2), greatest(size($"s") - 1, lit(0))),
              array(length($"text") + 1)),
            (st, en) => $"text".substr(st, en - st))).as("c"))
      .select($"doc_id", md5($"c").as("h"))
      .distinct()
    val sp = graft.operators.Sampling
      .splitAssign(
        t(spark, dir).documents.select($"doc_id"),
        keyCol = "doc_id",
        splits = Seq("train" -> 0.9, "val" -> 0.1),
        seed = 13)
      .ckptLazy() // feeds the size tallies AND the chunk join
    val ch = chunks.join(sp, "doc_id").ckptLazy()
    val trainH = ch.filter($"split" === "train").select($"h").distinct()
    val valleak = ch.filter($"split" === "val")
      .join(trainH, Seq("h"), "left_semi")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("shared"))
    val sizes = sp.groupBy().agg(
      sum(when($"split" === "train", 1L).otherwise(0L)).as("n_train"),
      sum(when($"split" === "val", 1L).otherwise(0L)).as("n_val"))
    val leaks = valleak.groupBy().agg(
      sum(when($"shared" >= 1, 1L).otherwise(0L)).as("n_val_touched"),
      sum(when($"shared" >= 2, 1L).otherwise(0L)).as("n_val_leaked"))
    sizes.crossJoin(leaks)
      .select($"n_train", $"n_val", $"n_val_touched", $"n_val_leaked",
        round($"n_val_leaked".cast("double") / $"n_val".cast("double"), 6).as("leak_rate"))
  }

  /** Weighted k-per-group sampling without replacement
    * ([[graft.operators.Sampling.weightedReservoirPerGroup]] —
    * Efraimidis–Spirakis A-ES): 5 docs per language drawn with
    * probability ∝ length, the draw a mixture builder uses when "sample
    * by quality weight within each domain" must be reproducible across
    * engines and retries. The md5 uniform, the ln(u)/w priority, the
    * (priority DESC, doc_id) rank, and the k-cut all replay in the
    * oracle — the SAMPLE MEMBERSHIP itself is hash-checked, not just
    * its size.
    */
  val qWeightedReservoir: GQuery = GQuery(
    "q_sample_weighted_reservoir",
    Some("""
      WITH u AS (
        SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS w,
               (('0x' || substr(md5(doc_id::VARCHAR || ':23'), 1, 4))::BIGINT + 1.0)
                 / 65536.0 AS u
        FROM documents WHERE n_chars > 0),
      p AS (
        -- rank on the ROUNDED priority (engine does the same): ln() is
        -- not guaranteed correctly rounded on either side, and a 1-ulp
        -- spread near a near-tie must not flip the cross-engine rank
        SELECT lang, doc_id, w, round(ln(u) / CAST(w AS DOUBLE), 9) AS prio,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY round(ln(u) / CAST(w AS DOUBLE), 9) DESC, doc_id) AS rk
        FROM u)
      SELECT lang, doc_id, w, prio AS priority, CAST(rk AS BIGINT) AS sample_rank
      FROM p WHERE rk <= 5
      ORDER BY lang, sample_rank""")
  ) { (spark, dir) =>
    import spark.implicits._
    graft.operators.Sampling
      .weightedReservoirPerGroup(
        t(spark, dir).documents.select($"lang", $"doc_id", $"n_chars".cast("long").as("w")),
        groupCol = "lang", keyCol = "doc_id", weightCol = "w", k = 5, seed = 23)
      .select($"lang", $"doc_id", $"w", round($"priority", 9).as("priority"), $"sample_rank")
      .orderBy($"lang", $"sample_rank")
  }

  /** Curriculum training manifest: docs staged easy→hard by a row-local
    * difficulty signal (mean token length, the rater-threshold terciles),
    * deterministically RESHUFFLED within each stage per epoch (md5 over
    * doc_id:epoch) — the dataloader contract for curriculum learning at
    * corpus scale: difficulty order is stable across runs, within-stage
    * order differs across epochs, and every position is reproducible
    * from (doc_id, epoch) alone, so a crashed epoch resumes exactly.
    *
    * Scale shape: the difficulty signal and the shuffle draw are
    * row-local; the only distributed structure is the total-order
    * position ([[graft.operators.Sampling.globalIndexBy]] over
    * (epoch, stage, draw, doc_id) — never a global window).
    */
  val qCurriculum: GQuery = GQuery(
    "q_pipeline_curriculum",
    Some("""
      WITH tk AS (
        SELECT doc_id,
               list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                           t -> length(t) > 0) AS ts
        FROM documents),
      sig AS (
        SELECT doc_id,
               CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE)
                 / CAST(len(ts) AS DOUBLE) AS atl
        FROM tk WHERE len(ts) > 0),
      st AS (
        SELECT doc_id,
               CASE WHEN atl < 4.4 THEN 0 WHEN atl < 4.6 THEN 1 ELSE 2 END AS stage
        FROM sig),
      ep AS (
        SELECT s.doc_id, CAST(e.epoch AS BIGINT) AS epoch, CAST(s.stage AS BIGINT) AS stage,
               substr(md5(CAST(s.doc_id AS VARCHAR) || ':' || CAST(e.epoch AS VARCHAR) || ':23'),
                      1, 8) AS draw
        FROM st s, (SELECT unnest([1, 2]) AS epoch) e)
      SELECT epoch, doc_id, stage, draw,
             ROW_NUMBER() OVER (ORDER BY epoch, stage, draw, doc_id) AS ord
      FROM ep
      ORDER BY ord""")
  ) { (spark, dir) =>
    import spark.implicits._
    val toks = filter(graft.operators.TextOps.tokens($"text"), x => length(x) > 0)
    val st = t(spark, dir).documents
      .select($"doc_id", toks.as("ts"))
      .filter(size($"ts") > 0)
      .select($"doc_id",
        (aggregate($"ts", lit(0), (a, x) => a + length(x)).cast("double")
          / size($"ts").cast("double")).as("atl"))
      .select($"doc_id",
        when($"atl" < 4.4, 0L).when($"atl" < 4.6, 1L).otherwise(2L).as("stage"))
    val ep = st
      .select($"doc_id", $"stage", explode(array(lit(1L), lit(2L))).as("epoch"))
      .select($"doc_id", $"epoch", $"stage",
        substring(md5(concat($"doc_id".cast("string"), lit(":"),
          $"epoch".cast("string"), lit(":23"))), 1, 8).as("draw"))
    graft.operators.Sampling
      .globalIndexBy(ep, Seq($"epoch", $"stage", $"draw", $"doc_id"))
      .select($"epoch", $"doc_id", $"stage", $"draw", $"global_idx".as("ord"))
      .orderBy($"ord")
  }

  /** Group-aware 5-fold cross-validation assignment (GroupKFold):
    * folds are keyed by md5(source), so every document of a source lands
    * in ONE fold — the leakage-proof split for correlated items (same
    * crawl host, same author) that [[qSplit]]'s per-row hash split
    * cannot give. Emits the per-fold census plus an explicit
    * zero-leakage witness: the count of sources spanning >1 fold, which
    * is 0 by construction and recomputed (not assumed) on both engines.
    *
    * Portable fold function: first 8 md5 hex digits as an integer,
    * mod k (the established md5-gate family). Scale shape: fold
    * assignment is row-local; the census is one groupBy; the witness
    * aggregates the (source, fold) distinct pairs — O(sources).
    */
  val qGroupKfold: GQuery = GQuery(
    "q_sample_group_kfold",
    Some("""
      WITH a AS (
        SELECT doc_id, source,
               CAST(('0x' || substr(md5('gkf:' || source), 1, 8))::UBIGINT % 5 AS BIGINT) AS fold
        FROM documents),
      sf AS (SELECT DISTINCT source, fold FROM a),
      leak AS (
        SELECT CAST(COALESCE(SUM(CASE WHEN nf > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_leaky_sources
        FROM (SELECT source, COUNT(*) AS nf FROM sf GROUP BY 1))
      SELECT a.fold,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT a.source) AS BIGINT) AS n_sources,
             leak.n_leaky_sources
      FROM a, leak
      GROUP BY a.fold, leak.n_leaky_sources
      ORDER BY a.fold""")
  ) { (spark, dir) =>
    import spark.implicits._
    val a = t(spark, dir).documents
      .select($"doc_id", $"source",
        (conv(substring(md5(concat(lit("gkf:"), $"source")), 1, 8), 16, 10)
          .cast("long") % 5).as("fold"))
    val leak = a.select($"source", $"fold").distinct()
      .groupBy($"source").agg(count(lit(1)).as("nf"))
      .agg(coalesce(sum(when($"nf" > 1, 1L).otherwise(0L)), lit(0L))
        .as("n_leaky_sources"))
    a.groupBy($"fold")
      .agg(count(lit(1)).as("n_docs"), countDistinct($"source").as("n_sources"))
      .crossJoin(broadcast(leak))
      .orderBy($"fold")
  }

  /** Dataset card manifest — the one-page provenance summary
    * (HuggingFace dataset-card / Datasheets-for-Datasets tier) a
    * training-data release ships: corpus counts, token/char mass,
    * vocabulary facets, duplication and length statistics, each as an
    * exact BIGINT metric row. One corpus scan feeds everything; the
    * dedup rate rides the same normalized-text fingerprint as
    * q_dedup_exact, so the card's numbers are consistent with the
    * pipeline's own gates. All-integer output: exact on any engine.
    */
  val qDatasetCard: GQuery = GQuery(
    "q_pipeline_dataset_card",
    Some("""
      WITH d AS (
        SELECT doc_id, lang, source,
               md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
               len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS n_tokens,
               strlen(text) AS n_chars
        FROM documents)
      SELECT metric, value FROM (
        SELECT 'n_docs' AS metric, CAST(COUNT(*) AS BIGINT) AS value FROM d
        UNION ALL SELECT 'total_tokens', CAST(SUM(n_tokens) AS BIGINT) FROM d
        UNION ALL SELECT 'total_chars', CAST(SUM(n_chars) AS BIGINT) FROM d
        UNION ALL SELECT 'n_langs', CAST(COUNT(DISTINCT lang) AS BIGINT) FROM d
        UNION ALL SELECT 'n_sources', CAST(COUNT(DISTINCT source) AS BIGINT) FROM d
        UNION ALL SELECT 'n_distinct_texts', CAST(COUNT(DISTINCT fp) AS BIGINT) FROM d
        UNION ALL SELECT 'n_exact_dup_docs',
          CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) FROM d
        UNION ALL SELECT 'max_doc_tokens', CAST(MAX(n_tokens) AS BIGINT) FROM d
        UNION ALL SELECT 'min_doc_tokens', CAST(MIN(n_tokens) AS BIGINT) FROM d)
      ORDER BY metric""")
  ) { (spark, dir) =>
    import spark.implicits._
    val d = t(spark, dir).documents
      .select($"doc_id", $"lang", $"source",
        md5(graft.operators.TextOps.normText($"text")).as("fp"),
        size(graft.operators.TextOps.tokens($"text")).cast("long").as("n_tokens"),
        octet_length($"text").cast("long").as("n_chars"))
      .ckptLazy() // nine metric legs share one scan
    def m(name: String, v: org.apache.spark.sql.Column) =
      d.agg(v.as("value")).select(lit(name).as("metric"), $"value")
    m("n_docs", count(lit(1)))
      .unionAll(m("total_tokens", sum($"n_tokens")))
      .unionAll(m("total_chars", sum($"n_chars")))
      .unionAll(m("n_langs", countDistinct($"lang")))
      .unionAll(m("n_sources", countDistinct($"source")))
      .unionAll(m("n_distinct_texts", countDistinct($"fp")))
      .unionAll(m("n_exact_dup_docs", count(lit(1)) - countDistinct($"fp")))
      .unionAll(m("max_doc_tokens", max($"n_tokens")))
      .unionAll(m("min_doc_tokens", min($"n_tokens")))
      .orderBy($"metric")
  }

  override def queries: Seq[GQuery] = Seq(
    qCorpusPrep, qSample, qSplit, qContamination, qPack, qDomainCap, qShuffle,
    qWeighted, qMix, qTemperature, qNegativePairs, qGlobalIndex, qPackPairs,
    qDedupCascade, qReservoir, qDsir, qSplitLeakage, qWeightedReservoir, qTokenBudget, qNeyman,
    qAttrition, qReservoirMerge, qCurriculum, qGroupKfold, qDatasetCard)
}
