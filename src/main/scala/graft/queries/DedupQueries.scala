package graft.queries

import graft.engine.PlanOnly.syntax._

import org.apache.spark.sql.functions._

import Common._
import graft.operators.{Dedup, Similarity}

/** Deduplication inventory (SURVEY.md §2.6 LLM-pipeline row): exact,
  * MinHash-LSH, SimHash, exact n-gram Jaccard, embedding-cosine near-dup.
  * Exact/Jaccard/embedding variants have direct DuckDB oracles; MinHash-LSH
  * is oracle-gated against the exact Jaccard PAIR SET (its banding recovers
  * every exact pair of this corpus); SimHash runs on portable md5 token
  * hashes so the sketch replays in SQL and its exact-recall blocking is
  * oracle-proven; sign-LSH embedding pairs run the portable integer-LSH
  * variant whose oracle replays the full sub-1-recall pipeline — see
  * SURVEY §2.7. Float/xxhash production defaults stay spec-gated.
  */
object DedupQueries extends QuerySet {

  /** Exact dedup decision table. */
  val qExact: GQuery = GQuery(
    "q_dedup_exact",
    Some("""
      SELECT content_hash, keep_id, n_copies FROM (
        SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash,
               min(doc_id) AS keep_id, COUNT(*) AS n_copies
        FROM documents GROUP BY 1)
      ORDER BY content_hash""")
  ) { (spark, dir) =>
    import spark.implicits._
    Dedup.exact(t(spark, dir).documents, "doc_id", "text").orderBy($"content_hash")
  }

  /** Incremental ingest dedup ([[Dedup.incrementalNew]]): even-id docs act
    * as the accepted corpus index, odd-id docs as the new batch; a batch
    * doc survives only if its normalized content hash is unseen in the
    * corpus AND it is the first occurrence within the batch.
    */
  val qIncremental: GQuery = GQuery(
    "q_dedup_incremental",
    Some("""
      WITH h AS (
        SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash
        FROM documents),
      existing AS (SELECT DISTINCT content_hash FROM h WHERE doc_id % 2 = 0),
      incoming AS (
        SELECT content_hash, min(doc_id) AS keep_id
        FROM h WHERE doc_id % 2 = 1 GROUP BY 1)
      SELECT i.content_hash, i.keep_id
      FROM incoming i LEFT JOIN existing e USING (content_hash)
      WHERE e.content_hash IS NULL
      ORDER BY i.content_hash""")
  ) { (spark, dir) =>
    import spark.implicits._
    val docs = t(spark, dir).documents
    Dedup
      .incrementalNew(
        existing = docs.filter($"doc_id" % 2 === 0),
        incoming = docs.filter($"doc_id" % 2 === 1),
        "doc_id",
        "text")
      .orderBy($"content_hash")
  }

  /** Incremental FUZZY ingest gate ([[Dedup.minhashIncrementalNew]]):
    * even-id docs are the accepted corpus (its persisted signature
    * index), odd-id docs the new batch; a batch doc survives only with
    * no near-dup (Jaccard ≥ 0.5) in the corpus and none at a smaller id
    * within its own batch. Oracle = the same decision replayed over the
    * EXACT capped-Jaccard pair relation (which the 16×4 banding fully
    * recovers on this corpus — same regime as q_dedup_minhash_lsh).
    */
  val qIncrementalFuzzy: GQuery = GQuery(
    "q_dedup_incremental_fuzzy",
    Some("""
      WITH t AS (SELECT doc_id,
                        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
                 FROM documents),
      sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
             FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i) g
             WHERE len(ts) >= 3
             UNION
             SELECT doc_id, array_to_string(ts, ' ') AS s FROM t WHERE len(ts) < 3),
      shf AS (SELECT * FROM sh WHERE s NOT IN (
                SELECT s FROM sh GROUP BY s
                HAVING COUNT(*) > (SELECT CAST(ceil(0.1 * COUNT(*)) AS BIGINT) FROM documents))),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY 1),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
            FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
      jp AS (SELECT id_a, id_b FROM p
             JOIN sz sa ON sa.doc_id = id_a
             JOIN sz sb ON sb.doc_id = id_b
             WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5)
      SELECT CAST(d.doc_id AS BIGINT) AS keep_id FROM documents d
      WHERE d.doc_id % 2 = 1
        AND NOT EXISTS (SELECT 1 FROM jp
                        WHERE (jp.id_a = d.doc_id AND jp.id_b % 2 = 0)
                           OR (jp.id_b = d.doc_id AND jp.id_a % 2 = 0))
        AND NOT EXISTS (SELECT 1 FROM jp
                        WHERE jp.id_b = d.doc_id AND jp.id_a % 2 = 1)
      ORDER BY keep_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val docs = t(spark, dir).documents
    Dedup
      .minhashIncrementalNew(
        existing = docs.filter($"doc_id" % 2 === 0),
        incoming = docs.filter($"doc_id" % 2 === 1),
        "doc_id", "text",
        shingleN = 3, k = 64, bands = 16, threshold = 0.5)
      .orderBy($"keep_id")
  }

  /** Edit-distance-1 fuzzy key matching ([[Dedup.editDistancePairs]],
    * FastSS deletion-neighborhood blocking) over customer names; the
    * oracle brute-forces all O(n²) pairs with DuckDB's levenshtein, so
    * this proves the blocked candidate generator loses NOTHING.
    */
  val qFuzzyKey: GQuery = GQuery(
    "q_dedup_fuzzy_key",
    Some("""
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
      FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1
      ORDER BY id_a, id_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    Dedup
      .editDistancePairs(t(spark, dir).customer, "c_custkey", "c_name", maxKeyFreq = 10000)
      .orderBy($"id_a", $"id_b")
  }

  /** Prefix-filtering exact Jaccard join ([[Dedup.prefixFilterPairs]] —
    * AllPairs/PPJoin blocking). The oracle is the UNCAPPED exact 3-gram
    * Jaccard ≥ 0.5 pair relation (same normalization and short-doc
    * fallback as q_dedup_ngram_jaccard, no df-cap stage): prefix
    * filtering has recall 1 by construction, so the hash match proves the
    * rarity-ranked prefix index loses NOTHING — the lossless counterpart
    * to the df-cap's answer-changing truncation.
    */
  val qPrefixFilter: GQuery = GQuery(
    "q_dedup_prefix_filter",
    Some("""
      WITH t AS (SELECT doc_id,
                        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
                 FROM documents),
      sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
             FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i) g
             WHERE len(ts) >= 3
             UNION
             SELECT doc_id, array_to_string(ts, ' ') AS s FROM t WHERE len(ts) < 3),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT id_a, id_b,
             c * 1.0 / (sa.n + sb.n - c) AS jaccard
      FROM pairs
      JOIN sz sa ON sa.doc_id = id_a
      JOIN sz sb ON sb.doc_id = id_b
      WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
      ORDER BY id_a, id_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    Dedup
      .prefixFilterPairs(t(spark, dir).documents, "doc_id", "text", shingleN = 3, threshold = 0.5)
      .orderBy($"id_a", $"id_b")
  }

  /** Exact 3-gram Jaccard near-dup pairs (inverted-index join).
    *
    * The oracle mirrors the Spark side exactly: same normalization (lower,
    * collapse whitespace, trim), same whole-text fallback for docs shorter
    * than n tokens, and the SAME hot-shingle document-frequency cap — the
    * cap is ON here (10% of the corpus) because an uncapped boilerplate
    * shingle makes the pair join quadratic at scale.
    */
  val qJaccard: GQuery = GQuery(
    "q_dedup_ngram_jaccard",
    Some("""
      WITH t AS (SELECT doc_id,
                        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
                 FROM documents),
      sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
             FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i) g
             WHERE len(ts) >= 3
             UNION
             SELECT doc_id, array_to_string(ts, ' ') AS s FROM t WHERE len(ts) < 3),
      shf AS (SELECT * FROM sh WHERE s NOT IN (
                SELECT s FROM sh GROUP BY s
                HAVING COUNT(*) > (SELECT CAST(ceil(0.1 * COUNT(*)) AS BIGINT) FROM documents))),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY 1),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
                FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT id_a, id_b,
             c * 1.0 / (sa.n + sb.n - c) AS jaccard
      FROM pairs
      JOIN sz sa ON sa.doc_id = id_a
      JOIN sz sb ON sb.doc_id = id_b
      WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
      ORDER BY id_a, id_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    val docs = t(spark, dir).documents
    // 10%-of-corpus df cap; one cheap count action sizes it (at 100 TB this
    // is a metadata-level aggregate, not a data pass worth avoiding).
    val cap = math.ceil(0.1 * docs.count()).toLong
    Dedup
      .jaccardPairs(docs, "doc_id", "text", shingleN = 3, threshold = 0.5, maxDocFreq = cap)
      .orderBy($"id_a", $"id_b")
  }

  /** Exact shingle-containment pairs ([[Dedup.containmentPairs]], same
    * inverted index + df-cap as q_dedup_ngram_jaccard): c / min(|A|,|B|)
    * ≥ 0.5 — the asymmetric excerpt/quote-inclusion detector whole-doc
    * Jaccard structurally misses (a short doc embedded in a long one has
    * tiny Jaccard but containment ≈ 1). Every pair and score
    * hash-checked against the full SQL replay.
    */
  val qContainment: GQuery = GQuery(
    "q_dedup_containment",
    Some("""
      WITH t AS (SELECT doc_id,
                        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
                 FROM documents),
      sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
             FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i) g
             WHERE len(ts) >= 3
             UNION
             SELECT doc_id, array_to_string(ts, ' ') AS s FROM t WHERE len(ts) < 3),
      shf AS (SELECT * FROM sh WHERE s NOT IN (
                SELECT s FROM sh GROUP BY s
                HAVING COUNT(*) > (SELECT CAST(ceil(0.1 * COUNT(*)) AS BIGINT) FROM documents))),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY 1),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
                FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT id_a, id_b,
             CAST(c AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE) AS containment
      FROM pairs
      JOIN sz sa ON sa.doc_id = id_a
      JOIN sz sb ON sb.doc_id = id_b
      WHERE CAST(c AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE) >= 0.5
      ORDER BY id_a, id_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    val docs = t(spark, dir).documents
    val cap  = math.ceil(0.1 * docs.count()).toLong
    Dedup
      .containmentPairs(docs, "doc_id", "text", shingleN = 3, threshold = 0.5, maxDocFreq = cap)
      .orderBy($"id_a", $"id_b")
  }

  /** MinHash + LSH banding (64 hashes, 16 bands × 4). Oracle = the EXACT
    * 3-gram Jaccard ≥ 0.5 pair set (same shingling/normalization/df-cap
    * as q_dedup_ngram_jaccard): at 16 bands × 4 rows the banding's
    * collision probability at t=0.5 is high enough that the LSH path
    * recovers every exact pair of this corpus, so the recovered pair SET
    * must equal the exact one — a lost band, broken signature, or
    * shingling drift hash-mismatches. The estimate column is excluded
    * (engine-specific minhash values); DedupSpec asserts its accuracy
    * and the weaker general-regime recall bound.
    */
  val qMinhash: GQuery = GQuery(
    "q_dedup_minhash_lsh",
    Some("""
      WITH t AS (SELECT doc_id,
                        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
                 FROM documents),
      sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
             FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i) g
             WHERE len(ts) >= 3
             UNION
             SELECT doc_id, array_to_string(ts, ' ') AS s FROM t WHERE len(ts) < 3),
      shf AS (SELECT * FROM sh WHERE s NOT IN (
                SELECT s FROM sh GROUP BY s
                HAVING COUNT(*) > (SELECT CAST(ceil(0.1 * COUNT(*)) AS BIGINT) FROM documents))),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY 1),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
                FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT id_a, id_b
      FROM pairs
      JOIN sz sa ON sa.doc_id = id_a
      JOIN sz sb ON sb.doc_id = id_b
      WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
      ORDER BY id_a, id_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    Dedup
      .minhashPairs(
        t(spark, dir).documents, "doc_id", "text",
        shingleN = 3, k = 64, bands = 16, threshold = 0.5
      )
      .select($"id_a", $"id_b")
      .orderBy($"id_a", $"id_b")
  }

  /** SimHash near-dup pairs (hamming ≤ 3 over 64-bit signatures), run on
    * PORTABLE md5-derived token hashes (first 8 md5 bytes as a long) so
    * the full pipeline — tokenize → hash → 64 bit-votes → pack → blocked
    * join → hamming verify — is exactly reproducible in DuckDB. Manku
    * combination blocking has recall 1 within the hamming bound, so the
    * oracle's brute-force `bit_count(xor(sig_a, sig_b)) <= 3` over all
    * pairs must EQUAL our banded plan's output: the hash match proves the
    * blocking scheme loses nothing, not just that the sketch agrees.
    * (Production default [[Dedup.simhashPairs]] stays on xxhash64 —
    * ~3× cheaper per token; DedupSpec gates that path's recall.)
    */
  val qSimhash: GQuery = GQuery(
    "q_dedup_simhash",
    Some("""
      WITH tk AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
        FROM documents),
      tok AS (
        SELECT doc_id, unnest(CASE WHEN len(toks) = 0 THEN [''] ELSE toks END) AS t
        FROM tk),
      th AS (
        SELECT doc_id, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS h FROM tok),
      bitsum AS (
        SELECT doc_id, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS c
        FROM th CROSS JOIN range(64) r(j)
        GROUP BY 1, 2),
      sig AS (
        SELECT doc_id, string_agg(CASE WHEN c > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS s
        FROM bitsum GROUP BY 1)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(hamming(a.s, b.s) AS INT) AS hamming_dist
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE hamming(a.s, b.s) <= 3
      ORDER BY id_a, id_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    // md5-lower-64 per token: identical bit pattern to the oracle's
    // ('0x'||substr(md5(t),1,16))::UBIGINT (conv(...,16,-10) renders the
    // same 64 bits as a signed decimal; only the bits feed the sketch)
    val hashed = transform(
      filter(split(lower($"text"), "\\s+"), x => x =!= ""),
      tk => conv(substring(md5(tk), 1, 16), 16, -10).cast("long"))
    val emptyHash = conv(substring(md5(lit("")), 1, 16), 16, -10).cast("long")
    val hashes = when(size(hashed) === 0, array(emptyHash)).otherwise(hashed)
    Dedup
      .simhashPairsFromHashes(t(spark, dir).documents, "doc_id", hashes, maxHamming = 3)
      .orderBy($"id_a", $"id_b")
  }

  /** Embedding-cosine near-dup pairs, blocked by label. The oracle
    * recomputes the dot product with an explicit sequential list fold in
    * double precision — same order of operations as Spark's aggregate(),
    * so scores match to the last bit; both sides round to 6dp anyway.
    */
  val qEmbedding: GQuery = GQuery(
    "q_dedup_embedding",
    Some("""
      WITH v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(list_sum(list_transform(generate_series(1, 64),
                            i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm), 6) AS cos_sim
      FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE list_sum(list_transform(generate_series(1, 64),
                     i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm) >= 0.3
      ORDER BY id_a, id_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    Similarity
      .blockedCosinePairs(t(spark, dir).embeddings, "vec_id", "embedding", "label", 0.3)
      .select($"id_a", $"id_b", round($"cos_sim", 6).as("cos_sim"))
      .orderBy($"id_a", $"id_b")
  }

  /** Connected components over the exact-Jaccard near-dup pairs — the
    * closing step of fuzzy dedup (duplicate cluster = component, canonical
    * doc = min id). The oracle computes the same transitive closure with a
    * recursive CTE over the identical pair set.
    */
  val qConnected: GQuery = GQuery(
    "q_dedup_connected",
    Some("""
      WITH RECURSIVE t AS (SELECT doc_id,
                        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
                 FROM documents),
      sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
             FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i) g
             WHERE len(ts) >= 3
             UNION
             SELECT doc_id, array_to_string(ts, ' ') AS s FROM t WHERE len(ts) < 3),
      shf AS (SELECT * FROM sh WHERE s NOT IN (
                SELECT s FROM sh GROUP BY s
                HAVING COUNT(*) > (SELECT CAST(ceil(0.1 * COUNT(*)) AS BIGINT) FROM documents))),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY 1),
      jp AS (SELECT id_a, id_b FROM (
               SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
               FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2) p
             JOIN sz sa ON sa.doc_id = p.id_a
             JOIN sz sb ON sb.doc_id = p.id_b
             WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5),
      edges AS (SELECT id_a AS src, id_b AS dst FROM jp
                UNION SELECT id_b, id_a FROM jp),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
      SELECT src AS doc_id, least(src, MIN(dst)) AS component
      FROM reach
      GROUP BY src
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val docs = t(spark, dir).documents
    val cap = math.ceil(0.1 * docs.count()).toLong
    val pairs = Dedup
      .jaccardPairs(docs, "doc_id", "text", shingleN = 3, threshold = 0.5, maxDocFreq = cap)
      .select($"id_a", $"id_b")
    Dedup
      .connectedComponents(pairs)
      .select($"id".as("doc_id"), $"component")
      .orderBy($"doc_id")
  }

  /** Label-free embedding near-dup via sign-LSH bucket blocking — the
    * scale path when no label/cluster blocking key exists AND duplicates
    * are angularly tight. Runs UNBOUNDED over the corpus: at a 0.3
    * threshold sign-LSH keeps little selectivity (the operator's regime
    * note), so this demonstrates the worst case the blocking must survive —
    * candidate volume is capped only by bucket collisions.
    *
    * Registered on the PORTABLE variant ([[Similarity.lshCosinePairsPortable]]):
    * ±1 md5-seeded hyperplanes over 2^20-quantized integer embeddings make
    * every bucket bit exact integer arithmetic, so the DuckDB oracle
    * replays signature construction, the ≥1-of-16-tables collision test,
    * and the cosine verify bit-for-bit — the hash match covers the FULL
    * sub-1-recall LSH pipeline, not an exact sibling. (Float-plane
    * production default stays gated by SimilaritySpec planted-dup recall.)
    */
  val qEmbeddingLsh: GQuery = GQuery(
    "q_dedup_embedding_lsh",
    Some("""
      WITH qv AS (
        SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS q
        FROM embeddings),
      dots AS (
        SELECT vec_id, t, p,
               list_sum(list_transform(generate_series(1, 64),
                 d -> (CASE WHEN (('0x' || substr(md5(t::VARCHAR || '|' || p::VARCHAR || '|' || (d-1)::VARCHAR), 1, 16))::UBIGINT & 1) = 1
                            THEN 1 ELSE -1 END) * q[d])) AS dot
        FROM qv CROSS JOIN range(16) rt(t) CROSS JOIN range(8) rp(p)),
      sigs AS (
        SELECT vec_id, t, string_agg(CASE WHEN dot > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
        FROM dots GROUP BY 1, 2),
      cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM sigs a JOIN sigs b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
      v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings)
      SELECT c.id_a, c.id_b,
             round(list_sum(list_transform(generate_series(1, 64),
                            i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm), 6) AS cos_sim
      FROM cand c
      JOIN v a ON a.vec_id = c.id_a
      JOIN v b ON b.vec_id = c.id_b
      WHERE list_sum(list_transform(generate_series(1, 64),
                     i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm) >= 0.3
      ORDER BY id_a, id_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    Similarity
      .lshCosinePairsPortable(t(spark, dir).embeddings, "vec_id", "embedding", threshold = 0.3)
      .select($"id_a", $"id_b", round($"cos_sim", 6).as("cos_sim"))
      .orderBy($"id_a", $"id_b")
  }

  /** The TIGHT-threshold regime of [[qEmbeddingLsh]] — the scale path the
    * wide-threshold query's Scaladoc names: at cosine ≥ 0.8 the collision
    * probability of a non-duplicate pair under 16 planes/table drops to
    * ~(1 − θ/π)^16, so buckets are SELECTIVE and the candidate join is
    * near-linear in the corpus — this is how embedding near-dup actually
    * deploys at 100 TB (tight duplicates, many planes, few tables), and
    * ScaleStress measures this variant's exponent on the synthesized
    * decade. The synthetic embeddings carry no natural tight pairs (max
    * corpus cosine ≈ 0.51), so the query PLANTS one deterministic
    * near-twin per vector — first dimension zeroed, cosine ≈ 0.99,
    * vec_id + 1,000,000 — on BOTH sides; dup density stays constant
    * across scale tiers by construction. Same portable integer hash
    * family, same oracle shape: DuckDB replays twin construction, the
    * 8 tables × 16 planes signatures, the collision test, and the cosine
    * verify bit-for-bit (including LSH's sub-1 recall — a twin missed by
    * all 8 tables is missed identically in both engines).
    */
  val qEmbeddingLshTight: GQuery = GQuery(
    "q_dedup_embedding_lsh_tight",
    Some("""
      WITH allv AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000,
               list_transform(embedding,
                 (x, i) -> CASE WHEN i = 1 THEN CAST(0.0 AS REAL) ELSE x END)
        FROM embeddings),
      qv AS (
        SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS q
        FROM allv),
      dots AS (
        SELECT vec_id, t, p,
               list_sum(list_transform(generate_series(1, 64),
                 d -> (CASE WHEN (('0x' || substr(md5(t::VARCHAR || '|' || p::VARCHAR || '|' || (d-1)::VARCHAR), 1, 16))::UBIGINT & 1) = 1
                            THEN 1 ELSE -1 END) * q[d])) AS dot
        FROM qv CROSS JOIN range(8) rt(t) CROSS JOIN range(16) rp(p)),
      sigs AS (
        SELECT vec_id, t, string_agg(CASE WHEN dot > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
        FROM dots GROUP BY 1, 2),
      cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM sigs a JOIN sigs b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
      v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM allv)
      SELECT c.id_a, c.id_b,
             round(list_sum(list_transform(generate_series(1, 64),
                            i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm), 6) AS cos_sim
      FROM cand c
      JOIN v a ON a.vec_id = c.id_a
      JOIN v b ON b.vec_id = c.id_b
      WHERE list_sum(list_transform(generate_series(1, 64),
                     i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm) >= 0.8
      ORDER BY id_a, id_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    val emb = t(spark, dir).embeddings.select($"vec_id", $"embedding")
    val twins = emb.select(
      ($"vec_id" + 1000000L).as("vec_id"),
      transform($"embedding", (x, i) => when(i === 0, lit(0f)).otherwise(x)).as("embedding"))
    Similarity
      .lshCosinePairsPortable(
        emb.unionAll(twins), "vec_id", "embedding",
        threshold = 0.8, nTables = 8, planesPerTable = 16)
      .select($"id_a", $"id_b", round($"cos_sim", 6).as("cos_sim"))
      .orderBy($"id_a", $"id_b")
  }

  /** Full-table embedding near-dup blocked by IVF cells — the scale path
    * for WIDE thresholds where sign-LSH has no selectivity. The codebook is
    * the per-label fixed-point centroid set ([[Similarity.labelCodebook]]);
    * assignment is argmax cosine with a smallest-cell tie-break. Everything
    * is deterministic, so the oracle replays the ENTIRE pipeline — fixed-
    * point centroid training, float cast, assignment, pair scoring — and
    * the result is exact-hash-checked, unlike every other sketch-blocked
    * dedup (engine-specific hashes force those to rows-only gates).
    */
  val qEmbeddingIvf: GQuery = GQuery(
    "q_dedup_embedding_ivf",
    Some("""
      WITH flat AS (
        SELECT label, i,
               CAST(CAST((CAST(SUM(CAST(floor(CAST(e AS DOUBLE) * 1048576.0) AS BIGINT)) AS DOUBLE)
                          / COUNT(*)) / 1048576.0 AS REAL) AS DOUBLE) AS cv
        FROM (SELECT label, unnest(embedding) AS e,
                     unnest(generate_series(1, len(embedding))) AS i
              FROM embeddings)
        GROUP BY label, i),
      cents AS (
        SELECT ROW_NUMBER() OVER (ORDER BY label) - 1 AS cell, list(cv ORDER BY i) AS c
        FROM flat GROUP BY label),
      cn AS (SELECT cell, c, sqrt(list_sum(list_transform(c, x -> x * x))) AS cnrm FROM cents),
      v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings),
      assigned AS (
        SELECT vec_id, cell FROM (
          SELECT v.vec_id, cn.cell,
                 ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                    ORDER BY list_sum(list_transform(generate_series(1, 64),
                                             i -> v.e[i] * cn.c[i])) / (v.nrm * cn.cnrm) DESC,
                                             cn.cell) AS rn
          FROM v CROSS JOIN cn)
        WHERE rn = 1),
      pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_sum(list_transform(generate_series(1, 64),
                        i -> va.e[i] * vb.e[i])) / (va.nrm * vb.nrm) AS s
        FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
        JOIN v va ON va.vec_id = a.vec_id
        JOIN v vb ON vb.vec_id = b.vec_id)
      SELECT id_a, id_b, round(s, 6) AS cos_sim
      FROM pairs WHERE s >= 0.3
      ORDER BY id_a, id_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    val emb = t(spark, dir).embeddings
    val codebook = Similarity.labelCodebook(emb, "label", "embedding")
    Similarity
      .ivfCellPairs(emb, "vec_id", "embedding", codebook, threshold = 0.3)
      .select($"id_a", $"id_b", round($"cos_sim", 6).as("cos_sim"))
      .orderBy($"id_a", $"id_b")
  }

  /** Paragraph-level exact dedup ([[Dedup.paragraphDedup]], 12-token
    * windows): every paragraph survives only at its first corpus-wide
    * occurrence; docs reassemble from what remains. The oracle replays
    * segmentation, first-occurrence (via a window — an independent
    * formulation of the Spark side's skew-safe min-struct join), and the
    * ordered reassembly.
    */
  val qParagraph: GQuery = GQuery(
    "q_dedup_paragraph",
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
           para AS (SELECT doc_id, i AS pidx,
                           array_to_string(ts[(i*12+1):(i*12+12)], ' ') AS para
                    FROM t, LATERAL (SELECT unnest(generate_series(0,
                             CAST(ceil(len(ts) / 12.0) AS BIGINT) - 1)) AS i) g),
           firsts AS (SELECT doc_id, pidx, para,
                             row_number() OVER (PARTITION BY para
                                                ORDER BY doc_id, pidx) AS rn
                      FROM para),
           kept AS (SELECT doc_id, pidx, para FROM firsts WHERE rn = 1),
           counts AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras
                      FROM para GROUP BY 1)
      SELECT k.doc_id, c.n_paras, CAST(COUNT(*) AS BIGINT) AS n_kept,
             string_agg(k.para, ' ' ORDER BY k.pidx) AS clean_text
      FROM kept k JOIN counts c USING (doc_id)
      GROUP BY k.doc_id, c.n_paras
      ORDER BY k.doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    Dedup
      .paragraphDedup(t(spark, dir).documents, "doc_id", "text", paraTokens = 12)
      .orderBy($"doc_id")
  }

  /** Span-level exact substring dedup ([[Dedup.spanDedup]], 20-token
    * windows): any 20-token span seen earlier in the corpus (any offset,
    * any document, including earlier in the SAME document) is removed
    * from later documents, which reassemble from surviving tokens. The
    * oracle replays the whole pipeline — windowing, first-instance
    * ownership via a window function, coverage expansion, ordered
    * reassembly — so segmentation, tie-breaks and reassembly are all
    * hash-checked.
    */
  val qSpan: GQuery = GQuery(
    "q_dedup_span",
    Some("""
      WITH t AS (SELECT doc_id,
                        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
                 FROM documents),
      w AS (SELECT doc_id, i AS pos, md5(array_to_string(ts[i+1:i+20], ' ')) AS fp
            FROM t, LATERAL (SELECT unnest(generate_series(0, len(ts)-20)) AS i) g
            WHERE len(ts) >= 20),
      dups AS (SELECT doc_id, pos FROM (
                 SELECT doc_id, pos,
                        row_number() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rn
                 FROM w) WHERE rn > 1),
      cov AS (SELECT DISTINCT doc_id, pos + j AS tpos
              FROM dups, LATERAL (SELECT unnest(generate_series(0, 19)) AS j) g),
      tok AS (SELECT doc_id, i - 1 AS tpos, ts[i] AS tok
              FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) g),
      kept AS (SELECT k.doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                      string_agg(k.tok, ' ' ORDER BY k.tpos) AS clean_text
               FROM tok k
               WHERE NOT EXISTS (SELECT 1 FROM cov c
                                 WHERE c.doc_id = k.doc_id AND c.tpos = k.tpos)
               GROUP BY k.doc_id)
      SELECT t.doc_id,
             CAST(len(t.ts) AS BIGINT) AS n_tokens,
             CAST(len(t.ts) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_dup_tokens,
             COALESCE(k.clean_text, '') AS clean_text
      FROM t LEFT JOIN kept k USING (doc_id)
      ORDER BY t.doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    Dedup
      .spanDedup(t(spark, dir).documents, "doc_id", "text", windowTokens = 20)
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id")
  }

  /** Per-document shared-shingle fraction: what part of a doc's distinct
    * 3-grams also occurs in at least one OTHER document. The RefinedWeb /
    * Gopher-style boilerplate signal — docs made of corpus-common spans
    * (navigation chrome, licence blocks) score high and get down-weighted
    * before training. Unlike pairwise dedup this stays linear: shingle →
    * document-frequency groupBy → join back, no pair enumeration at all,
    * so it scales to corpora where even banded pair generation is too big.
    * Same normalization + distinct-per-doc shingling as q_gen_shingles.
    */
  val qSharedShingles: GQuery = GQuery(
    "q_dedup_shared_shingles",
    Some("""
      WITH t AS (SELECT doc_id,
                        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
                 FROM documents),
      sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
             FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i) g
             WHERE len(ts) >= 3
             UNION
             SELECT doc_id, array_to_string(ts, ' ') AS s FROM t WHERE len(ts) < 3),
      df AS (SELECT s, COUNT(DISTINCT doc_id) AS ndocs FROM sh GROUP BY s)
      SELECT sh.doc_id,
             COUNT(*) AS n_shingles,
             CAST(SUM(CASE WHEN df.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
             CAST(SUM(CASE WHEN df.ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS shared_frac
      FROM sh JOIN df USING (s)
      GROUP BY sh.doc_id
      ORDER BY sh.doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val sh = t(spark, dir).documents
      .select($"doc_id", graft.functions.GraftFunctions.shingles($"text", 3))
    val df = sh.groupBy($"shingle").agg(countDistinct($"doc_id").as("ndocs"))
    sh.join(df, "shingle")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when($"ndocs" >= 2, 1L).otherwise(0L)).as("n_shared"),
        (sum(when($"ndocs" >= 2, 1L).otherwise(0L)).cast("double") / count(lit(1)))
          .as("shared_frac")
      )
      .orderBy($"doc_id")
  }

  /** End of the dedup pipeline: who do we KEEP? Exact-Jaccard pairs (same
    * parameters as q_dedup_connected) → connected components → one
    * representative per cluster: max n_chars, ties to the smallest doc_id,
    * singletons representing themselves ([[Dedup.clusterRepresentatives]]).
    * The oracle replays the whole chain — shingling, df-cap, Jaccard ≥ 0.5
    * pairs, recursive-CTE components, then a window argmax — so the hash
    * match proves the full keep-decision table, not just the clustering.
    * (Spark side uses a mergeable struct-max aggregate instead of the
    * oracle's window rank: same answer, map-side combinable.)
    */
  val qRepresentative: GQuery = GQuery(
    "q_dedup_representative",
    Some("""
      WITH RECURSIVE t AS (SELECT doc_id,
                        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
                 FROM documents),
      sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
             FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i) g
             WHERE len(ts) >= 3
             UNION
             SELECT doc_id, array_to_string(ts, ' ') AS s FROM t WHERE len(ts) < 3),
      shf AS (SELECT * FROM sh WHERE s NOT IN (
                SELECT s FROM sh GROUP BY s
                HAVING COUNT(*) > (SELECT CAST(ceil(0.1 * COUNT(*)) AS BIGINT) FROM documents))),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY 1),
      jp AS (SELECT id_a, id_b FROM (
               SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
               FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2) p
             JOIN sz sa ON sa.doc_id = p.id_a
             JOIN sz sb ON sb.doc_id = p.id_b
             WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5),
      edges AS (SELECT id_a AS src, id_b AS dst FROM jp
                UNION SELECT id_b, id_a FROM jp),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      comp AS (SELECT src AS doc_id, least(src, MIN(dst)) AS component
               FROM reach GROUP BY src),
      lab AS (SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component, d.n_chars
              FROM documents d LEFT JOIN comp c USING (doc_id))
      SELECT component, doc_id AS rep_id, n_chars AS rep_score, n_docs FROM (
        SELECT component, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY component
                                  ORDER BY n_chars DESC, doc_id ASC) AS rn,
               COUNT(*) OVER (PARTITION BY component) AS n_docs
        FROM lab) r
      WHERE rn = 1
      ORDER BY component""")
  ) { (spark, dir) =>
    import spark.implicits._
    val docs = t(spark, dir).documents
    val cap = math.ceil(0.1 * docs.count()).toLong
    val pairs = Dedup
      .jaccardPairs(docs, "doc_id", "text", shingleN = 3, threshold = 0.5, maxDocFreq = cap)
      .select($"id_a", $"id_b")
    Dedup
      .clusterRepresentatives(docs, "doc_id", Dedup.connectedComponents(pairs), "n_chars")
      .orderBy($"component")
  }

  /** URL-level dedup over canonicalized URLs ([[graft.operators.TextOps
    * .canonicalizeUrl]]) — the cheapest dedup tier in a crawl pipeline,
    * run before any content hashing: messy variants (scheme/host case,
    * explicit default port, utm_* tracking params, fragments, trailing
    * slashes) collapse to one canonical form, then an exact hash-groupBy
    * dedup on the canonical string. The query builds a deterministic
    * messy-variant URL per doc (six orthogonal mess dimensions driven by
    * doc_id residues, so each canonical URL collects several differently-
    * mangled raws); the oracle rebuilds the raws AND replays the entire
    * canonicalization chain in DuckDB (RE2 vs Java regex — an
    * implementation-equality gate, like q_text_html_strip), then
    * recomputes the dedup table. Row-local map + one hash aggregate:
    * linear at any scale.
    */
  val qUrlCanonical: GQuery = GQuery(
    "q_dedup_url_canonical",
    Some("""
      WITH u AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTPS://' END) ||
               (CASE WHEN doc_id % 3 = 0 THEN 'News.Example.COM' ELSE 'news.example.com' END) ||
               (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END) ||
               '/articles/' || CAST(doc_id % 50 AS VARCHAR) ||
               (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
               (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 4 AS VARCHAR)
                     WHEN doc_id % 3 = 1 THEN '?id=' || CAST(doc_id % 4 AS VARCHAR) || '&utm_campaign=x'
                     ELSE '?id=' || CAST(doc_id % 4 AS VARCHAR) END) ||
               (CASE WHEN doc_id % 6 = 0 THEN '#section2' ELSE '' END) AS url
        FROM documents),
      c1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM u),
      c2 AS (SELECT doc_id,
                    lower(regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0)) ||
                      substr(u, length(regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0)) + 1) AS u
             FROM c1),
      c3 AS (SELECT doc_id,
                    regexp_replace(regexp_replace(u, '^(https://[^/?#:]*):443', '\1'),
                                   '^(http://[^/?#:]*):80', '\1') AS u
             FROM c2),
      c4 AS (SELECT doc_id,
                    regexp_replace(regexp_replace(u, 'utm_[^&#]*&', '', 'g'),
                                   '[?&]utm_[^&#]*$', '') AS u
             FROM c3),
      canon AS (SELECT doc_id, regexp_replace(u, '/(\?|$)', '\1') AS canonical_url FROM c4)
      SELECT canonical_url,
             CAST(COUNT(*) AS BIGINT) AS n_variants,
             CAST(MIN(doc_id) AS BIGINT) AS canonical_doc
      FROM canon
      GROUP BY canonical_url
      ORDER BY canonical_url""")
  ) { (spark, dir) =>
    import spark.implicits._
    val raw = t(spark, dir).documents.select($"doc_id", syntheticUrl.as("url"))
    raw
      .select($"doc_id", graft.operators.TextOps.canonicalizeUrl($"url").as("canonical_url"))
      .groupBy($"canonical_url")
      .agg(count(lit(1)).as("n_variants"), min($"doc_id").as("canonical_doc"))
      .orderBy($"canonical_url")
  }

  /** Deterministic messy-URL builder shared by [[qUrlCanonical]] and the
    * dedup cascade: case / default-port / utm / fragment / trailing-slash
    * variants keyed off doc_id residues so both engines construct the
    * SAME corpus. (DuckDB replica inlined in each oracle.)
    */
  private[queries] def syntheticUrl: org.apache.spark.sql.Column = {
    val id = col("doc_id")
    concat(
      when(id % 2 === 0, "https://").otherwise("HTTPS://"),
      when(id % 3 === 0, "News.Example.COM").otherwise("news.example.com"),
      when(id % 4 === 0, ":443").otherwise(""),
      lit("/articles/"), (id % 50).cast("string"),
      when(id % 5 === 0, "/").otherwise(""),
      when(id % 3 === 0, concat(lit("?utm_source=feed&id="), (id % 4).cast("string")))
        .when(id % 3 === 1, concat(lit("?id="), (id % 4).cast("string"), lit("&utm_campaign=x")))
        .otherwise(concat(lit("?id="), (id % 4).cast("string"))),
      when(id % 6 === 0, "#section2").otherwise("")
    )
  }

  /** DuckDB replica of [[syntheticUrl]], as a `u(doc_id, url)` CTE body. */
  private[queries] val syntheticUrlSql: String = """
      u AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTPS://' END) ||
               (CASE WHEN doc_id % 3 = 0 THEN 'News.Example.COM' ELSE 'news.example.com' END) ||
               (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END) ||
               '/articles/' || CAST(doc_id % 50 AS VARCHAR) ||
               (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
               (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 4 AS VARCHAR)
                     WHEN doc_id % 3 = 1 THEN '?id=' || CAST(doc_id % 4 AS VARCHAR) || '&utm_campaign=x'
                     ELSE '?id=' || CAST(doc_id % 4 AS VARCHAR) END) ||
               (CASE WHEN doc_id % 6 = 0 THEN '#section2' ELSE '' END) AS url
        FROM documents)"""

  /** The URL-canonicalization SQL chain (DuckDB side), parameterized on
    * the CTE holding (doc_id, url). Kept next to [[syntheticUrl]] so the
    * one canonicalization contract has one oracle formulation.
    */
  private[queries] def canonicalizeUrlSql(from: String): String = s"""
      c1 AS (SELECT doc_id, regexp_replace(url, '#.*$$', '') AS u FROM $from),
      c2 AS (SELECT doc_id,
                    lower(regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0)) ||
                      substr(u, length(regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', 0)) + 1) AS u
             FROM c1),
      c3 AS (SELECT doc_id,
                    regexp_replace(regexp_replace(u, '^(https://[^/?#:]*):443', '\\1'),
                                   '^(http://[^/?#:]*):80', '\\1') AS u
             FROM c2),
      c4 AS (SELECT doc_id,
                    regexp_replace(regexp_replace(u, 'utm_[^&#]*&', '', 'g'),
                                   '[?&]utm_[^&#]*$$', '') AS u
             FROM c3),
      canon AS (SELECT doc_id, regexp_replace(u, '/(\\?|$$)', '\\1') AS canonical_url FROM c4)"""

  /** Sorted-neighborhood near-dup pairs
    * ([[Dedup.sortedNeighborhoodPairs]], 40-char blocking prefix,
    * window 5, Jaccard ≥ 0.5): the merge/purge screen — sort by prefix,
    * compare each row with its 5 successors, verify with exact token-set
    * Jaccard. The oracle replays the total order (ROW_NUMBER over the
    * same key), the rank-banded candidate set, and the Jaccard
    * verification from exploded distinct tokens, so the hash match
    * proves the bucket-replication pairing loses (and invents) nothing
    * relative to the declarative rank-range join.
    */
  val qSortedNeighborhood: GQuery = GQuery(
    "q_dedup_sorted_neighborhood",
    Some("""
      WITH d AS (
        SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        FROM documents),
      r AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY substr(norm, 1, 40), doc_id) AS BIGINT) AS idx
        FROM d),
      p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, b.idx - a.idx AS rank_gap
        FROM r a JOIN r b ON b.idx - a.idx BETWEEN 1 AND 5),
      t AS (
        SELECT DISTINCT doc_id, tk
        FROM (SELECT doc_id,
                     unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tk
              FROM documents)
        WHERE length(tk) > 0),
      sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nt FROM t GROUP BY doc_id),
      inter AS (
        SELECT p.id_a, p.id_b, CAST(COUNT(*) AS BIGINT) AS ni
        FROM p
        JOIN t ta ON ta.doc_id = p.id_a
        JOIN t tb ON tb.doc_id = p.id_b AND tb.tk = ta.tk
        GROUP BY p.id_a, p.id_b),
      j AS (
        SELECT p.id_a, p.id_b, CAST(p.rank_gap AS BIGINT) AS rank_gap,
               round(CAST(COALESCE(i.ni, 0) AS DOUBLE)
                     / CAST(sa.nt + sb.nt - COALESCE(i.ni, 0) AS DOUBLE), 6) AS jaccard
        FROM p
        LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
        JOIN sz sa ON sa.doc_id = p.id_a
        JOIN sz sb ON sb.doc_id = p.id_b
        WHERE sa.nt + sb.nt - COALESCE(i.ni, 0) > 0)
      SELECT id_a, id_b, rank_gap, jaccard
      FROM j WHERE jaccard >= 0.5
      ORDER BY id_a, id_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    Dedup
      .sortedNeighborhoodPairs(t(spark, dir).documents, idCol = "doc_id",
        textCol = "text", prefixLen = 40, window = 5, minJaccard = 0.5)
      .orderBy($"id_a", $"id_b")
  }

  /** b-bit minhash estimation ([[Dedup.bbitMinhashScores]], k = 64,
    * b = 4 — a 16× signature-memory cut): per exact pair (Jaccard ≥
    * 0.35), the debiased 4-bit match-rate estimate must sit within 0.2
    * of the true Jaccard (measured max error across all three SFs:
    * 0.087 — the bound is >2× headroom on a ≈0.07-std estimator).
    * Bound-encoded oracle: exact Jaccard replays in SQL, `bbit_ok` is
    * pinned TRUE, so the hash match IS the accuracy gate.
    */
  val qBbitMinhash: GQuery = GQuery(
    "q_dedup_minhash_bbit",
    Some("""
      WITH t AS (SELECT doc_id,
                        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
                 FROM documents),
      sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
             FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i) g
             WHERE len(ts) >= 3
             UNION
             SELECT doc_id, array_to_string(ts, ' ') AS s FROM t WHERE len(ts) < 3),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT id_a, id_b,
             round(CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE), 6) AS jaccard,
             TRUE AS bbit_ok
      FROM pairs
      JOIN sz sa ON sa.doc_id = id_a
      JOIN sz sb ON sb.doc_id = id_b
      WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.35
      ORDER BY id_a, id_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    Dedup
      .bbitMinhashScores(t(spark, dir).documents, "doc_id", "text",
        shingleN = 3, k = 64, b = 4, threshold = 0.35)
      .select($"id_a", $"id_b",
        round($"jaccard", 6).as("jaccard"),
        (abs($"est_bbit" - $"jaccard") <= 0.2).as("bbit_ok"))
      .orderBy($"id_a", $"id_b")
  }

  /** Content-defined chunking + chunk-level dedup
    * ([[graft.functions.CdcChunkStarts]], the rsync/LBFS segmentation):
    * each document splits at rolling-hash boundaries, so an edit early in
    * a document shifts every FIXED-size chunk but leaves all
    * content-defined chunks after it byte-identical — the segmentation
    * under which partial-overlap dedup actually works. Per doc: chunk
    * count, how many of its chunks recur anywhere in the corpus
    * (corpus-wide occurrence > 1 — catches cross-doc boilerplate AND
    * in-doc repetition), and the md5 of the ordered chunk-hash list
    * (pins the full segmentation without multi-KB cells).
    *
    * Implementation-equality oracle: the engine runs the O(n)
    * incremental codegen expression; DuckDB recomputes every window
    * hash FROM SCRATCH per position (Σ c_{i−k}·B^k mod P — the
    * definition), so the hash match proves the sliding-window
    * optimization equals the definition, plus the whole chunk→count→join
    * pipeline. Scale: row-local chunking, one chunk-hash shuffle, one
    * join back — linear, and the chunk-hash table is the input a
    * corpus-level chunk store would ingest.
    */
  val qCdcChunks: GQuery = GQuery(
    "q_dedup_cdc_chunks",
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
        -- FILTER: the left join emits one NULL i for boundary-less docs,
        -- and DuckDB's list() would keep it as [NULL]
        SELECT d.doc_id, d.text, d.n,
               [1] || COALESCE(list_sort(list(b.i + 1) FILTER (b.i IS NOT NULL)), []) AS s
        FROM d LEFT JOIN bounds b USING (doc_id)
        GROUP BY d.doc_id, d.text, d.n),
      chunks AS (
        SELECT doc_id, pos,
               md5(substr(text, st, COALESCE(s[pos + 1], n + 1) - st)) AS h
        FROM (SELECT doc_id, text, n, s,
                     unnest(s) AS st,
                     unnest(generate_series(1, len(s))) AS pos
              FROM starts)),
      df AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS occ FROM chunks GROUP BY h)
      SELECT c.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_chunks,
             CAST(SUM(CASE WHEN df.occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
             md5(string_agg(c.h, '' ORDER BY c.pos)) AS chunks_md5
      FROM chunks c JOIN df USING (h)
      GROUP BY c.doc_id
      ORDER BY c.doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val chunks = t(spark, dir).documents
      .select($"doc_id", $"text",
        graft.functions.GraftFunctions.cdcChunkStarts($"text").as("s"))
      .select($"doc_id",
        posexplode(
          zip_with(
            $"s",
            concat(slice($"s", lit(2), greatest(size($"s") - 1, lit(0))),
              array(length($"text") + 1)),
            (st, en) => $"text".substr(st, en - st))))
      .select($"doc_id", ($"pos" + 1).as("pos"), md5($"col").as("h"))
      .ckptLazy() // feeds the occurrence count AND the join back
    val df = chunks.groupBy($"h").agg(count(lit(1)).as("occ"))
    chunks.join(df, "h")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when($"occ" > 1, 1L).otherwise(0L)).as("n_shared"),
        md5(array_join(
          transform(array_sort(collect_list(struct($"pos", $"h"))), x => x.getField("h")),
          "")).as("chunks_md5"))
      .orderBy($"doc_id")
  }

  /** Partial-overlap dedup pairs from shared CDC chunks: doc pairs
    * sharing ≥ 2 content-defined chunks, with the shared count and the
    * overlap fraction vs the smaller doc — the detector for partially
    * copied documents (quote farms, template+insert spam) that
    * WHOLE-doc signatures miss and fixed windows mis-align on. Same
    * hot-key discipline as every pair-generating join in this file:
    * chunks in more than `maxDf = 20` documents are boilerplate, and
    * they are anti-joined out BEFORE the self-join (a chunk in half the
    * corpus would otherwise quadratically pair it — the
    * [[graft.operators.Dedup.jaccardPairs]] df pre-pass pattern, round-7
    * verdict).
    */
  val qCdcPairs: GQuery = GQuery(
    "q_dedup_cdc_pairs",
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
      kept AS (
        SELECT doc_id, h FROM chunks
        WHERE h NOT IN (SELECT h FROM chunks GROUP BY h HAVING COUNT(*) > 20)),
      sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nc FROM chunks GROUP BY doc_id),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS shared
        FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2)
      SELECT p.id_a, p.id_b, p.shared,
             round(CAST(p.shared AS DOUBLE) / CAST(LEAST(sa.nc, sb.nc) AS DOUBLE), 6) AS overlap
      FROM pairs p
      JOIN sizes sa ON sa.doc_id = p.id_a
      JOIN sizes sb ON sb.doc_id = p.id_b
      ORDER BY id_a, id_b""")
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
      .ckptLazy() // feeds df-cap, sizes, and both self-join sides
    val hot = chunks.groupBy($"h").agg(count(lit(1)).as("occ"))
      .filter($"occ" > 20).select($"h")
    val kept = chunks.join(hot, Seq("h"), "left_anti")
    val sizes = chunks.groupBy($"doc_id").agg(count(lit(1)).as("nc"))
    val pairs = kept.as("a")
      .join(kept.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter($"shared" >= 2)
    pairs
      .join(sizes.select($"doc_id".as("id_a"), $"nc".as("na")), "id_a")
      .join(sizes.select($"doc_id".as("id_b"), $"nc".as("nb")), "id_b")
      .select($"id_a", $"id_b", $"shared",
        round($"shared".cast("double") / least($"na", $"nb").cast("double"), 6).as("overlap"))
      .orderBy($"id_a", $"id_b")
  }

  /** SEMANTIC incremental admission gate
    * ([[Similarity.semGateFromIndex]]) — completes the ingest-gate trio
    * (exact/minhash q_dedup_incremental_fuzzy, partial-copy
    * q_dedup_cdc_*, and now embedding near-dups that share no lexical
    * surface). 80% of the embeddings play the persisted index, the
    * vec_id % 5 == 0 slice arrives as the batch; a vector is rejected
    * when a same-sign-LSH-cell counterpart (index, or smaller-id batch
    * vector) has cosine ≥ 0.35, when its quantized-vector fingerprint
    * already exists in the index, or when a smaller-id batch vector
    * shares the fingerprint. The oracle replays ALL of it — plane-count
    * derivation from the INDEX size, integer sign-dot cells, the
    * per-cell candidate cap (cn ≤ 512 OR md5-rank ≤ 512 — the round-9
    * hot-cell discipline), the exact-double cosine threshold, and both
    * fingerprint fallbacks — so the admission decision itself is
    * hash-checked. Cells are longs engine-side and bit-strings
    * oracle-side (equal as partitions, not as values), so the output
    * carries (keep_id, fp), not the cell.
    */
  val qIncrementalSemantic: GQuery = GQuery(
    "q_dedup_incremental_semantic",
    Some("""
      WITH ex AS (SELECT * FROM embeddings WHERE vec_id % 5 <> 0),
      inc AS (SELECT * FROM embeddings WHERE vec_id % 5 = 0),
      params AS (
        SELECT MIN(j) AS p
        FROM (SELECT unnest(generate_series(0, 40)) AS j) js,
             (SELECT COUNT(*) AS n FROM ex) cn
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
      fps AS MATERIALIZED (
        SELECT vec_id,
               md5(array_to_string(list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)::VARCHAR), ',')) AS fp
        FROM embeddings),
      v AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings),
      excells AS MATERIALIZED (
        SELECT c.vec_id, c.cell FROM cells c JOIN ex USING (vec_id)),
      inccells AS MATERIALIZED (
        SELECT c.vec_id, c.cell FROM cells c JOIN inc USING (vec_id)),
      excap AS MATERIALIZED (
        SELECT vec_id, cell FROM (
          SELECT s.vec_id, s.cell, n.cn,
                 ROW_NUMBER() OVER (PARTITION BY s.cell
                                    ORDER BY md5(CAST(s.vec_id AS VARCHAR)), s.vec_id) AS rk
          FROM excells s JOIN (SELECT cell, COUNT(*) AS cn FROM excells GROUP BY cell) n
            USING (cell)) t
        WHERE cn <= 512 OR rk <= 512),
      inccap AS MATERIALIZED (
        SELECT vec_id, cell FROM (
          SELECT s.vec_id, s.cell, n.cn,
                 ROW_NUMBER() OVER (PARTITION BY s.cell
                                    ORDER BY md5(CAST(s.vec_id AS VARCHAR)), s.vec_id) AS rk
          FROM inccells s JOIN (SELECT cell, COUNT(*) AS cn FROM inccells GROUP BY cell) n
            USING (cell)) t
        WHERE cn <= 512 OR rk <= 512),
      rej AS (
        SELECT i.vec_id FROM inccells i
        JOIN excap o ON i.cell = o.cell
        JOIN v vi ON vi.vec_id = i.vec_id
        JOIN v vo ON vo.vec_id = o.vec_id
        WHERE list_sum(list_transform(generate_series(1, 64),
                d -> vi.e[d] * vo.e[d])) / (vi.nrm * vo.nrm) >= 0.35
        UNION
        SELECT i.vec_id FROM inccells i
        JOIN inccap o ON i.cell = o.cell AND o.vec_id < i.vec_id
        JOIN v vi ON vi.vec_id = i.vec_id
        JOIN v vo ON vo.vec_id = o.vec_id
        WHERE list_sum(list_transform(generate_series(1, 64),
                d -> vi.e[d] * vo.e[d])) / (vi.nrm * vo.nrm) >= 0.35
        UNION
        SELECT f.vec_id FROM fps f JOIN inc USING (vec_id)
        WHERE f.fp IN (SELECT fp FROM fps JOIN ex USING (vec_id))
        UNION
        SELECT vec_id FROM (
          SELECT f.vec_id,
                 ROW_NUMBER() OVER (PARTITION BY f.fp ORDER BY f.vec_id) AS rk
          FROM fps f JOIN inc USING (vec_id)) t
        WHERE rk > 1)
      SELECT i.vec_id AS keep_id, f.fp
      FROM inc i JOIN fps f ON f.vec_id = i.vec_id
      WHERE i.vec_id NOT IN (SELECT vec_id FROM rej)
      ORDER BY keep_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val emb = t(spark, dir).embeddings
    val existing = emb.filter($"vec_id" % 5 =!= 0)
    val incoming = emb.filter($"vec_id" % 5 === 0)
    val p = Similarity.lshCellPlanes(existing.count(), 64)
    Similarity
      .semGateFromIndex(
        Similarity.semIndexTable(existing, "vec_id", "embedding", p),
        Similarity.semIndexTable(incoming, "vec_id", "embedding", p),
        tau = 0.35, cellCap = 512L)
      .select($"keep_id", $"fp")
      .orderBy($"keep_id")
  }

  /** Duplicate-cluster impact report: the size histogram of the
    * near-dup connected components (same Jaccard ≥ 0.5 pipeline and
    * parameters as q_dedup_connected) with per-size redundancy
    * accounting — docs and characters that dedup would REMOVE when one
    * representative (max n_chars) is kept per cluster. This is the
    * "what did dedup actually buy us" table a corpus team reads after
    * any dedup run; a heavy tail here is also the input that justifies
    * the hot-key caps everywhere else.
    *
    * Scale shape: rides the pair pipeline's existing df-cap +
    * pointer-halving CC; after components exist, everything is two
    * keyed aggregates (per-component, then per-size — the second over
    * ≤ max-cluster-size rows). Redundant chars need only SUM − MAX per
    * component, never a window or a representative join.
    */
  val qClusterStats: GQuery = GQuery(
    "q_dedup_cluster_stats",
    Some("""
      WITH RECURSIVE t AS (SELECT doc_id,
                        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
                 FROM documents),
      sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
             FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i) g
             WHERE len(ts) >= 3
             UNION
             SELECT doc_id, array_to_string(ts, ' ') AS s FROM t WHERE len(ts) < 3),
      shf AS (SELECT * FROM sh WHERE s NOT IN (
                SELECT s FROM sh GROUP BY s
                HAVING COUNT(*) > (SELECT CAST(ceil(0.1 * COUNT(*)) AS BIGINT) FROM documents))),
      sz AS (SELECT doc_id, COUNT(*) AS n FROM shf GROUP BY 1),
      jp AS (SELECT id_a, id_b FROM (
               SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
               FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2) p
             JOIN sz sa ON sa.doc_id = p.id_a
             JOIN sz sb ON sb.doc_id = p.id_b
             WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5),
      edges AS (SELECT id_a AS src, id_b AS dst FROM jp
                UNION SELECT id_b, id_a FROM jp),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      comp AS (SELECT src AS doc_id, least(src, MIN(dst)) AS component
               FROM reach GROUP BY src),
      per AS (SELECT c.component,
                     CAST(COUNT(*) AS BIGINT) AS csz,
                     CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
                     CAST(MAX(d.n_chars) AS BIGINT) AS rep_chars
              FROM comp c JOIN documents d ON d.doc_id = c.doc_id
              GROUP BY 1)
      SELECT csz AS cluster_size,
             CAST(COUNT(*) AS BIGINT) AS n_clusters,
             CAST(SUM(csz) AS BIGINT) AS n_docs,
             CAST(SUM(csz - 1) AS BIGINT) AS redundant_docs,
             CAST(SUM(total_chars - rep_chars) AS BIGINT) AS redundant_chars
      FROM per GROUP BY 1 ORDER BY 1""")
  ) { (spark, dir) =>
    import spark.implicits._
    val docs = t(spark, dir).documents
    val cap = math.ceil(0.1 * docs.count()).toLong
    val pairs = Dedup
      .jaccardPairs(docs, "doc_id", "text", shingleN = 3, threshold = 0.5, maxDocFreq = cap)
      .select($"id_a", $"id_b")
    val per = Dedup.connectedComponents(pairs)
      .join(docs.select($"doc_id".as("id"), $"n_chars"), "id")
      .groupBy($"component")
      .agg(
        count(lit(1)).as("csz"),
        sum($"n_chars").cast("long").as("total_chars"),
        max($"n_chars").cast("long").as("rep_chars"))
    per.groupBy($"csz".as("cluster_size"))
      .agg(
        count(lit(1)).as("n_clusters"),
        sum($"csz").as("n_docs"),
        sum($"csz" - 1).as("redundant_docs"),
        sum($"total_chars" - $"rep_chars").as("redundant_chars"))
      .orderBy($"cluster_size")
  }

  /** Bloom-filter admission gate with a measured false-positive audit:
    * the train split's normalized content fingerprints populate a Bloom
    * set (k = 3 md5-derived positions into m = 8·n_train bits — the
    * bits-per-key parameterization, so the fill factor and FP rate stay
    * constant as the corpus grows); each probe doc is gated on all-k
    * membership, then audited against the EXACT fingerprint set: false
    * positives are counted (docs the gate would wrongly reject as dups),
    * false negatives are structurally impossible (a true dup's positions
    * are all set by its own train copy) and the query proves the zero.
    *
    * This is the cheap first tier of incremental ingest dedup at 100 TB:
    * membership is a position-key semi-join (3n ints), never a pair
    * enumeration, and the Bloom set is orders of magnitude smaller than
    * the fingerprint table. The gate errs toward FALSE POSITIVES
    * (over-rejection) only, so the CLAUDE cap-inversion rule is
    * satisfied by construction — and the production path would route
    * bloom-hits through the exact fingerprint check exactly as the
    * audit here does (the [[Dedup]] incremental family's fallback).
    */
  val qBloomGate: GQuery = GQuery(
    "q_dedup_bloom_gate",
    Some("""
      WITH d AS (SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
                        substr(md5(CAST(doc_id AS VARCHAR) || ':41'), 1, 4) < 'b333' AS is_train
                 FROM documents),
      m AS (SELECT 8 * COUNT(DISTINCT fp) AS m_bits FROM d WHERE is_train),
      train_pos AS (SELECT DISTINCT ('0x' || substr(md5(fp || ':' || j), 1, 8))::BIGINT % m.m_bits AS pos
                    FROM d, LATERAL (SELECT unnest(generate_series(1, 3)) AS j) g, m
                    WHERE is_train),
      probe_pos AS (SELECT doc_id, fp,
                           ('0x' || substr(md5(fp || ':' || j), 1, 8))::BIGINT % m.m_bits AS pos
                    FROM d, LATERAL (SELECT unnest(generate_series(1, 3)) AS j) g, m
                    WHERE NOT is_train),
      hits AS (SELECT p.doc_id, p.fp, CAST(COUNT(t.pos) AS BIGINT) AS n_hit
               FROM probe_pos p LEFT JOIN train_pos t ON p.pos = t.pos
               GROUP BY 1, 2),
      exact AS (SELECT DISTINCT fp FROM d WHERE is_train),
      flag AS (SELECT h.doc_id, (h.n_hit = 3) AS bloom_hit, (e.fp IS NOT NULL) AS exact_dup
               FROM hits h LEFT JOIN exact e ON h.fp = e.fp)
      SELECT (SELECT CAST(m_bits AS BIGINT) FROM m) AS m_bits,
             CAST(COUNT(*) AS BIGINT) AS n_probe,
             CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hit,
             CAST(SUM(CASE WHEN exact_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
             CAST(SUM(CASE WHEN bloom_hit AND NOT exact_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
             CAST(SUM(CASE WHEN exact_dup AND NOT bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg,
             CAST(SUM(CASE WHEN bloom_hit AND NOT exact_dup THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS fp_rate
      FROM flag""")
  ) { (spark, dir) =>
    import spark.implicits._
    val d = Dedup.contentFp(t(spark, dir).documents, "doc_id", "text")
      .withColumn("is_train",
        substring(md5(concat($"id".cast("string"), lit(":41"))), 1, 4) < "b333")
    val m = d.filter($"is_train").agg((countDistinct($"fp") * 8).as("m_bits"))
    def positions(df: org.apache.spark.sql.DataFrame) =
      Dedup.bloomPositions(df.crossJoin(broadcast(m)), k = 3, mBits = $"m_bits")
    val trainPos = positions(d.filter($"is_train")).select($"pos")
    val probePos = positions(d.filter(!$"is_train"))
    val verdict = Dedup.bloomVerdict(trainPos, probePos, k = 3)
    val exact = d.filter($"is_train").select($"fp".as("efp")).distinct()
    val flag = verdict.join(exact, $"fp" === $"efp", "left")
      .select($"bloom_hit", $"efp".isNotNull.as("exact_dup"))
    flag.crossJoin(broadcast(m))
      .groupBy($"m_bits")
      .agg(
        count(lit(1)).as("n_probe"),
        sum(when($"bloom_hit", 1L).otherwise(0L)).as("n_bloom_hit"),
        sum(when($"exact_dup", 1L).otherwise(0L)).as("n_exact_dup"),
        sum(when($"bloom_hit" && !$"exact_dup", 1L).otherwise(0L)).as("n_false_pos"),
        sum(when($"exact_dup" && !$"bloom_hit", 1L).otherwise(0L)).as("n_false_neg"))
      .select($"m_bits", $"n_probe", $"n_bloom_hit", $"n_exact_dup", $"n_false_pos", $"n_false_neg",
        ($"n_false_pos".cast("double") / $"n_probe".cast("double")).as("fp_rate"))
  }

  /** Fellegi–Sunter probabilistic record linkage over customer — the
    * classic match/possible/non-match decision rule that upgrades
    * [[qFuzzyKey]]'s single edit-distance test to a weighted
    * field-agreement vector. The corpus has no true duplicates, so the
    * query plants a DETERMINISTIC dirty copy for every 10th customer
    * (id + 10⁹, acctbal + 0.01 always; every 20th is a CLEAN copy — name
    * and segment kept — while the others get last name char → 'x' and
    * segment 'MOVED') — the augmentation-fixture discipline: clean
    * planted pairs must score 16 ('match'), dirty planted pairs 0
    * ('possible'), original×original pairs mostly negative
    * ('non_match'), and the oracle replays fixture, blocking, weights
    * and classification.
    *
    * Blocking key = (c_nationkey, substr(name,1,16)): TPC-H names are
    * fixed-width "Customer#" + 9 digits, so a 16-char prefix frees the
    * last two digits → blocks are bounded at ~100 originals + copies
    * regardless of table size (the hot-key discipline for this
    * pair-generating join), and the planted perturbation never touches
    * the prefix, so fixture recall is 1 by construction.
    *
    * Portability: agreement weights are the Fellegi–Sunter log-odds
    * rounded to INTEGER-VALUED doubles (+8/−4 name, +6/−3 balance,
    * +2/−2 segment) fed as literals; every score is a 3-term sum of
    * small integer-valued doubles (exact in IEEE at any association),
    * and the |Δbal| ≤ 0.02 test is one subtraction + compare of
    * identical doubles on both engines.
    */
  val qRecordLinkage: GQuery = GQuery(
    "q_dedup_record_linkage",
    Some("""
      WITH base AS (
        SELECT c_custkey AS id, c_name AS name, c_nationkey AS nat,
               c_acctbal AS bal, c_mktsegment AS seg
        FROM customer
        UNION ALL
        SELECT c_custkey + 1000000000,
               CASE WHEN c_custkey % 20 = 0 THEN c_name
                    ELSE substr(c_name, 1, 17) || 'x' END,
               c_nationkey, c_acctbal + 0.01,
               CASE WHEN c_custkey % 20 = 0 THEN c_mktsegment ELSE 'MOVED' END
        FROM customer WHERE c_custkey % 10 = 0),
      blocked AS (SELECT *, substr(name, 1, 16) AS blk FROM base),
      pairs AS (
        SELECT a.id AS id_a, b.id AS id_b,
               CASE WHEN a.name = b.name THEN 8.0e0 ELSE -4.0e0 END
               + CASE WHEN abs(a.bal - b.bal) <= 0.02 THEN 6.0e0 ELSE -3.0e0 END
               + CASE WHEN a.seg = b.seg THEN 2.0e0 ELSE -2.0e0 END AS score
        FROM blocked a JOIN blocked b
          ON a.nat = b.nat AND a.blk = b.blk AND a.id < b.id),
      classed AS (
        SELECT id_a, id_b, score,
               CASE WHEN score >= 10.0 THEN 'match'
                    WHEN score >= 0.0 THEN 'possible'
                    ELSE 'non_match' END AS class,
               (id_b = id_a + 1000000000) AS is_planted
        FROM pairs)
      SELECT class,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN is_planted THEN 1 ELSE 0 END) AS BIGINT) AS n_planted,
             SUM(score) AS sum_score,
             MIN(score) AS min_score, MAX(score) AS max_score
      FROM classed GROUP BY class ORDER BY class""")
  ) { (spark, dir) =>
    import spark.implicits._
    val c = t(spark, dir).customer
    val base = c.select($"c_custkey".as("id"), $"c_name".as("name"),
        $"c_nationkey".as("nat"), $"c_acctbal".as("bal"), $"c_mktsegment".as("seg"))
      .unionAll(c.filter($"c_custkey" % 10 === 0)
        .select(($"c_custkey" + 1000000000L).as("id"),
          when($"c_custkey" % 20 === 0, $"c_name")
            .otherwise(concat($"c_name".substr(1, 17), lit("x"))).as("name"),
          $"c_nationkey".as("nat"), ($"c_acctbal" + 0.01).as("bal"),
          when($"c_custkey" % 20 === 0, $"c_mktsegment").otherwise("MOVED").as("seg")))
      .withColumn("blk", substring($"name", 1, 16))
    val a = base.select($"id".as("id_a"), $"name".as("name_a"), $"nat",
      $"bal".as("bal_a"), $"seg".as("seg_a"), $"blk")
    val b = base.select($"id".as("id_b"), $"name".as("name_b"), $"nat",
      $"bal".as("bal_b"), $"seg".as("seg_b"), $"blk")
    val pairs = a.join(b, Seq("nat", "blk")).filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        (when($"name_a" === $"name_b", 8.0).otherwise(-4.0)
          + when(abs($"bal_a" - $"bal_b") <= 0.02, 6.0).otherwise(-3.0)
          + when($"seg_a" === $"seg_b", 2.0).otherwise(-2.0)).as("score"))
    pairs
      .select($"id_a", $"id_b", $"score",
        when($"score" >= 10.0, "match")
          .when($"score" >= 0.0, "possible")
          .otherwise("non_match").as("class"),
        ($"id_b" === $"id_a" + 1000000000L).as("is_planted"))
      .groupBy($"class")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when($"is_planted", 1L).otherwise(0L)).as("n_planted"),
        sum($"score").as("sum_score"),
        min($"score").as("min_score"), max($"score").as("max_score"))
      .orderBy($"class")
  }

  /** Golden-record survivorship over entity-resolution clusters — the
    * MDM step AFTER [[qRecordLinkage]]: 'match'-class pairs (score ≥ 10)
    * feed [[Dedup.connectedComponents]], and each cluster merges into
    * one golden record by field-level rules: name/segment by majority
    * vote (ties → count DESC, value ASC — replayable), balance by MAX,
    * golden id = cluster min, members previewed as a rank-capped joined
    * string (≤ 16 — the capped-collect discipline) beside the exact
    * n_members count.
    *
    * Oracle note: on this fixture every match cluster is provably the
    * (original, clean-copy) pair — score ≥ 10 requires EXACT name
    * agreement and TPC-H names are unique per custkey — so the oracle
    * replays components as least(id_a, id_b) directly; the general
    * iterative CC operator is proven separately by q_dedup_connected's
    * chain fixtures. Scale shape: blocking-bounded pair join →
    * CC → three cluster-keyed aggregations, all O(matched ids).
    */
  val qSurvivorship: GQuery = GQuery(
    "q_dedup_survivorship",
    Some("""
      WITH base AS (
        SELECT c_custkey AS id, c_name AS name, c_nationkey AS nat,
               c_acctbal AS bal, c_mktsegment AS seg
        FROM customer
        UNION ALL
        SELECT c_custkey + 1000000000,
               CASE WHEN c_custkey % 20 = 0 THEN c_name
                    ELSE substr(c_name, 1, 17) || 'x' END,
               c_nationkey, c_acctbal + 0.01,
               CASE WHEN c_custkey % 20 = 0 THEN c_mktsegment ELSE 'MOVED' END
        FROM customer WHERE c_custkey % 10 = 0),
      blocked AS (SELECT *, substr(name, 1, 16) AS blk FROM base),
      m AS (
        SELECT a.id AS id_a, b.id AS id_b
        FROM blocked a JOIN blocked b
          ON a.nat = b.nat AND a.blk = b.blk AND a.id < b.id
        WHERE (CASE WHEN a.name = b.name THEN 8.0e0 ELSE -4.0e0 END
               + CASE WHEN abs(a.bal - b.bal) <= 0.02 THEN 6.0e0 ELSE -3.0e0 END
               + CASE WHEN a.seg = b.seg THEN 2.0e0 ELSE -2.0e0 END) >= 10.0),
      mem AS (
        SELECT id_a AS comp, id_a AS id FROM m
        UNION SELECT id_a, id_b FROM m),
      rec AS (SELECT mem.comp, b.* FROM mem JOIN base b ON b.id = mem.id),
      namev AS (
        SELECT comp, name FROM (
          SELECT comp, name,
                 ROW_NUMBER() OVER (PARTITION BY comp
                                    ORDER BY COUNT(*) DESC, name) AS rk
          FROM rec GROUP BY comp, name) WHERE rk = 1),
      segv AS (
        SELECT comp, seg FROM (
          SELECT comp, seg,
                 ROW_NUMBER() OVER (PARTITION BY comp
                                    ORDER BY COUNT(*) DESC, seg) AS rk
          FROM rec GROUP BY comp, seg) WHERE rk = 1),
      prev AS (
        SELECT comp, string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS member_preview
        FROM (SELECT comp, id,
                     ROW_NUMBER() OVER (PARTITION BY comp ORDER BY id) AS rk
              FROM rec) WHERE rk <= 16
        GROUP BY comp)
      SELECT r.comp AS golden_id,
             CAST(COUNT(*) AS BIGINT) AS n_members,
             ANY_VALUE(nv.name) AS golden_name,
             ANY_VALUE(sv.seg) AS golden_segment,
             MAX(r.bal) AS max_balance,
             ANY_VALUE(p.member_preview) AS member_preview
      FROM rec r
      JOIN namev nv ON nv.comp = r.comp
      JOIN segv sv ON sv.comp = r.comp
      JOIN prev p ON p.comp = r.comp
      GROUP BY r.comp
      ORDER BY golden_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val c = t(spark, dir).customer
    val base = c.select($"c_custkey".as("id"), $"c_name".as("name"),
        $"c_nationkey".as("nat"), $"c_acctbal".as("bal"), $"c_mktsegment".as("seg"))
      .unionAll(c.filter($"c_custkey" % 10 === 0)
        .select(($"c_custkey" + 1000000000L).as("id"),
          when($"c_custkey" % 20 === 0, $"c_name")
            .otherwise(concat($"c_name".substr(1, 17), lit("x"))).as("name"),
          $"c_nationkey".as("nat"), ($"c_acctbal" + 0.01).as("bal"),
          when($"c_custkey" % 20 === 0, $"c_mktsegment").otherwise("MOVED").as("seg")))
      .withColumn("blk", substring($"name", 1, 16))
      .ckptLazy() // feeds the pair join (both sides) + member join
    val a = base.select($"id".as("id_a"), $"name".as("name_a"), $"nat",
      $"bal".as("bal_a"), $"seg".as("seg_a"), $"blk")
    val b = base.select($"id".as("id_b"), $"name".as("name_b"), $"nat",
      $"bal".as("bal_b"), $"seg".as("seg_b"), $"blk")
    val matches = a.join(b, Seq("nat", "blk")).filter($"id_a" < $"id_b")
      .filter(
        (when($"name_a" === $"name_b", 8.0).otherwise(-4.0)
          + when(abs($"bal_a" - $"bal_b") <= 0.02, 6.0).otherwise(-3.0)
          + when($"seg_a" === $"seg_b", 2.0).otherwise(-2.0)) >= 10.0)
      .select($"id_a", $"id_b")
    val cc = Dedup.connectedComponents(matches)
    val rec = base.join(cc.select($"id", $"component".as("comp")), Seq("id"))
      .ckptLazy() // feeds three vote/roll-up aggregations
    def vote(c: String): org.apache.spark.sql.DataFrame = {
      val counted = rec.groupBy($"comp", col(c)).agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy($"comp").orderBy($"cnt".desc, col(c))
      counted.withColumn("rk", row_number().over(w)).filter($"rk" === 1)
        .select($"comp", col(c))
    }
    val wm = Window.partitionBy($"comp").orderBy($"id")
    val prev = rec.withColumn("rn", row_number().over(wm)).filter($"rn" <= 16)
      .groupBy($"comp")
      .agg(array_join(array_sort(collect_list($"id")), ",").as("member_preview"))
    rec.groupBy($"comp")
      .agg(count(lit(1)).as("n_members"), max($"bal").as("max_balance"))
      .join(vote("name").withColumnRenamed("name", "golden_name"), Seq("comp"))
      .join(vote("seg").withColumnRenamed("seg", "golden_segment"), Seq("comp"))
      .join(prev, Seq("comp"))
      .select($"comp".as("golden_id"), $"n_members", $"golden_name",
        $"golden_segment", $"max_balance", $"member_preview")
      .orderBy($"golden_id")
  }

  /** Longest-common-subsequence verify over blocked doc pairs
    * ([[graft.functions.LcsLength]], the graft_lcs codegen DP): each doc
    * pairs with the NEXT doc of its source (a deterministic linear
    * blocking — the sorted-neighborhood shape on the provenance key) and
    * the 24-token prefixes align by LCS. LCS is the ORDER-preserving
    * overlap that shingle-set Jaccard misses: reordered tokens keep
    * their shingle sets apart but cannot keep a long common
    * subsequence, so lcs_ratio separates light edits from
    * same-vocabulary rewrites.
    *
    * Oracle: the full integer DP replayed as a DuckDB ANTI-DIAGONAL
    * recursive CTE (the q_ts_dtw pattern with base value 0 instead of
    * +∞ sentinels) — every L[i][j] cell of every pair is proven, and
    * the INTEGER dp makes the match exact by construction. lcs_ratio
    * is one IEEE division of ints. Scale shape: pairs are linear in
    * docs by construction (lead() over a source-partitioned window);
    * each DP is a bounded 24×24 row-local computation.
    */
  val qLcsVerify: GQuery = GQuery(
    "q_dedup_lcs",
    Some("""
      WITH RECURSIVE toks AS MATERIALIZED (
        SELECT doc_id, source,
               string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')[1:24] AS ts
        FROM documents),
      pairs AS MATERIALIZED (
        SELECT doc_id AS doc_a,
               lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS doc_b,
               ts AS x,
               lead(ts) OVER (PARTITION BY source ORDER BY doc_id) AS y
        FROM toks),
      pp AS MATERIALIZED (
        SELECT doc_a, doc_b, x, y,
               CAST(len(x) AS BIGINT) AS n, CAST(len(y) AS BIGINT) AS m
        FROM pairs WHERE doc_b IS NOT NULL),
      rec AS (
        SELECT doc_a, doc_b, x, y, n, m, CAST(1 AS BIGINT) AS d,
               CAST(NULL AS BIGINT[]) AS prev2,
               list_transform(range(1, CAST(n AS INT) + 1),
                 i -> CAST(NULL AS BIGINT)) AS prev
        FROM pp
        UNION ALL
        SELECT doc_a, doc_b, x, y, n, m, d + 1, prev,
               list_transform(range(1, CAST(n AS INT) + 1), i ->
                 CASE WHEN (d + 1 - i) BETWEEN 1 AND m
                      THEN CASE WHEN x[i] = y[d + 1 - i]
                                THEN COALESCE(CASE WHEN i > 1 AND d + 1 - i > 1
                                                   THEN prev2[i - 1] END, 0) + 1
                                ELSE greatest(
                                  COALESCE(CASE WHEN i > 1 THEN prev[i - 1] END, 0),
                                  COALESCE(CASE WHEN d - i >= 1 THEN prev[i] END, 0))
                           END
                      ELSE CAST(NULL AS BIGINT) END)
        FROM rec WHERE d < n + m)
      SELECT doc_a, doc_b, n AS len_a, m AS len_b,
             CAST(prev[CAST(n AS INT)] AS INT) AS lcs_len,
             CAST(prev[CAST(n AS INT)] AS DOUBLE)
               / CAST(least(n, m) AS DOUBLE) AS lcs_ratio
      FROM rec WHERE d = n + m
      ORDER BY doc_a""")
  ) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = t(spark, dir).documents
      .select($"doc_id", $"source",
        slice(graft.operators.TextOps.tokens($"text"), 1, 24).as("ts"))
    val w = Window.partitionBy($"source").orderBy($"doc_id")
    val pairs = toks
      .select($"doc_id".as("doc_a"), lead($"doc_id", 1).over(w).as("doc_b"),
        $"ts".as("x"), lead($"ts", 1).over(w).as("y"))
      .filter($"doc_b".isNotNull)
    pairs
      .select($"doc_a", $"doc_b",
        size($"x").cast("long").as("len_a"), size($"y").cast("long").as("len_b"),
        graft.functions.GraftFunctions.lcs($"x", $"y").as("lcs_len"))
      .withColumn("lcs_ratio",
        $"lcs_len".cast("double") / least($"len_a", $"len_b").cast("double"))
      .orderBy($"doc_a")
  }

  /** FULL Levenshtein verify over noun-blocked part-name pairs — the
    * unbounded-distance tier above graft_ed1's band-1 scan
    * ([[qFuzzyKey]]): block part names by their head noun (last token),
    * pair each name with the next in block order, and score the exact
    * edit distance. Dual-purpose oracle: Spark's built-in levenshtein
    * and DuckDB's levenshtein are INDEPENDENT implementations of the
    * same integer DP, so the hash match cross-validates two codebases
    * we wrote neither of (the implementation-equality pattern with both
    * sides swapped out). Integer distances: exact. Scale shape: pairs
    * linear in parts (lead over a noun-partitioned window; noun blocks
    * are vocabulary-bounded and balanced).
    */
  val qLevenshtein: GQuery = GQuery(
    "q_dedup_levenshtein",
    Some("""
      WITH p AS (
        SELECT p_partkey, p_name,
               string_split(p_name, ' ')[-1] AS noun
        FROM part),
      pr AS (
        SELECT p_partkey AS key_a, p_name AS name_a, noun,
               lead(p_partkey) OVER w AS key_b,
               lead(p_name) OVER w AS name_b
        FROM p
        WINDOW w AS (PARTITION BY noun ORDER BY p_name, p_partkey))
      SELECT key_a, key_b, name_a, name_b,
             CAST(levenshtein(name_a, name_b) AS INT) AS edit_dist,
             levenshtein(name_a, name_b) <= 4 AS is_near
      FROM pr WHERE key_b IS NOT NULL
      ORDER BY key_a""")
  ) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val p = t(spark, dir).part
      .select($"p_partkey", $"p_name",
        element_at(split($"p_name", " "), -1).as("noun"))
    val w = Window.partitionBy($"noun").orderBy($"p_name", $"p_partkey")
    p.select($"p_partkey".as("key_a"), $"p_name".as("name_a"),
        lead($"p_partkey", 1).over(w).as("key_b"),
        lead($"p_name", 1).over(w).as("name_b"))
      .filter($"key_b".isNotNull)
      .select($"key_a", $"key_b", $"name_a", $"name_b",
        levenshtein($"name_a", $"name_b").as("edit_dist"),
        (levenshtein($"name_a", $"name_b") <= 4).as("is_near"))
      .orderBy($"key_a")
  }

  override def queries: Seq[GQuery] =
    Seq(qExact, qIncremental, qIncrementalFuzzy, qFuzzyKey, qJaccard, qContainment, qPrefixFilter,
      qMinhash, qSimhash, qEmbedding, qEmbeddingLsh, qEmbeddingLshTight, qEmbeddingIvf,
      qConnected, qParagraph, qSpan, qSharedShingles, qRepresentative, qUrlCanonical,
      qSortedNeighborhood, qBbitMinhash, qCdcChunks, qCdcPairs, qIncrementalSemantic,
      qClusterStats, qBloomGate, qRecordLinkage, qSurvivorship, qLcsVerify, qLevenshtein)
}
