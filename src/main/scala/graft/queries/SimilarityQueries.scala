package graft.queries

import graft.engine.PlanOnly.syntax._

import org.apache.spark.sql.functions._

import Common._
import graft.operators.Similarity

/** Similarity-search inventory: exact brute-force top-k (oracle-checked),
  * sign-LSH top-k (oracle = exact top-k, which its OR-amplified candidates
  * provably recover here), and IVF top-k (bound-encoded recall oracle —
  * probing 6/16 cells genuinely loses neighbors). SimilaritySpec holds the
  * raw recall/pruning contracts for the approximate regimes.
  */
object SimilarityQueries extends QuerySet {

  /** Exact top-5 cosine neighbors for the 8 lowest-id vectors. Output is
    * (query_id, neighbor_id, rank) — rank ordering only depends on score
    * comparisons, which are stable across engines at double precision.
    */
  val qBruteForce: GQuery = GQuery(
    "q_ann_bruteforce",
    Some("""
      WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings),
      q AS (SELECT * FROM v WHERE vec_id < 8),
      scored AS (
        SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
               list_sum(list_transform(generate_series(1, 64), i -> q.e[i] * v.e[i]))
                 / (q.nrm * v.nrm) AS score
        FROM q JOIN v ON q.vec_id != v.vec_id),
      ranked AS (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, neighbor_id) AS rank
        FROM scored)
      SELECT query_id, neighbor_id, rank
      FROM ranked WHERE rank <= 5
      ORDER BY query_id, rank""")
  ) { (spark, dir) =>
    import spark.implicits._
    val emb = t(spark, dir).embeddings
    Similarity
      .bruteForceTopK(emb, emb.filter($"vec_id" < 8), "vec_id", "embedding", 5)
      .orderBy($"query_id", $"rank")
  }

  /** Multi-table sign-LSH approximate top-k (16 tables × 3 planes); each
    * query scores only bucket collisions. Oracle = the EXACT brute-force
    * top-k SQL: at 16 tables × 3 planes the OR-amplified candidate set
    * provably contains every true neighbor of this corpus, so the LSH
    * result must EQUAL exact top-k — any lost neighbor, broken ranking,
    * or bucketing regression hash-mismatches. SimilaritySpec separately
    * asserts the weaker recall bound that holds in sparser regimes, plus
    * the pruning (candidates ≪ all pairs) that makes LSH worth running.
    */
  val qLsh: GQuery = GQuery(
    "q_ann_lsh",
    Some("""
      WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings),
      q AS (SELECT * FROM v WHERE vec_id < 8),
      scored AS (
        SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
               list_sum(list_transform(generate_series(1, 64), i -> q.e[i] * v.e[i]))
                 / (q.nrm * v.nrm) AS score
        FROM q JOIN v ON q.vec_id != v.vec_id),
      ranked AS (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, neighbor_id) AS rank
        FROM scored)
      SELECT query_id, neighbor_id, rank
      FROM ranked WHERE rank <= 5
      ORDER BY query_id, rank""")
  ) { (spark, dir) =>
    import spark.implicits._
    val emb = t(spark, dir).embeddings
    Similarity
      .lshTopK(emb, emb.filter($"vec_id" < 8), "vec_id", "embedding", 5)
      .orderBy($"query_id", $"rank")
  }

  /** Per-label embedding centroid via the custom [[graft.functions.CentroidAgg]]
    * Aggregator (UDAF) — the coarse-quantizer step of IVF-style ANN.
    * Output is exploded to scalar rows (label, idx, avg_v): the oracle
    * harness hashes flat cells, and array-typed result columns are not
    * hashable there. The UDAF accumulates fixed-point longs
    * (floor(v · 2^20)), so the mean is bit-identical across partition
    * orders and the oracle replays the exact math — no rounding tolerance
    * at all (double summation drifted past a round() boundary at sf0.1).
    */
  val qCentroid: GQuery = GQuery(
    "q_agg_centroid",
    Some("""
      SELECT label, CAST(i - 1 AS INT) AS idx,
             (CAST(SUM(CAST(floor(CAST(e AS DOUBLE) * 1048576.0) AS BIGINT)) AS DOUBLE)
              / COUNT(*)) / 1048576.0 AS avg_v
      FROM (SELECT label,
                   unnest(embedding) AS e,
                   unnest(generate_series(1, len(embedding))) AS i
            FROM embeddings)
      GROUP BY label, i
      ORDER BY label, idx""")
  ) { (spark, dir) =>
    import spark.implicits._
    val centroid = udaf(new graft.functions.CentroidAgg(64))
    t(spark, dir).embeddings
      .groupBy($"label")
      .agg(centroid($"embedding").as("c"))
      .select($"label", posexplode($"c.values"))
      .select($"label", $"pos".cast("int").as("idx"), $"col".as("avg_v"))
      .orderBy($"label", $"idx")
  }

  /** IVF coarse-quantized approximate top-k (nlist=16, nprobe=6) — the
    * second ANN scale path next to sign-LSH. Unlike sign-LSH, probing 6
    * of 16 cells genuinely loses neighbors on this (unclustered,
    * synthetic) corpus, so result-set equality with exact is impossible
    * and the oracle gate is BOUND-ENCODED instead: per query, emit the
    * result count and a boolean asserting recall@5 ≥ 0.3 against the
    * engine's own exact top-k (itself independently oracle-checked via
    * q_ann_bruteforce); the oracle pins (5 results, TRUE) per query.
    * Measured per-query recall at sf0.01 is 0.4–1.0. SimilaritySpec
    * asserts the raw-result recall/pruning contract.
    */
  val qIvf: GQuery = GQuery(
    "q_ann_ivf",
    Some("""
      SELECT CAST(vec_id AS BIGINT) AS query_id,
             CAST(5 AS BIGINT) AS n_results,
             TRUE AS recall_ok
      FROM embeddings WHERE vec_id < 8
      ORDER BY query_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val emb = t(spark, dir).embeddings
    val qs = emb.filter($"vec_id" < 8)
    val ivf = Similarity.ivfTopK(emb, qs, "vec_id", "embedding", 5)
    val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 5)
    val hits = ivf
      .join(exact.select($"query_id", $"neighbor_id"), Seq("query_id", "neighbor_id"))
      .groupBy($"query_id").agg(count(lit(1)).as("n_hits"))
    ivf
      .groupBy($"query_id").agg(count(lit(1)).as("n_results"))
      .join(exact.groupBy($"query_id").agg(count(lit(1)).as("n_exact")), "query_id")
      .join(hits, Seq("query_id"), "left")
      .select(
        $"query_id".cast("long").as("query_id"),
        $"n_results",
        (coalesce($"n_hits", lit(0L)).cast("double") / $"n_exact" >= 0.3).as("recall_ok")
      )
      .orderBy($"query_id")
  }

  /** Unit-L2 normalization ([[graft.operators.Embeddings.l2Normalize]]):
    * per vector, the pre-normalization norm and the norm of the normalized
    * result (≈1 — the oracle replays the same element-wise divisions and
    * the same left-fold square sum, so even its last-ulp wobble matches).
    */
  val qNormalize: GQuery = GQuery(
    "q_embed_normalize",
    Some("""
      WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings)
      SELECT vec_id,
             round(nrm, 6) AS pre_norm,
             round(sqrt(list_sum(list_transform(e, x -> (x / nrm) * (x / nrm)))), 6) AS post_norm
      FROM v
      ORDER BY vec_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.operators.Embeddings
    val normalized = Embeddings.l2Normalize($"embedding")
    t(spark, dir).embeddings
      .select(
        $"vec_id",
        round(Similarity.norm($"embedding"), 6).as("pre_norm"),
        round(
          sqrt(aggregate(normalized, lit(0.0), (acc, x) => acc + x * x)),
          6
        ).as("post_norm")
      )
      .orderBy($"vec_id")
  }

  /** Symmetric int8 quantization ([[graft.operators.Embeddings]]): per
    * vector, the quantization scale and the max reconstruction error —
    * the accuracy contract of a 4×-compressed ANN index. Every step
    * (max-abs, floor(x·scale+0.5), clamp, dequantized error) is exact or
    * IEEE-deterministic, so the oracle hash-checks the full pipeline.
    */
  val qQuantize: GQuery = GQuery(
    "q_embed_quantize",
    Some("""
      WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
        FROM embeddings),
      s AS (
        SELECT vec_id, e,
               CASE WHEN m = 0 THEN 1.0 ELSE 127.0 / m END AS scale
        FROM v),
      q AS (
        SELECT vec_id, scale,
               list_transform(e, x -> greatest(-127.0, least(127.0, floor(x * scale + 0.5)))) AS codes,
               e
        FROM s)
      SELECT vec_id,
             round(scale, 6) AS scale,
             round(list_max(list_transform(generate_series(1, 64),
                            i -> abs(e[i] - codes[i] / scale))), 6) AS max_err
      FROM q
      ORDER BY vec_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.operators.Embeddings
    val scale = Embeddings.int8Scale($"embedding")
    t(spark, dir).embeddings
      .select($"vec_id", $"embedding", scale.as("scale"))
      .select(
        $"vec_id",
        round($"scale", 6).as("scale"),
        round(
          Embeddings.maxAbsError($"embedding", Embeddings.int8Quantize($"embedding", $"scale"), $"scale"),
          6
        ).as("max_err")
      )
      .orderBy($"vec_id")
  }

  /** Product-quantization encode ([[Similarity.pqCodebooks]]/`pqEncode`):
    * 64-dim float vectors compressed to FOUR small ints (one
    * argmax-cosine cell per 16-dim subspace against that subspace's
    * fixed-point label-mean codebook) — 64× smaller than the raw floats,
    * the storage/ADC-scan leg of the ANN family next to int8 scalar
    * quantization (8×). The oracle replays the ENTIRE pipeline —
    * per-subspace fixed-point training, slicing, cosine argmax with the
    * smallest-cell tie rule — so every code of every vector is
    * hash-checked, exactly like q_dedup_embedding_ivf. At 100 TB the
    * corpus flows only through the m CellCosines encode maps; training
    * touches one aggregate.
    */
  val qPq: GQuery = GQuery(
    "q_embed_pq",
    Some("""
      WITH ss AS (SELECT unnest([0, 1, 2, 3]) AS s),
      sub AS (SELECT e.vec_id, e.label, ss.s,
                     e.embedding[(ss.s*16+1):(ss.s*16+16)] AS sv
              FROM embeddings e CROSS JOIN ss),
      flat AS (SELECT label, s, i,
                      CAST(CAST((CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS DOUBLE)
                                 / COUNT(*)) / 1048576.0 AS REAL) AS DOUBLE) AS cv
               FROM (SELECT label, s, unnest(sv) AS x,
                            unnest(generate_series(1, len(sv))) AS i
                     FROM sub)
               GROUP BY label, s, i),
      cents AS (SELECT s, ROW_NUMBER() OVER (PARTITION BY s ORDER BY label) - 1 AS cell,
                       list(cv ORDER BY i) AS c
                FROM flat GROUP BY s, label),
      cn AS (SELECT s, cell, c,
                    sqrt(list_sum(list_transform(c, x -> x * x))) AS cnrm
             FROM cents),
      v AS (SELECT vec_id, s,
                   list_transform(sv, x -> CAST(x AS DOUBLE)) AS e,
                   sqrt(list_sum(list_transform(sv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
            FROM sub),
      assigned AS (
        SELECT vec_id, s, cell FROM (
          SELECT v.vec_id, v.s, cn.cell,
                 ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.s
                                    ORDER BY list_sum(list_transform(generate_series(1, 16),
                                             i -> v.e[i] * cn.c[i])) / (v.nrm * cn.cnrm) DESC,
                                             cn.cell) AS rn
          FROM v JOIN cn ON v.s = cn.s)
        WHERE rn = 1)
      SELECT vec_id,
             CAST(MAX(CASE WHEN s = 0 THEN cell END) AS INT) AS code_0,
             CAST(MAX(CASE WHEN s = 1 THEN cell END) AS INT) AS code_1,
             CAST(MAX(CASE WHEN s = 2 THEN cell END) AS INT) AS code_2,
             CAST(MAX(CASE WHEN s = 3 THEN cell END) AS INT) AS code_3
      FROM assigned
      GROUP BY vec_id
      ORDER BY vec_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val emb = t(spark, dir).embeddings
    val cbs = Similarity.pqCodebooks(emb, "label", "embedding", dim = 64, m = 4)
    val codes = Similarity.pqEncode($"embedding", cbs, dim = 64)
    emb
      .select(
        $"vec_id",
        element_at(codes, 1).as("code_0"),
        element_at(codes, 2).as("code_1"),
        element_at(codes, 3).as("code_2"),
        element_at(codes, 4).as("code_3"))
      .orderBy($"vec_id")
  }

  /** ADC top-k over the PQ codes ([[Similarity.pqTopK]]) — and unlike
    * every other approximate-ANN entry, FULLY hash-checked: the oracle
    * replays codebook training, encode, the per-(query, subspace, cell)
    * partial-dot table, the decimal-exact two-sum score (order-
    * insensitive, so aggregation order can't flip a bit), and the
    * (score DESC, id) ranking. The score the engine serves IS
    * cos(query, reconstruction) — the oracle computes it from first
    * principles and every ranked row must match.
    */
  val qAnnPq: GQuery = GQuery(
    "q_ann_pq",
    Some("""
      WITH ss AS (SELECT unnest([0, 1, 2, 3]) AS s),
      sub AS (SELECT e.vec_id, e.label, ss.s,
                     e.embedding[(ss.s*16+1):(ss.s*16+16)] AS sv
              FROM embeddings e CROSS JOIN ss),
      flat AS (SELECT label, s, i,
                      CAST(CAST((CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS DOUBLE)
                                 / COUNT(*)) / 1048576.0 AS REAL) AS DOUBLE) AS cv
               FROM (SELECT label, s, unnest(sv) AS x,
                            unnest(generate_series(1, len(sv))) AS i
                     FROM sub)
               GROUP BY label, s, i),
      cents AS (SELECT s, ROW_NUMBER() OVER (PARTITION BY s ORDER BY label) - 1 AS cell,
                       list(cv ORDER BY i) AS c
                FROM flat GROUP BY s, label),
      cn AS (SELECT s, cell, c,
                    sqrt(list_sum(list_transform(c, x -> x * x))) AS cnrm,
                    list_sum(list_transform(c, x -> x * x)) AS cnorm2
             FROM cents),
      v AS (SELECT vec_id, s,
                   list_transform(sv, x -> CAST(x AS DOUBLE)) AS e,
                   sqrt(list_sum(list_transform(sv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
            FROM sub),
      assigned AS (
        SELECT vec_id, s, cell FROM (
          SELECT v.vec_id, v.s, cn.cell,
                 ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.s
                                    ORDER BY list_sum(list_transform(generate_series(1, 16),
                                             i -> v.e[i] * cn.c[i])) / (v.nrm * cn.cnrm) DESC,
                                             cn.cell) AS rn
          FROM v JOIN cn ON v.s = cn.s)
        WHERE rn = 1),
      q AS (SELECT vec_id AS qid, s, e AS qe FROM v WHERE vec_id < 4),
      qn AS (SELECT vec_id AS qid,
                    sqrt(list_sum(list_transform(embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qnorm
             FROM embeddings WHERE vec_id < 4),
      pd AS (SELECT q.qid, a.vec_id AS id,
                    CAST(SUM(CAST(list_sum(list_transform(generate_series(1, 16),
                             i -> q.qe[i] * r.c[i])) AS DECIMAL(38,12))) AS DOUBLE) AS dot,
                    CAST(SUM(CAST(r.cnorm2 AS DECIMAL(38,12))) AS DOUBLE) AS rn2
             FROM q
             JOIN assigned a ON a.s = q.s
             JOIN cn r ON r.s = a.s AND r.cell = a.cell
             GROUP BY 1, 2),
      scored AS (SELECT pd.qid, pd.id,
                        pd.dot / (qn.qnorm * sqrt(pd.rn2)) AS adc_score
                 FROM pd JOIN qn ON qn.qid = pd.qid)
      SELECT qid, id, adc_score, CAST(rank AS INT) AS rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY adc_score DESC, id) AS rank
        FROM scored) r
      WHERE rank <= 5
      ORDER BY qid, rank""")
  ) { (spark, dir) =>
    import spark.implicits._
    val emb = t(spark, dir).embeddings
    val cbs = Similarity.pqCodebooks(emb, "label", "embedding", dim = 64, m = 4)
    val codes = emb.select($"vec_id", Similarity.pqEncode($"embedding", cbs, dim = 64).as("codes"))
    Similarity
      .pqTopK(
        codes, emb.filter($"vec_id" < 4).select($"vec_id".as("qid"), $"embedding"),
        "vec_id", "qid", "embedding", cbs, dim = 64, k = 5, exactSums = true)
      .select($"qid", $"id", $"adc_score", $"rank")
      .orderBy($"qid", $"rank")
  }

  /** Approximate kNN graph ([[Similarity.knnGraphLsh]]): every vector's
    * top-3 cosine neighbors within its CORPUS-SCALED sign-LSH cell — the
    * SemDeDup-style clustering input, every edge hash-checked: the
    * oracle replays the plane-count derivation, integer sign-dot cell
    * assignment, both-direction candidate edges, and the (cos DESC, dst)
    * per-source ranking. (Round 8 migrated this off the label codebook:
    * constant cell count → ~n²/cells compute; see
    * q_quality_label_consistency's re-measure in BASELINE.md.)
    */
  val qKnnGraph: GQuery = GQuery(
    "q_graph_knn",
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
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings),
      edges AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               list_sum(list_transform(generate_series(1, 64),
                        i -> va.e[i] * vb.e[i])) / (va.nrm * vb.nrm) AS s
        FROM cells a
        JOIN bkeep b ON a.cell = b.cell AND a.vec_id <> b.vec_id
        JOIN v va ON va.vec_id = a.vec_id
        JOIN v vb ON vb.vec_id = b.vec_id)
      SELECT src, dst, round(s, 6) AS cos_sim, CAST(rank AS INT) AS rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS rank
        FROM edges) r
      WHERE rank <= 3
      ORDER BY src, rank""")
  ) { (spark, dir) =>
    import spark.implicits._
    Similarity
      .knnGraphLsh(t(spark, dir).embeddings, "vec_id", "embedding", k = 3)
      .select($"src", $"dst", round($"cos_sim", 6).as("cos_sim"), $"rank")
      .orderBy($"src", $"rank")
  }

  /** ANN recall audit (the accuracy side of the recall/compute knob
    * every celled operator trades on): recall@3 of the CORPUS-SCALED
    * sign-LSH kNN graph ([[Similarity.knnGraphLsh]], targetCell = 64 —
    * deliberately in the celled, sub-1-recall regime at both verify
    * SFs) against exact brute-force cosine top-3, per probe vector.
    * The probe set is a deterministic 25% sample (vec_id % 4 — a recall
    * audit SAMPLES at scale; the probe side is broadcast). BOTH
    * rankings and the intersection count replay in the oracle, so the
    * measured recall itself — not a spec-side approximation of it — is
    * hash-checked. This is the measurement that justifies (or vetoes)
    * shipping the celled plan for a given targetCell.
    */
  val qRecallAudit: GQuery = GQuery(
    "q_ann_recall_audit",
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
      v AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings),
      probes AS (SELECT vec_id FROM embeddings WHERE vec_id % 4 = 0),
      exact AS (
        SELECT query_id, neighbor_id FROM (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
                   list_sum(list_transform(generate_series(1, 64), i -> va.e[i] * vb.e[i]))
                     / (va.nrm * vb.nrm) DESC, b.vec_id) AS rank
          FROM probes a JOIN embeddings b ON a.vec_id <> b.vec_id
          JOIN v va ON va.vec_id = a.vec_id
          JOIN v vb ON vb.vec_id = b.vec_id) r
        WHERE rank <= 3),
      celled AS (
        SELECT src, dst FROM (
          SELECT a.vec_id AS src, b.vec_id AS dst,
                 ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
                   list_sum(list_transform(generate_series(1, 64), i -> va.e[i] * vb.e[i]))
                     / (va.nrm * vb.nrm) DESC, b.vec_id) AS rank
          FROM cells a
          JOIN bkeep b ON a.cell = b.cell AND a.vec_id <> b.vec_id
          JOIN v va ON va.vec_id = a.vec_id
          JOIN v vb ON vb.vec_id = b.vec_id) r
        WHERE rank <= 3),
      hits AS (
        SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
        FROM exact e JOIN celled c ON c.src = e.query_id AND c.dst = e.neighbor_id
        GROUP BY e.query_id)
      SELECT p.vec_id AS query_id,
             COALESCE(h.n_hit, 0) AS n_hit,
             round(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / 3.0, 6) AS recall
      FROM probes p LEFT JOIN hits h ON h.query_id = p.vec_id
      ORDER BY query_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val emb = t(spark, dir).embeddings
    val probes = emb.filter($"vec_id" % 4 === 0)
    val exact = Similarity
      .bruteForceTopK(emb, probes, "vec_id", "embedding", 3)
      .select($"query_id", $"neighbor_id")
    val celled = Similarity
      .knnGraphLsh(emb, "vec_id", "embedding", k = 3, targetCell = 64)
      .select($"src".as("query_id"), $"dst".as("neighbor_id"))
    val hits = exact
      .join(celled, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy($"query_id").agg(count(lit(1)).as("n_hit"))
    probes.select($"vec_id".as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select($"query_id",
        coalesce($"n_hit", lit(0L)).as("n_hit"),
        round(coalesce($"n_hit", lit(0L)).cast("double") / 3.0, 6).as("recall"))
      .orderBy($"query_id")
  }

  /** MULTI-PROBE kNN graph ([[Similarity.knnGraphLsh]] `multiProbe`,
    * round-10 — the round-9 verdict's #4: the probe lever had shipped
    * for hard-negative mining only, while q_graph_knn /
    * q_pipeline_semdedup consumers silently skipped singleton-cell
    * vectors). Each vector probes its own CORPUS-SCALED sign-LSH cell
    * AND the p flip-1-bit neighbor cells; targetCell = 64 keeps the
    * fixture in the celled regime at both verify SFs so probing itself
    * is what's hash-checked. The oracle replays the plane count, the
    * cells, the per-cell candidate cap (8·64 = 512), and the probe set
    * by flipping each character of the cell bit-string; a dst lives in
    * exactly one cell, so no (src, dst) pair arises twice.
    */
  val qKnnGraphProbe: GQuery = GQuery(
    "q_graph_knn_probe",
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
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings),
      edges AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               list_sum(list_transform(generate_series(1, 64),
                        i -> va.e[i] * vb.e[i])) / (va.nrm * vb.nrm) AS s
        FROM probes a
        JOIN bkeep b ON a.cell = b.cell AND a.vec_id <> b.vec_id
        JOIN v va ON va.vec_id = a.vec_id
        JOIN v vb ON vb.vec_id = b.vec_id)
      SELECT src, dst, round(s, 6) AS cos_sim, CAST(rank AS INT) AS rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS rank
        FROM edges) r
      WHERE rank <= 3
      ORDER BY src, rank""")
  ) { (spark, dir) =>
    import spark.implicits._
    Similarity
      .knnGraphLsh(t(spark, dir).embeddings, "vec_id", "embedding", k = 3,
        targetCell = 64, multiProbe = true)
      .select($"src", $"dst", round($"cos_sim", 6).as("cos_sim"), $"rank")
      .orderBy($"src", $"rank")
  }

  /** Measured recall LIFT of multi-probe over single-probe
    * ([[Similarity.knnGraphLsh]], targetCell = 64, both variants vs
    * exact brute-force top-3 on the same deterministic 25% probe
    * sample as q_ann_recall_audit) — the evidence that buying (p+1)×
    * candidate lookups actually purchases recall, per query vector and
    * hash-checked end to end: both celled rankings, the exact ranking,
    * and both intersection counts replay in the oracle. Recall ratios
    * are n_hit/3.0 — single IEEE divisions of exact integers, no
    * rounding needed (deterministic across engines; the round-9
    * portability lesson is to keep transcendentals out of hashed
    * cells, and there are none here).
    */
  val qRecallProbeLift: GQuery = GQuery(
    "q_ann_recall_probe_lift",
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
      pr AS MATERIALIZED (
        SELECT vec_id,
               unnest(list_prepend(cell,
                 list_transform(generate_series(1, (SELECT p FROM params)),
                   pp -> substr(cell, 1, pp - 1)
                         || (CASE WHEN substr(cell, pp, 1) = '1' THEN '0' ELSE '1' END)
                         || substr(cell, pp + 1)))) AS cell
        FROM cells),
      v AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings),
      probes AS (SELECT vec_id FROM embeddings WHERE vec_id % 4 = 0),
      exact AS MATERIALIZED (
        SELECT query_id, neighbor_id FROM (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
                   list_sum(list_transform(generate_series(1, 64), i -> va.e[i] * vb.e[i]))
                     / (va.nrm * vb.nrm) DESC, b.vec_id) AS rank
          FROM probes a JOIN embeddings b ON a.vec_id <> b.vec_id
          JOIN v va ON va.vec_id = a.vec_id
          JOIN v vb ON vb.vec_id = b.vec_id) r
        WHERE rank <= 3),
      single AS (
        SELECT src, dst FROM (
          SELECT a.vec_id AS src, b.vec_id AS dst,
                 ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
                   list_sum(list_transform(generate_series(1, 64), i -> va.e[i] * vb.e[i]))
                     / (va.nrm * vb.nrm) DESC, b.vec_id) AS rank
          FROM cells a
          JOIN bkeep b ON a.cell = b.cell AND a.vec_id <> b.vec_id
          JOIN v va ON va.vec_id = a.vec_id
          JOIN v vb ON vb.vec_id = b.vec_id) r
        WHERE rank <= 3),
      multi AS (
        SELECT src, dst FROM (
          SELECT a.vec_id AS src, b.vec_id AS dst,
                 ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
                   list_sum(list_transform(generate_series(1, 64), i -> va.e[i] * vb.e[i]))
                     / (va.nrm * vb.nrm) DESC, b.vec_id) AS rank
          FROM pr a
          JOIN bkeep b ON a.cell = b.cell AND a.vec_id <> b.vec_id
          JOIN v va ON va.vec_id = a.vec_id
          JOIN v vb ON vb.vec_id = b.vec_id) r
        WHERE rank <= 3),
      hs AS (
        SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
        FROM exact e JOIN single c ON c.src = e.query_id AND c.dst = e.neighbor_id
        GROUP BY e.query_id),
      hm AS (
        SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
        FROM exact e JOIN multi c ON c.src = e.query_id AND c.dst = e.neighbor_id
        GROUP BY e.query_id)
      SELECT p.vec_id AS query_id,
             COALESCE(hs.n_hit, 0) AS n_hit_single,
             COALESCE(hm.n_hit, 0) AS n_hit_probe,
             CAST(COALESCE(hs.n_hit, 0) AS DOUBLE) / 3.0e0 AS recall_single,
             CAST(COALESCE(hm.n_hit, 0) AS DOUBLE) / 3.0e0 AS recall_probe
      FROM probes p
      LEFT JOIN hs ON hs.query_id = p.vec_id
      LEFT JOIN hm ON hm.query_id = p.vec_id
      ORDER BY query_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val emb = t(spark, dir).embeddings
    val probes = emb.filter($"vec_id" % 4 === 0)
    val exact = Similarity
      .bruteForceTopK(emb, probes, "vec_id", "embedding", 3)
      .select($"query_id", $"neighbor_id")
      .ckptLazy()
    def hitsOf(celled: org.apache.spark.sql.DataFrame, as: String) =
      exact
        .join(
          celled.select($"src".as("query_id"), $"dst".as("neighbor_id")),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy($"query_id").agg(count(lit(1)).as(as))
    val single = Similarity.knnGraphLsh(emb, "vec_id", "embedding", k = 3, targetCell = 64)
    val multi = Similarity.knnGraphLsh(emb, "vec_id", "embedding", k = 3,
      targetCell = 64, multiProbe = true)
    probes.select($"vec_id".as("query_id"))
      .join(hitsOf(single, "n_hit_single"), Seq("query_id"), "left")
      .join(hitsOf(multi, "n_hit_probe"), Seq("query_id"), "left")
      .select($"query_id",
        coalesce($"n_hit_single", lit(0L)).as("n_hit_single"),
        coalesce($"n_hit_probe", lit(0L)).as("n_hit_probe"),
        (coalesce($"n_hit_single", lit(0L)).cast("double") / 3.0).as("recall_single"),
        (coalesce($"n_hit_probe", lit(0L)).cast("double") / 3.0).as("recall_probe"))
      .orderBy($"query_id")
  }

  /** SemDeDup-shape SEMANTIC clustering, end to end: kNN graph within
    * CORPUS-SCALED sign-LSH cells ([[Similarity.knnGraphLsh]] — round 8
    * migrated this off the constant-cell-count label codebook, whose
    * within-cell compute grew ~n²/cells; see q_quality_label_consistency)
    * → keep edges with cosine ≥ 0.3 → connected components → the cluster
    * table (component = min member id, size per cluster, singletons
    * self-clustered). The full chain — plane-count derivation, integer
    * sign-dot cell assignment, candidate edges, per-source top-3 ranking,
    * thresholding, recursive-CTE components, singleton fill — is replayed
    * by the oracle, so the SEMANTIC dedup decision itself is
    * hash-checked, like its lexical siblings (q_dedup_connected /
    * q_dedup_representative).
    */
  val qSemCluster: GQuery = GQuery(
    "q_pipeline_semdedup",
    Some("""
      WITH RECURSIVE params AS (
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
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings),
      edges0 AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               list_sum(list_transform(generate_series(1, 64),
                        i -> va.e[i] * vb.e[i])) / (va.nrm * vb.nrm) AS s
        FROM cells a
        JOIN bkeep b ON a.cell = b.cell AND a.vec_id <> b.vec_id
        JOIN v va ON va.vec_id = a.vec_id
        JOIN v vb ON vb.vec_id = b.vec_id),
      kept AS (
        SELECT src, dst FROM (
          SELECT src, dst, s,
                 ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS rank
          FROM edges0) r
        WHERE rank <= 3 AND s >= 0.3),
      ed AS (SELECT src, dst FROM kept UNION SELECT dst, src FROM kept),
      reach(src, dst) AS (
        SELECT src, dst FROM ed
        UNION
        SELECT r.src, e.dst FROM reach r JOIN ed e ON r.dst = e.src),
      comp AS (SELECT src AS vec_id, least(src, MIN(dst)) AS component
               FROM reach GROUP BY src),
      lab AS (SELECT e.vec_id, COALESCE(c.component, e.vec_id) AS component
              FROM embeddings e LEFT JOIN comp c ON c.vec_id = e.vec_id)
      SELECT component, COUNT(*) AS n_vecs
      FROM lab GROUP BY 1 ORDER BY component""")
  ) { (spark, dir) =>
    import spark.implicits._
    val emb = t(spark, dir).embeddings
    val edges = Similarity
      .knnGraphLsh(emb, "vec_id", "embedding", k = 3)
      .filter($"cos_sim" >= 0.3)
      .select($"src".as("id_a"), $"dst".as("id_b"))
    graft.operators.Dedup
      .clusterRepresentatives(
        emb.select($"vec_id", lit(0L).as("__score")),
        "vec_id",
        graft.operators.Dedup.connectedComponents(edges),
        "__score")
      .select($"component", $"n_docs".as("n_vecs"))
      .orderBy($"component")
  }

  /** IVF-PQ top-k ([[Similarity.ivfPqTopK]]) — the FAISS-style production
    * architecture composed from the engine's two quantizers and, like its
    * pieces, FULLY hash-checked: the oracle replays coarse training,
    * cell assignment, the (cos DESC, cell) 3-probe ranking, per-subspace
    * PQ training + encode, the candidate restriction, the decimal-exact
    * ADC score, and the final ranking. Sub-1 recall is part of the
    * replayed function, not an excuse for a weaker gate.
    */
  /** Shared oracle prefix for the IVF-PQ family: everything up to the
    * per-candidate ADC score (`scored(qid, id, adc_score)`), replaying
    * coarse training, both assignments, the 3-probe restriction, PQ
    * training/encode and the decimal-exact ADC — used by q_ann_ivfpq
    * (rank the ADC scores) and q_ann_ivfpq_refine (exact re-rank of the
    * widened ADC candidate list).
    */
  private val ivfPqScoredCtes: String = """
      WITH cflat AS (
        SELECT label, i,
               CAST(CAST((CAST(SUM(CAST(floor(CAST(e AS DOUBLE) * 1048576.0) AS BIGINT)) AS DOUBLE)
                          / COUNT(*)) / 1048576.0 AS REAL) AS DOUBLE) AS cv
        FROM (SELECT label, unnest(embedding) AS e,
                     unnest(generate_series(1, len(embedding))) AS i
              FROM embeddings)
        GROUP BY label, i),
      ccents AS (
        SELECT ROW_NUMBER() OVER (ORDER BY label) - 1 AS cell, list(cv ORDER BY i) AS c
        FROM cflat GROUP BY label),
      ccn AS (SELECT cell, c, sqrt(list_sum(list_transform(c, x -> x * x))) AS cnrm FROM ccents),
      cv AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings),
      cassigned AS (
        SELECT vec_id, cell FROM (
          SELECT cv.vec_id, ccn.cell,
                 ROW_NUMBER() OVER (PARTITION BY cv.vec_id
                                    ORDER BY list_sum(list_transform(generate_series(1, 64),
                                             i -> cv.e[i] * ccn.c[i])) / (cv.nrm * ccn.cnrm) DESC,
                                             ccn.cell) AS rn
          FROM cv CROSS JOIN ccn)
        WHERE rn = 1),
      probe AS (
        SELECT qid, cell FROM (
          SELECT cv.vec_id AS qid, ccn.cell,
                 ROW_NUMBER() OVER (PARTITION BY cv.vec_id
                                    ORDER BY list_sum(list_transform(generate_series(1, 64),
                                             i -> cv.e[i] * ccn.c[i])) / (cv.nrm * ccn.cnrm) DESC,
                                             ccn.cell) AS rn
          FROM cv CROSS JOIN ccn WHERE cv.vec_id < 4) r
        WHERE rn <= 3),
      candv AS (SELECT p.qid, a.vec_id AS id
                FROM probe p JOIN cassigned a ON a.cell = p.cell),
      ss AS (SELECT unnest([0, 1, 2, 3]) AS s),
      sub AS (SELECT e.vec_id, e.label, ss.s,
                     e.embedding[(ss.s*16+1):(ss.s*16+16)] AS sv
              FROM embeddings e CROSS JOIN ss),
      flat AS (SELECT label, s, i,
                      CAST(CAST((CAST(SUM(CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS DOUBLE)
                                 / COUNT(*)) / 1048576.0 AS REAL) AS DOUBLE) AS cvv
               FROM (SELECT label, s, unnest(sv) AS x,
                            unnest(generate_series(1, len(sv))) AS i
                     FROM sub)
               GROUP BY label, s, i),
      cents AS (SELECT s, ROW_NUMBER() OVER (PARTITION BY s ORDER BY label) - 1 AS cell,
                       list(cvv ORDER BY i) AS c
                FROM flat GROUP BY s, label),
      cn AS (SELECT s, cell, c,
                    sqrt(list_sum(list_transform(c, x -> x * x))) AS cnrm,
                    list_sum(list_transform(c, x -> x * x)) AS cnorm2
             FROM cents),
      v AS (SELECT vec_id, s,
                   list_transform(sv, x -> CAST(x AS DOUBLE)) AS e,
                   sqrt(list_sum(list_transform(sv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
            FROM sub),
      assigned AS (
        SELECT vec_id, s, cell FROM (
          SELECT v.vec_id, v.s, cn.cell,
                 ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.s
                                    ORDER BY list_sum(list_transform(generate_series(1, 16),
                                             i -> v.e[i] * cn.c[i])) / (v.nrm * cn.cnrm) DESC,
                                             cn.cell) AS rn
          FROM v JOIN cn ON v.s = cn.s)
        WHERE rn = 1),
      q AS (SELECT vec_id AS qid, s, e AS qe FROM v WHERE vec_id < 4),
      qn AS (SELECT vec_id AS qid,
                    sqrt(list_sum(list_transform(embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qnorm
             FROM embeddings WHERE vec_id < 4),
      pd AS (SELECT cd.qid, cd.id,
                    CAST(SUM(CAST(list_sum(list_transform(generate_series(1, 16),
                             i -> q.qe[i] * r.c[i])) AS DECIMAL(38,12))) AS DOUBLE) AS dot,
                    CAST(SUM(CAST(r.cnorm2 AS DECIMAL(38,12))) AS DOUBLE) AS rn2
             FROM candv cd
             JOIN assigned a ON a.vec_id = cd.id
             JOIN q ON q.qid = cd.qid AND q.s = a.s
             JOIN cn r ON r.s = a.s AND r.cell = a.cell
             GROUP BY 1, 2),
      scored AS (SELECT pd.qid, pd.id,
                        pd.dot / (qn.qnorm * sqrt(pd.rn2)) AS adc_score
                 FROM pd JOIN qn ON qn.qid = pd.qid)"""

  val qIvfPq: GQuery = GQuery(
    "q_ann_ivfpq",
    Some(ivfPqScoredCtes + """
      SELECT qid, id, adc_score, CAST(rank AS INT) AS rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY adc_score DESC, id) AS rank
        FROM scored) r
      WHERE rank <= 5
      ORDER BY qid, rank""")
  ) { (spark, dir) =>
    import spark.implicits._
    val emb = t(spark, dir).embeddings
    val coarse = Similarity.labelCodebook(emb, "label", "embedding")
    val cbs = Similarity.pqCodebooks(emb, "label", "embedding", dim = 64, m = 4)
    Similarity
      .ivfPqTopK(
        emb, emb.filter($"vec_id" < 4).select($"vec_id".as("qid"), $"embedding"),
        "vec_id", "qid", "embedding", coarse, cbs,
        dim = 64, k = 5, nProbe = 3, exactSums = true)
      .select($"qid", $"id", $"adc_score", $"rank")
      .orderBy($"qid", $"rank")
  }

  /** IVF-PQ + exact REFINE ([[Similarity.ivfPqRefineTopK]]) — the
    * deployed shape of compressed ANN: ADC ranks 3k candidates from
    * codes alone, then ONLY those ids fetch true vectors for an exact
    * cosine re-rank to the final top-5. The oracle extends the shared
    * IVF-PQ replay with the widened candidate cut and the exact re-rank,
    * so quantization-error repair is itself hash-checked.
    */
  val qIvfPqRefine: GQuery = GQuery(
    "q_ann_ivfpq_refine",
    Some(ivfPqScoredCtes + """,
      refine AS (
        SELECT qid, id FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY adc_score DESC, id) AS rank
          FROM scored) r
        WHERE rank <= 15),
      exact AS (
        SELECT rf.qid, rf.id,
               list_sum(list_transform(generate_series(1, 64),
                        i -> qv.e[i] * dv.e[i])) / (qv.nrm * dv.nrm) AS cos_sim
        FROM refine rf
        JOIN cv qv ON qv.vec_id = rf.qid
        JOIN cv dv ON dv.vec_id = rf.id)
      SELECT qid, id, round(cos_sim, 6) AS cos_sim, CAST(rank AS INT) AS rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY cos_sim DESC, id) AS rank
        FROM exact) r
      WHERE rank <= 5
      ORDER BY qid, rank""")
  ) { (spark, dir) =>
    import spark.implicits._
    val emb = t(spark, dir).embeddings
    val coarse = Similarity.labelCodebook(emb, "label", "embedding")
    val cbs = Similarity.pqCodebooks(emb, "label", "embedding", dim = 64, m = 4)
    Similarity
      .ivfPqRefineTopK(
        emb, emb.filter($"vec_id" < 4).select($"vec_id".as("qid"), $"embedding"),
        "vec_id", "qid", "embedding", coarse, cbs,
        dim = 64, k = 5, nProbe = 3, refineFactor = 3, exactSums = true)
      .select($"qid", $"id", round($"cos_sim", 6).as("cos_sim"), $"rank")
      .orderBy($"qid", $"rank")
  }

  /** Sign-bit binarization ([[graft.operators.Embeddings.signWords]]): the
    * packed 32-bit words for every vector, hash-checked bit-for-bit — the
    * oracle rebuilds each word with an integer bit_or aggregate over
    * unnested dimensions, so any packing/endianness/threshold drift
    * mismatches. The 32× compression stage of the Hamming ANN path.
    */
  val qBinary: GQuery = GQuery(
    "q_embed_binary",
    Some("""
      WITH pos AS (SELECT unnest(generate_series(0, 63)) AS j),
      bits AS (
        SELECT e.vec_id, j // 32 AS w,
               CASE WHEN e.embedding[j + 1] > 0 THEN (1::BIGINT << (j % 32))
                    ELSE 0::BIGINT END AS b
        FROM embeddings e, pos),
      words AS (SELECT vec_id, w, bit_or(b) AS word FROM bits GROUP BY 1, 2)
      SELECT CAST(vec_id AS BIGINT) AS vec_id,
             MAX(CASE WHEN w = 0 THEN word END) AS w0,
             MAX(CASE WHEN w = 1 THEN word END) AS w1
      FROM words GROUP BY 1 ORDER BY vec_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).embeddings
      .select(
        $"vec_id".cast("long").as("vec_id"),
        graft.operators.Embeddings.signWords($"embedding", 64).as("words")
      )
      .select(
        $"vec_id",
        element_at($"words", 1).as("w0"),
        element_at($"words", 2).as("w1")
      )
      .orderBy($"vec_id")
  }

  /** Exact Hamming top-10 over the binarized corpus
    * ([[Similarity.hammingTopK]]): integer distances + id tie-break make
    * the FULL ranking deterministic, so unlike cosine ANN this approximate
    * *representation* still gets an exact hash-checked oracle — DuckDB
    * replays popcount(xor) word-for-word. SimilaritySpec holds the
    * recall-vs-cosine contract that makes the 32×-compressed scan useful.
    */
  val qHamming: GQuery = GQuery(
    "q_ann_hamming",
    Some("""
      WITH pos AS (SELECT unnest(generate_series(0, 63)) AS j),
      bits AS (
        SELECT e.vec_id, j // 32 AS w,
               CASE WHEN e.embedding[j + 1] > 0 THEN (1::BIGINT << (j % 32))
                    ELSE 0::BIGINT END AS b
        FROM embeddings e, pos),
      wrd AS (SELECT vec_id, w, bit_or(b) AS word FROM bits GROUP BY 1, 2),
      words AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
                       MAX(CASE WHEN w = 0 THEN word END) AS w0,
                       MAX(CASE WHEN w = 1 THEN word END) AS w1
                FROM wrd GROUP BY 1),
      q AS (SELECT * FROM words WHERE vec_id < 8),
      scored AS (
        SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
               CAST(bit_count(xor(q.w0, v.w0)) + bit_count(xor(q.w1, v.w1)) AS BIGINT) AS hamming
        FROM q JOIN words v ON q.vec_id != v.vec_id),
      ranked AS (
        SELECT query_id, neighbor_id, hamming,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY hamming, neighbor_id) AS rank
        FROM scored)
      SELECT query_id, neighbor_id, hamming, CAST(rank AS BIGINT) AS rank
      FROM ranked WHERE rank <= 10
      ORDER BY query_id, rank""")
  ) { (spark, dir) =>
    import spark.implicits._
    val emb = t(spark, dir).embeddings
    Similarity
      .hammingTopK(emb, emb.filter($"vec_id" < 8), "vec_id", "embedding", 10, 64)
      .orderBy($"query_id", $"rank")
  }

  /** Johnson–Lindenstrauss random projection 64 → 16 dims
    * ([[graft.operators.Embeddings.randomProject]]): every output
    * coordinate is an exact integer Rademacher sign-dot over the
    * floor(x·2^20) quantization, so the full projected matrix — and its
    * JL-normalized double form — hash-matches the oracle's replay of the
    * same md5-derived sign matrix. The 4× dimensionality cut that fronts
    * any O(n·d) similarity pass at corpus scale.
    */
  val qRandomProjection: GQuery = GQuery(
    "q_embed_random_projection",
    Some("""
      WITH qv AS (
        SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS q
        FROM embeddings),
      dots AS (
        SELECT vec_id, k,
               CAST(list_sum(list_transform(generate_series(1, 64),
                 d -> (CASE WHEN (('0x' || substr(md5('rp|' || k::VARCHAR || '|' || (d-1)::VARCHAR), 1, 16))::UBIGINT & 1) = 1
                            THEN 1 ELSE -1 END) * q[d])) AS BIGINT) AS proj
        FROM qv CROSS JOIN range(16) rk(k))
      SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(k AS BIGINT) AS k, proj,
             CAST(proj AS DOUBLE) / (1048576.0 * sqrt(16.0)) AS y
      FROM dots ORDER BY vec_id, k""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).embeddings
      .select(
        $"vec_id".cast("long").as("vec_id"),
        posexplode(graft.operators.Embeddings.randomProject($"embedding", 16, 64)).as(Seq("k", "proj"))
      )
      .select(
        $"vec_id",
        $"k".cast("long").as("k"),
        $"proj",
        graft.operators.Embeddings.rpScale($"proj", 16).as("y")
      )
      .orderBy($"vec_id", $"k")
  }

  /** MMR diversified top-5 ([[graft.operators.Similarity.mmrRerank]],
    * λ=0.5 over top-12 brute-force candidates, 4 queries). The oracle
    * unrolls all five greedy rounds — relevance argmax, then four rounds
    * of `0.5·rel − 0.5·max-sim-to-selected` argmax with id tie-breaks —
    * so the hash match proves every selection decision, not just the
    * final membership. (Rounds generated programmatically below: one
    * formulation, five instantiations.)
    */
  val qMmr: GQuery = {
    val mmrSteps = (2 to 5).map { s =>
      s"""
      ms$s AS (
        SELECT p.query_id, p.a_id AS neighbor_id, MAX(p.sim) AS max_sim
        FROM psim p JOIN sel${s - 1} s ON p.query_id = s.query_id AND p.b_id = s.neighbor_id
        WHERE NOT EXISTS (SELECT 1 FROM sel${s - 1} x
                          WHERE x.query_id = p.query_id AND x.neighbor_id = p.a_id)
        GROUP BY p.query_id, p.a_id),
      p$s AS (
        SELECT query_id, neighbor_id, $s AS sel_rank
        FROM (SELECT m.query_id, m.neighbor_id,
                     ROW_NUMBER() OVER (PARTITION BY m.query_id
                                        ORDER BY (c.rel * 0.5 - m.max_sim * 0.5) DESC,
                                                 m.neighbor_id) AS rk
              FROM ms$s m JOIN cand c
                ON c.query_id = m.query_id AND c.neighbor_id = m.neighbor_id)
        WHERE rk = 1),
      sel$s AS (SELECT * FROM sel${s - 1} UNION ALL SELECT * FROM p$s)"""
    }.mkString(",")
    GQuery(
      "q_ann_mmr",
      Some(s"""
      WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings),
      q AS (SELECT * FROM v WHERE vec_id < 4),
      scored AS (
        SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
               list_sum(list_transform(generate_series(1, 64), i -> q.e[i] * v.e[i]))
                 / (q.nrm * v.nrm) AS rel
        FROM q JOIN v ON q.vec_id != v.vec_id),
      cand AS (
        SELECT query_id, neighbor_id, rel
        FROM (SELECT query_id, neighbor_id, rel,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY rel DESC, neighbor_id) AS rk
              FROM scored)
        WHERE rk <= 12),
      psim AS (
        SELECT a.query_id, a.neighbor_id AS a_id, b.neighbor_id AS b_id,
               list_sum(list_transform(generate_series(1, 64), i -> va.e[i] * vb.e[i]))
                 / (va.nrm * vb.nrm) AS sim
        FROM cand a
        JOIN cand b ON a.query_id = b.query_id AND a.neighbor_id != b.neighbor_id
        JOIN v va ON va.vec_id = a.neighbor_id
        JOIN v vb ON vb.vec_id = b.neighbor_id),
      sel1 AS (
        SELECT query_id, neighbor_id, 1 AS sel_rank
        FROM (SELECT query_id, neighbor_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY rel DESC, neighbor_id) AS rk
              FROM cand)
        WHERE rk = 1),$mmrSteps
      SELECT query_id, neighbor_id, sel_rank
      FROM sel5
      ORDER BY query_id, sel_rank""")
    ) { (spark, dir) =>
      import spark.implicits._
      val emb = t(spark, dir).embeddings
      Similarity
        .mmrRerank(emb, emb.filter($"vec_id" < 4), "vec_id", "embedding",
          m = 12, k = 5, lambda = 0.5)
        .orderBy($"query_id", $"sel_rank")
    }
  }

  /** Distributed PCA ([[graft.operators.Embeddings.pcaTopComponent]],
    * 6-round power iteration, 64 dims): one corpus pass builds the d²
    * fixed-point moment table, the iteration runs on the collected d×d
    * matrix, the direction broadcasts back for row-local projection. The
    * oracle replays EVERYTHING — per-dim means, the floor(·10⁹) covariance
    * sums, all six mat-vec/normalize rounds at floor(·10¹²), and each
    * vector's pinned projection — so the hash match proves the whole
    * eigensolver, not just its output shape. Every round CTE is
    * MATERIALIZED (iterative-chain rule).
    */
  val qPca: GQuery = {
    val pcaRounds = 6
    val roundCtes = (1 to pcaRounds).map { r =>
      s"""
      t$r AS MATERIALIZED (
        SELECT c.i,
               CAST(SUM(CAST(floor(c.val * v.val * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS val
        FROM c JOIN v${r - 1} v ON v.i = c.j GROUP BY c.i),
      n$r AS MATERIALIZED (
        SELECT sqrt(CAST(SUM(CAST(floor(val * val * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        FROM t$r),
      v$r AS MATERIALIZED (SELECT i, val / n$r.nrm AS val FROM t$r, n$r)"""
    }.mkString(",")
    GQuery(
      "q_embed_pca",
      Some(s"""
      WITH x AS MATERIALIZED (
        SELECT vec_id, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v
        FROM embeddings),
      mu AS MATERIALIZED (
        SELECT i.i - 1 AS i,
               CAST(SUM(CAST(x.v[i.i] AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS m
        FROM x, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) i
        GROUP BY 1),
      cent AS MATERIALIZED (
        SELECT x.vec_id, i.i - 1 AS i, x.v[i.i] - mu.m AS c
        FROM x, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) i
        JOIN mu ON mu.i = i.i - 1),
      cov AS MATERIALIZED (
        SELECT a.i AS i, b.i AS j,
               CAST(SUM(CAST(floor(a.c * b.c * 1e9) AS BIGINT)) AS BIGINT) AS s
        FROM cent a JOIN cent b ON a.vec_id = b.vec_id GROUP BY 1, 2),
      nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM x),
      c AS MATERIALIZED (SELECT i, j, CAST(s AS DOUBLE) / 1e9 / nn.n AS val FROM cov, nn),
      v0 AS MATERIALIZED (
        SELECT i, CAST(1 AS DOUBLE) / sqrt(CAST(64 AS DOUBLE)) AS val FROM mu),$roundCtes
      SELECT cent.vec_id,
             round(CAST(SUM(CAST(floor(cent.c * v.val * 1e12) AS BIGINT)) AS DOUBLE) / 1e12,
                   6) AS pc1
      FROM cent JOIN v$pcaRounds v ON v.i = cent.i
      GROUP BY cent.vec_id
      ORDER BY vec_id""")
    ) { (spark, dir) =>
      import spark.implicits._
      graft.operators.Embeddings
        .pcaTopComponent(t(spark, dir).embeddings, "vec_id", "embedding",
          dim = 64, rounds = pcaRounds)
        .orderBy($"vec_id")
    }
  }

  /** Distributed Lloyd's k-means ([[Similarity.kmeansLloyd]], k = 8,
    * 3 rounds, 64 dims): full-corpus clustering where the ASSIGNMENTS are
    * the product. The oracle replays everything — md5-seeded init, each
    * round's argmin assignment (sequential-fold distances, (dist, j)
    * tie-break), the DECIMAL-pinned per-dim centroid means, empty-cluster
    * carry — so the hash match proves all three Lloyd iterations, per
    * vector. Round CTEs MATERIALIZED (iterative-chain rule).
    */
  /** The shared k-means oracle prelude: x (doubles), md5-seeded c0, and
    * `km` MATERIALIZED Lloyd rounds ending at centroid CTE c$km —
    * composed by both [[qKmeans]] and [[qSilhouette]] so the two oracles
    * replay the identical fit. */
  private def kmeansOracleCtes(km: Int): String = {
    val roundCtes = (1 to km).map { r =>
      s"""
      a$r AS MATERIALIZED (
        SELECT vec_id, j, dist FROM (
          SELECT vec_id, j, dist,
                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rk
          FROM (SELECT x.vec_id, c.j,
                       list_sum(list_transform(generate_series(1, 64),
                         i -> (x.v[i] - c.cv[i]) * (x.v[i] - c.cv[i]))) AS dist
                FROM x, c${r - 1} c))
        WHERE rk = 1),
      m$r AS MATERIALIZED (
        SELECT a.j, g.i - 1 AS dim,
               CAST(SUM(CAST(x.v[g.i] AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS m
        FROM a$r a JOIN x ON x.vec_id = a.vec_id,
             LATERAL (SELECT unnest(generate_series(1, 64)) AS i) g
        GROUP BY 1, 2),
      c$r AS MATERIALIZED (
        SELECT p.j, COALESCE(nl.cv, p.cv) AS cv
        FROM c${r - 1} p
        LEFT JOIN (SELECT j, list(m ORDER BY dim) AS cv FROM m$r GROUP BY j) nl
          ON nl.j = p.j)"""
    }.mkString(",")
    s"""
      WITH x AS MATERIALIZED (
        SELECT vec_id, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v
        FROM embeddings),
      c0 AS MATERIALIZED (
        SELECT ROW_NUMBER() OVER (ORDER BY md5(vec_id::VARCHAR || ':17'), vec_id) - 1 AS j,
               v AS cv
        FROM x
        ORDER BY md5(vec_id::VARCHAR || ':17'), vec_id
        LIMIT 8),$roundCtes"""
  }

  val qKmeans: GQuery = {
    val km = 3 // Lloyd rounds
    GQuery(
      "q_cluster_kmeans",
      Some(s"""${kmeansOracleCtes(km)}
      SELECT fin.vec_id, CAST(fin.j AS BIGINT) AS cluster, round(fin.dist, 6) AS dist
      FROM (
        SELECT vec_id, j, dist FROM (
          SELECT vec_id, j, dist,
                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, j) AS rk
          FROM (SELECT x.vec_id, c.j,
                       list_sum(list_transform(generate_series(1, 64),
                         i -> (x.v[i] - c.cv[i]) * (x.v[i] - c.cv[i]))) AS dist
                FROM x, c$km c))
        WHERE rk = 1) fin
      ORDER BY fin.vec_id""")
    ) { (spark, dir) =>
      import spark.implicits._
      Similarity
        .kmeansLloyd(t(spark, dir).embeddings, "vec_id", "embedding",
          dim = 64, k = 8, rounds = km, seed = 17)
        .orderBy($"vec_id")
    }
  }

  /** Cluster-quality audit: simplified silhouette
    * ([[Similarity.kmeansSilhouette]] — a = own-centroid distance,
    * b = nearest other centroid, s = (b−a)/max(a,b); the O(n·k)
    * centroid variant, since all-pairs silhouette is O(n²)) rolled up
    * per cluster. The oracle replays the ENTIRE fit through the shared
    * [[kmeansOracleCtes]] prelude — the hash match proves fit,
    * assignment, both distances and the roll-up.
    *
    * Portability: a and b are IEEE `sqrt` (correctly rounded → engine-
    * identical) of the same sequential folds the kmeans oracle already
    * hash-matches; per-row s is one subtract/divide chain; the ONLY
    * cross-row float aggregate goes through floor(1e6·s + 0.5)
    * micro-units (exact unordered BIGINT sums), and mean_silhouette is
    * a two-division chain over exact integers.
    */
  val qSilhouette: GQuery = {
    val km = 3
    GQuery(
      "q_cluster_silhouette",
      Some(s"""${kmeansOracleCtes(km)},
      dists AS MATERIALIZED (
        SELECT x.vec_id, c.j,
               sqrt(list_sum(list_transform(generate_series(1, 64),
                 i -> (x.v[i] - c.cv[i]) * (x.v[i] - c.cv[i])))) AS d
        FROM x, c$km c),
      fin AS MATERIALIZED (
        SELECT vec_id, j FROM (
          SELECT vec_id, j,
                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, j) AS rk
          FROM dists)
        WHERE rk = 1),
      s AS (
        SELECT f.vec_id, f.j,
               CASE WHEN greatest(own.d, oth.b) > 0
                    THEN (oth.b - own.d) / greatest(own.d, oth.b)
                    ELSE 0e0 END AS s
        FROM fin f
        JOIN dists own ON own.vec_id = f.vec_id AND own.j = f.j
        JOIN (SELECT d.vec_id, MIN(d.d) AS b
              FROM dists d JOIN fin f2 ON f2.vec_id = d.vec_id AND d.j <> f2.j
              GROUP BY 1) oth ON oth.vec_id = f.vec_id)
      SELECT CAST(j AS BIGINT) AS cluster,
             CAST(COUNT(*) AS BIGINT) AS n_vectors,
             CAST(SUM(CAST(floor(s * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sum_s_micro,
             CAST(SUM(CAST(floor(s * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6
               / CAST(COUNT(*) AS DOUBLE) AS mean_silhouette
      FROM s GROUP BY 1 ORDER BY cluster""")
    ) { (spark, dir) =>
      import spark.implicits._
      Similarity
        .kmeansSilhouette(t(spark, dir).embeddings, "vec_id", "embedding",
          dim = 64, k = 8, rounds = km, seed = 17)
        .select($"cluster", floor($"s" * 1e6 + 0.5).cast("long").as("sm"))
        .groupBy($"cluster")
        .agg(count(lit(1)).as("n_vectors"), sum($"sm").as("sum_s_micro"))
        .select($"cluster", $"n_vectors", $"sum_s_micro",
          ($"sum_s_micro".cast("double") / 1e6 / $"n_vectors".cast("double"))
            .as("mean_silhouette"))
        .orderBy($"cluster")
    }
  }

  /** kNN label-consistency screen (the confident-learning/noisy-label
    * detector): each vector's label is voted on by its top-10 cosine
    * neighbors AMONG vectors sharing its CORPUS-SCALED sign-LSH cell
    * ([[Similarity.knnGraphLsh]]), low agreement flags probable
    * mislabels. Round 8 re-planned the cells: the previous label-centroid
    * codebook had a CONSTANT cell count, so within-cell cosine compute
    * grew ~n²/cells even though shuffle stayed linear (ScaleStress
    * time-exponent 1.45 at the 10× tier); the plane count now grows with
    * the corpus (p = min planes with 512·2^p ≥ n — exact integer
    * arithmetic on both sides), bounding expected cell size and making
    * total compute ~n·512. The oracle replays the ENTIRE pipeline —
    * plane-count derivation, integer sign-dot bucket bits, within-cell
    * edges, per-source (cos DESC, dst) top-10 — so the celled vote
    * itself is hash-checked. Agreement is over the neighbors a vector
    * actually has (≤ 10 in small cells). An all-pairs brute-force
    * formulation would broadcast the whole corpus as the query side —
    * the 100 TB anti-pattern this replaced (SimilaritySpec keeps brute
    * force as the small-scale recall reference).
    */
  val qLabelConsistency: GQuery = GQuery(
    "q_quality_label_consistency",
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
        -- COALESCE: at p = 0 the series is empty and array_to_string([])
        -- is NULL in DuckDB — every vector shares the '' brute-force cell
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
        JOIN v vb ON vb.vec_id = b.vec_id),
      top10 AS (
        SELECT src, own, nl FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS rank
          FROM edges) r
        WHERE rank <= 10)
      SELECT src AS vec_id, CAST(own AS BIGINT) AS label,
             CAST(COUNT(*) AS BIGINT) AS n_nbrs,
             CAST(SUM(CASE WHEN nl = own THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
             round(CAST(SUM(CASE WHEN nl = own THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 6) AS agreement,
             CAST(SUM(CASE WHEN nl = own THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) < 0.3 AS flagged
      FROM top10
      GROUP BY src, own
      ORDER BY vec_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val emb = t(spark, dir).embeddings
    val labels = emb.select($"vec_id", $"label".cast("long").as("label"))
    Similarity
      .knnGraphLsh(emb, "vec_id", "embedding", k = 10)
      .join(labels.select($"vec_id".as("src"), $"label".as("own")), "src")
      .join(broadcast(labels.select($"vec_id".as("dst"), $"label".as("nl"))), "dst")
      .groupBy($"src", $"own")
      .agg(
        count(lit(1)).as("n_nbrs"),
        sum(when($"nl" === $"own", 1L).otherwise(0L)).as("n_agree"))
      .select(
        $"src".as("vec_id"), $"own".as("label"), $"n_nbrs", $"n_agree",
        round($"n_agree".cast("double") / $"n_nbrs".cast("double"), 6).as("agreement"),
        ($"n_agree".cast("double") / $"n_nbrs".cast("double") < 0.3).as("flagged"))
      .orderBy($"vec_id")
  }

  /** Cell-balance audit of the corpus-scaled sign-LSH index — the
    * index-health number behind the knnGraphLsh family: the cell-size
    * histogram plus max/expected imbalance. A heavy tail here is
    * exactly the hot-cell regime [[graft.operators.Similarity.cappedCellSides]]
    * caps; this query is the MONITOR for it (run it before trusting the
    * celled kNN's recall, and after any embedding-model change).
    *
    * Scale shape: one scan to (cell → count), a bounded histogram
    * aggregate over the count table, a 1-row summary broadcast back.
    * The oracle replays the exact plane-count derivation and integer
    * sign-dot cells (the q_ann_hard_negatives cells CTE); cell identity
    * is internal (bit-string vs long bucket — bijective), the HISTOGRAM
    * is the contract.
    */
  val qCellBalance: GQuery = GQuery(
    "q_ann_cell_balance",
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
      cells AS (
        SELECT vec_id,
               COALESCE(array_to_string(list_transform(generate_series(1, (SELECT p FROM params)),
                 pp -> CASE WHEN list_sum(list_transform(generate_series(1, 64),
                         d -> (CASE WHEN (('0x' || substr(md5('0|' || (pp-1)::VARCHAR || '|' || (d-1)::VARCHAR), 1, 16))::UBIGINT & 1) = 1
                                    THEN 1 ELSE -1 END) * q[d])) > 0
                       THEN '1' ELSE '0' END), ''), '') AS cell
        FROM qv),
      cc AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS sz FROM cells GROUP BY cell),
      hist AS (SELECT sz AS cell_size, CAST(COUNT(*) AS BIGINT) AS n_cells
               FROM cc GROUP BY sz),
      summ AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS total_cells,
               CAST(SUM(sz) AS BIGINT) AS n_vecs,
               CAST(MAX(sz) AS BIGINT) AS max_size
        FROM cc)
      SELECT h.cell_size, h.n_cells,
             CAST(params.p AS BIGINT) AS planes,
             s.total_cells, s.max_size,
             round(CAST(s.max_size AS DOUBLE) * CAST(s.total_cells AS DOUBLE)
                   / CAST(s.n_vecs AS DOUBLE), 6) AS imbalance
      FROM hist h CROSS JOIN summ s CROSS JOIN params
      ORDER BY h.cell_size""")
  ) { (spark, dir) =>
    import spark.implicits._
    val emb = t(spark, dir).embeddings
    val p = Similarity.lshCellPlanes(emb.count(), 512)
    val cell =
      if (p == 0) lit(0L)
      else element_at(graft.functions.GraftFunctions.lshBuckets($"embedding", 1, p, 64), 1)
    val cc = emb
      .select($"vec_id", cell.as("cell"))
      .groupBy($"cell").agg(count(lit(1)).as("sz"))
      .ckptLazy()
    val hist = cc.groupBy($"sz".as("cell_size")).agg(count(lit(1)).as("n_cells"))
    val summ = cc.agg(
      count(lit(1)).as("total_cells"),
      sum($"sz").as("n_vecs"),
      max($"sz").as("max_size"))
    hist.crossJoin(broadcast(summ))
      .select($"cell_size", $"n_cells",
        lit(p.toLong).as("planes"),
        $"total_cells", $"max_size",
        round($"max_size".cast("double") * $"total_cells".cast("double")
          / $"n_vecs".cast("double"), 6).as("imbalance"))
      .orderBy($"cell_size")
  }

  /** Local outlier factor (Breunig et al. 2000) over the celled kNN
    * graph ([[Similarity.knnGraphLsh]], k = 10) — the DENSITY-relative
    * embedding-space outlier detector (a point far from its neighbors
    * relative to how far THEY are from theirs), the curation screen
    * that a plain k-distance cut misses in mixed-density corpora.
    * Top 20 by LOF.
    *
    * All-integer pipeline after one quantization (the deterministic-
    * serving convention): cosine distance → micro units (floor of
    * engine-identical doubles), k-distance = max neighbor distance
    * (integer order statistic), reachability = greatest(kdist(o), d),
    * lrd = (cnt·10¹⁵) div Σreach (exact integer division; Σreach ≥ 1
    * guard documents the identical-vector clique as max density), and
    * the final LOF is ONE division of exact integers. Every dst is
    * guaranteed its own kdist/lrd: a vector appears as a neighbor only
    * if its cell kept ≥ 2 members, which gives it ≥ 1 neighbor of its
    * own — so the inner joins drop nobody.
    *
    * Scale shape: inherits the capped-cell discipline (probe side never
    * capped, md5-rank b-side cap); everything after the kNN graph is
    * O(n·k) joins on the src key. Oracle: the q_graph_knn replay chain
    * (planes, integer sign-dot cells, cap, ranked edges) extended by
    * the three integer roll-ups.
    */
  val qLof: GQuery = GQuery(
    "q_outlier_lof",
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
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings),
      edges AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               list_sum(list_transform(generate_series(1, 64),
                        i -> va.e[i] * vb.e[i])) / (va.nrm * vb.nrm) AS s
        FROM cells a
        JOIN bkeep b ON a.cell = b.cell AND a.vec_id <> b.vec_id
        JOIN v va ON va.vec_id = a.vec_id
        JOIN v vb ON vb.vec_id = b.vec_id),
      knn AS MATERIALIZED (
        SELECT src, dst, CAST(floor((1e0 - s) * 1e6 + 0.5) AS BIGINT) AS dm FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY src ORDER BY s DESC, dst) AS rank
          FROM edges) r
        WHERE rank <= 10),
      kd AS MATERIALIZED (
        SELECT src, CAST(MAX(dm) AS BIGINT) AS kdist, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM knn GROUP BY 1),
      reach AS (
        SELECT k.src, greatest(kdo.kdist, k.dm) AS reach
        FROM knn k JOIN kd kdo ON kdo.src = k.dst),
      lrd AS MATERIALIZED (
        SELECT r.src, kd.cnt, kd.kdist,
               (kd.cnt * 1000000000000000) // greatest(CAST(SUM(r.reach) AS BIGINT), 1) AS lrd_nano
        FROM reach r JOIN kd ON kd.src = r.src
        GROUP BY r.src, kd.cnt, kd.kdist)
      SELECT k.src AS vec_id, l.cnt AS n_neighbors, l.kdist AS kdist_micro,
             l.lrd_nano,
             CAST(SUM(lo.lrd_nano) AS DOUBLE)
               / CAST(l.cnt * l.lrd_nano AS DOUBLE) AS lof
      FROM knn k
      JOIN lrd lo ON lo.src = k.dst
      JOIN lrd l ON l.src = k.src
      GROUP BY k.src, l.cnt, l.kdist, l.lrd_nano
      ORDER BY lof DESC, vec_id
      LIMIT 20""")
  ) { (spark, dir) =>
    import spark.implicits._
    val knn = Similarity
      .knnGraphLsh(t(spark, dir).embeddings, "vec_id", "embedding", k = 10)
      .select($"src", $"dst",
        floor((lit(1.0) - $"cos_sim") * 1e6 + 0.5).cast("long").as("dm"))
      .ckptLazy() // feeds kdist + the two neighbor joins
    val kd = knn.groupBy($"src")
      .agg(max($"dm").as("kdist"), count(lit(1)).as("cnt"))
      .ckptLazy() // joined back twice (own row + per-neighbor)
    val reach = knn
      .join(kd.select($"src".as("dst"), $"kdist".as("kdist_o")), Seq("dst"))
      .select($"src", greatest($"kdist_o", $"dm").as("reach"))
    val lrd = reach.groupBy($"src").agg(sum($"reach").as("rsum"))
      .join(kd, Seq("src"))
      .select($"src", $"cnt", $"kdist",
        expr("(cnt * 1000000000000000L) div greatest(rsum, 1L)").as("lrd_nano"))
      .ckptLazy() // joined back twice (own row + per-neighbor)
    knn.join(lrd.select($"src".as("dst"), $"lrd_nano".as("lrd_o")), Seq("dst"))
      .groupBy($"src").agg(sum($"lrd_o").as("sum_lrd"))
      .join(lrd, Seq("src"))
      .select($"src".as("vec_id"), $"cnt".as("n_neighbors"),
        $"kdist".as("kdist_micro"), $"lrd_nano",
        ($"sum_lrd".cast("double") / ($"cnt" * $"lrd_nano").cast("double")).as("lof"))
      .orderBy($"lof".desc, $"vec_id")
      .limit(20)
  }

  private val KcenterRounds = 7 // centers beyond the seed (8 total)

  /** Greedy k-center coreset over the embedding corpus (Gonzalez 1985
    * farthest-point traversal): seed with the min-id vector, then 7×
    * pick the point FARTHEST from its nearest chosen center — the
    * 2-approximation coverage skeleton a curation pipeline uses to pick
    * maximally-diverse exemplars (the diversity dual of [[qKmeans]]'
    * density seeking). Emits each round's center and the coverage
    * radius it closed (the max-min distance at selection time — the
    * monotone non-increasing curve that tells you when diversity
    * saturates).
    *
    * Portability: every distance is the same sequential 64-dim
    * `(x−c)²` fold both engines evaluate in index order (the
    * q_ann_bruteforce list_sum convention), dmin chains through
    * `least` — so the argmax row and its RAW double radius are
    * bit-reproducible; ties break to the lower vec_id. Scale shape:
    * k bounded scans, each corpus-linear (one 1-row argmax per round,
    * the farthest-point analog of the IVF seeding pass); the oracle
    * unrolls the same k rounds as chained materialized CTEs.
    */
  val qKcenter: GQuery = GQuery(
    "q_sample_kcenter",
    Some {
      val dist = (p: String, c: String) =>
        s"list_sum(list_transform(generate_series(1, 64), i -> ($p.e[i] - $c.e[i]) * ($p.e[i] - $c.e[i])))"
      val rounds = (1 to KcenterRounds).map { r =>
        s"""
      c$r AS MATERIALIZED (
        SELECT vec_id, e, dmin FROM m${r - 1} ORDER BY dmin DESC, vec_id LIMIT 1),
      m$r AS MATERIALIZED (
        SELECT p.vec_id, p.e, least(p.dmin, ${dist("p", "c")}) AS dmin
        FROM m${r - 1} p CROSS JOIN c$r c)"""
      }.mkString(",")
      val centers = (1 to KcenterRounds)
        .map(r => s"SELECT $r AS round, vec_id AS center_id, dmin AS radius FROM c$r")
        .mkString(" UNION ALL ")
      s"""
      WITH v AS MATERIALIZED (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings),
      c0 AS MATERIALIZED (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT 1),
      m0 AS MATERIALIZED (
        SELECT p.vec_id, p.e, ${dist("p", "c")} AS dmin
        FROM v p CROSS JOIN c0 c),
      $rounds
      SELECT * FROM (
        SELECT 0 AS round, vec_id AS center_id, CAST(NULL AS DOUBLE) AS radius FROM c0
        UNION ALL $centers)
      ORDER BY round"""
    }
  ) { (spark, dir) =>
    import spark.implicits._
    val v = t(spark, dir).embeddings
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("e"))
      .ckptLazy() // scanned once per round
    def distTo(c: Array[Double]) = {
      val cLit = array(c.map(lit): _*)
      aggregate(zip_with($"e", cLit, (x, m) => (x - m) * (x - m)),
        lit(0.0), (acc, t) => acc + t)
    }
    val seed = v.orderBy($"vec_id").limit(1)
      .select($"vec_id", $"e").collect()(0)
    var centers = List((0, seed.getLong(0), Option.empty[Double]))
    var pts = v.withColumn("dmin", distTo(seed.getSeq[Double](1).toArray))
      .ckptLazy()
    for (r <- 1 to KcenterRounds) {
      val far = pts.orderBy($"dmin".desc, $"vec_id").limit(1)
        .select($"vec_id", $"e", $"dmin").collect()(0)
      centers ::= ((r, far.getLong(0), Some(far.getDouble(2))))
      pts = pts.withColumn("dmin",
        least($"dmin", distTo(far.getSeq[Double](1).toArray)))
        .ckptLazy()
    }
    centers.reverse
      .toDF("round", "center_id", "radius")
      .orderBy($"round")
  }

  override def queries: Seq[GQuery] =
    Seq(qBruteForce, qLsh, qCentroid, qIvf, qNormalize, qQuantize, qPq, qAnnPq, qKnnGraph,
      qKnnGraphProbe, qRecallProbeLift,
      qRecallAudit, qSemCluster, qIvfPq, qIvfPqRefine, qBinary, qHamming, qRandomProjection, qMmr,
      qPca, qKmeans, qLabelConsistency, qCellBalance, qSilhouette, qLof, qKcenter)
}
