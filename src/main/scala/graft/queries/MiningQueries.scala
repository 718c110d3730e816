package graft.queries

import graft.engine.PlanOnly.syntax._

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Common._

/** Round-10 mining & decision operators: market-basket association rules,
  * item-item collaborative filtering, hybrid-retrieval rank fusion, Pareto
  * skyline, split conformal prediction, t-closeness, multi-touch
  * attribution, and Theil–Sen robust trend.
  *
  * Reference analog: none — callysto leaves all analytics to user closures
  * (SURVEY §2.5); these are the batch decision/mining operators a curation
  * pipeline runs on top of the dedup/quality stack, each with a DuckDB
  * oracle. Portability: every hash-compared double here is either an exact
  * integer ratio, a DECIMAL-sum cast, or a fixed-order `+ − × ÷ sqrt`
  * chain over such values — IEEE-deterministic cross-engine (PARITY.md
  * rounding convention); no `ln/exp/pow` output lands in a compared cell.
  */
object MiningQueries extends QuerySet {

  /** Frequent-itemset pairs + association rules over order baskets
    * (basket = order, item = part brand): support, confidence, lift — the
    * a-priori 2-itemset tier of market-basket analysis.
    *
    * Scale shape: the pair generator is a self-equi-join on the basket
    * key, and basket width is intrinsically bounded (an order has at most
    * a handful of distinct brands), so candidate pairs grow LINEARLY in
    * orders — no df-cap needed (contrast the customer-keyed itemcf join
    * below, which does need one). Supports and the basket total are plain
    * pre-aggregated groupBys; the min-support gate is the integer
    * cross-multiplication `supp_ab * 50 >= n_baskets` (2%), so no division
    * result is ever compared for filtering. Confidence and lift are exact
    * integer-ratio doubles with the association order pinned identically
    * on both engines.
    */
  val qItemsets: GQuery = GQuery(
    "q_agg_itemsets",
    Some("""
      WITH b AS (SELECT DISTINCT l.l_orderkey AS bk, p.p_brand AS item
                 FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      n AS (SELECT CAST(COUNT(DISTINCT bk) AS BIGINT) AS n_baskets FROM b),
      s AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS supp FROM b GROUP BY 1),
      pr AS (SELECT a.item AS item_a, c.item AS item_b, CAST(COUNT(*) AS BIGINT) AS supp_ab
             FROM b a JOIN b c ON a.bk = c.bk AND a.item < c.item GROUP BY 1, 2)
      SELECT pr.item_a, pr.item_b, pr.supp_ab, sa.supp AS supp_a, sb.supp AS supp_b,
             CAST(pr.supp_ab AS DOUBLE) / CAST(sa.supp AS DOUBLE) AS confidence,
             (CAST(pr.supp_ab AS DOUBLE) * CAST(n.n_baskets AS DOUBLE)) /
             (CAST(sa.supp AS DOUBLE) * CAST(sb.supp AS DOUBLE)) AS lift
      FROM pr JOIN s sa ON pr.item_a = sa.item JOIN s sb ON pr.item_b = sb.item CROSS JOIN n
      WHERE pr.supp_ab * 50 >= n.n_baskets
      ORDER BY item_a, item_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tb = t(spark, dir)
    val b = tb.lineitem
      .join(tb.part, $"l_partkey" === $"p_partkey")
      .select($"l_orderkey".as("bk"), $"p_brand".as("item"))
      .distinct()
    val nBaskets = b.agg(countDistinct($"bk").as("n_baskets"))
    val s = b.groupBy($"item").agg(count(lit(1)).as("supp"))
    val pr = b.as("a")
      .join(b.as("c"), $"a.bk" === $"c.bk" && $"a.item" < $"c.item")
      .groupBy($"a.item".as("item_a"), $"c.item".as("item_b"))
      .agg(count(lit(1)).as("supp_ab"))
    pr.join(broadcast(s.as("sa")), $"item_a" === $"sa.item")
      .join(broadcast(s.as("sb")), $"item_b" === $"sb.item")
      .crossJoin(broadcast(nBaskets))
      .filter($"supp_ab" * 50 >= $"n_baskets")
      .select(
        $"item_a", $"item_b", $"supp_ab",
        $"sa.supp".as("supp_a"), $"sb.supp".as("supp_b"),
        ($"supp_ab".cast("double") / $"sa.supp".cast("double")).as("confidence"),
        (($"supp_ab".cast("double") * $"n_baskets".cast("double")) /
          ($"sa.supp".cast("double") * $"sb.supp".cast("double"))).as("lift"))
      .orderBy($"item_a", $"item_b")
  }

  /** Item-item collaborative filtering: top-5 co-purchase neighbors per
    * part, scored by cosine over the binary customer-purchase vectors
    * (co / (√n_a · √n_b)) — the classic "customers who bought X also
    * bought Y" recommender precompute.
    *
    * Scale shape: the pair generator is keyed on CUSTOMER, whose basket is
    * NOT intrinsically bounded (a wholesale account at 100 TB buys
    * millions of parts), so the repo's hot-key cap discipline applies:
    * each customer's basket is truncated to 30 parts by md5-rank (the
    * [[graft.operators.Similarity.cappedCellSides]] recipe — deterministic,
    * replayed verbatim in the oracle), bounding pairs at C(30,2) per
    * customer → linear in customers. This is an ANALYTICS query, not an
    * admission gate, so the cap needs no exact-fingerprint fallback
    * (CLAUDE.md cap-inversion rule). Cosine is `÷` over `sqrt` of exact
    * counts (IEEE-correctly-rounded on every engine); the per-item top-5
    * rank plans as map-side WindowGroupLimit.
    */
  val qItemCf: GQuery = GQuery(
    "q_rec_itemcf",
    Some("""
      WITH ub AS (SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS i
                  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      cap AS (SELECT u, i FROM (
                SELECT u, i, row_number() OVER (PARTITION BY u
                       ORDER BY md5(CAST(u AS VARCHAR) || ':' || CAST(i AS VARCHAR)), i) AS rn
                FROM ub) WHERE rn <= 30),
      ni AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n_i FROM cap GROUP BY 1),
      co AS (SELECT a.i AS ia, c.i AS ib, CAST(COUNT(*) AS BIGINT) AS co
             FROM cap a JOIN cap c ON a.u = c.u AND a.i < c.i GROUP BY 1, 2),
      sym AS (SELECT ia AS item, ib AS nb, co FROM co UNION ALL SELECT ib, ia, co FROM co),
      sc AS (SELECT s.item, s.nb, s.co,
                    CAST(s.co AS DOUBLE) / (sqrt(CAST(na.n_i AS DOUBLE)) * sqrt(CAST(nbi.n_i AS DOUBLE))) AS cos_sim
             FROM sym s JOIN ni na ON s.item = na.i JOIN ni nbi ON s.nb = nbi.i),
      rk AS (SELECT item, nb, co, cos_sim,
                    row_number() OVER (PARTITION BY item ORDER BY cos_sim DESC, nb) AS rank
             FROM sc)
      SELECT CAST(item AS BIGINT) AS item, CAST(nb AS BIGINT) AS neighbor,
             co AS co_count, cos_sim, CAST(rank AS BIGINT) AS rank
      FROM rk WHERE rank <= 5 ORDER BY item, rank""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tb = t(spark, dir)
    val ub = tb.orders
      .join(tb.lineitem, $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("u"), $"l_partkey".as("i"))
      .distinct()
    val wCap = Window.partitionBy($"u")
      .orderBy(md5(concat($"u".cast("string"), lit(":"), $"i".cast("string"))), $"i")
    // localCheckpoint the CAPPED basket (tiny: ≤30 rows/customer) — it
    // feeds ni + both self-join sides, and Spark shares no subtrees
    // across those consumers, so without materialization the
    // scan→join→distinct→cap pipeline runs 3× at full cost
    // (plan-audited round 10). The big pair table is NOT checkpointed:
    // symmetrization is a 2-row explode on the single co pass instead
    // of a union of two co reads — same rows, one pair join.
    val cap = ub.withColumn("rn", row_number().over(wCap)).filter($"rn" <= 30).drop("rn")
      .ckptLazy()
    val ni = cap.groupBy($"i").agg(count(lit(1)).as("n_i"))
    val co = cap.as("a")
      .join(cap.as("c"), $"a.u" === $"c.u" && $"a.i" < $"c.i")
      .groupBy($"a.i".as("ia"), $"c.i".as("ib"))
      .agg(count(lit(1)).as("co"))
    val sym = co.select(explode(array(
        struct($"ia".as("item"), $"ib".as("nb")),
        struct($"ib".as("item"), $"ia".as("nb")))).as("p"), $"co")
      .select($"p.item".as("item"), $"p.nb".as("nb"), $"co")
    val sc = sym.as("s")
      .join(ni.as("na"), $"s.item" === $"na.i")
      .join(ni.as("nbi"), $"s.nb" === $"nbi.i")
      .select($"s.item", $"s.nb", $"s.co",
        ($"s.co".cast("double") /
          (sqrt($"na.n_i".cast("double")) * sqrt($"nbi.n_i".cast("double")))).as("cos_sim"))
    val wRank = Window.partitionBy($"item").orderBy($"cos_sim".desc, $"nb")
    sc.withColumn("rank", row_number().over(wRank).cast("long"))
      .filter($"rank" <= 5)
      .select($"item".cast("long").as("item"), $"nb".cast("long").as("neighbor"),
        $"co".as("co_count"), $"cos_sim", $"rank")
      .orderBy($"item", $"rank")
  }

  /** Hybrid-retrieval rank fusion (RRF): fuse a lexical ranking (integer
    * query-term hit counts over `documents`) and a semantic ranking
    * (cosine vs the vec_id-0 query vector over `embeddings`) with
    * reciprocal-rank fusion, score = Σ 1/(60 + rank) — the standard
    * hybrid-search reranker in retrieval pipelines.
    *
    * Scale shape: each side reduces to its global top-100 via
    * orderBy+limit (TakeOrderedAndProject — map-side partial top-k, no
    * global sort); rank assignment then runs on the two 100-row candidate
    * lists (the bounded-window class — the `limit` sits directly below,
    * see PlanSpec allowlist), followed by a tiny full-outer join. RRF
    * terms are exact divisions of small ints summed in a fixed two-term
    * order — bit-portable. Rank ties inside each list are broken by
    * doc_id; the residual exposure (two cosine scores <1 ulp apart AND
    * rank-adjacent) is the same one q_ann_bruteforce documents.
    */
  val qRankFusion: GQuery = GQuery(
    "q_text_rank_fusion",
    Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      lex AS (SELECT doc_id, CAST(len(list_filter(toks, t -> t IN ('dup','spark','window'))) AS BIGINT) AS hits FROM d),
      ltop AS (SELECT * FROM (SELECT doc_id, hits,
                                     CAST(row_number() OVER (ORDER BY hits DESC, doc_id) AS BIGINT) AS r_lex
                              FROM lex) WHERE r_lex <= 100),
      v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
                   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
            FROM embeddings),
      q AS (SELECT e AS qe, nrm AS qn FROM v WHERE vec_id = 0),
      sem AS (SELECT v.vec_id AS doc_id,
                     list_sum(list_transform(generate_series(1, 64), i -> q.qe[i] * v.e[i])) / (q.qn * v.nrm) AS score
              FROM v CROSS JOIN q WHERE v.vec_id <> 0),
      stop_ AS (SELECT * FROM (SELECT doc_id,
                                      CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r_sem
                               FROM sem) WHERE r_sem <= 100),
      fused AS (SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
                       COALESCE(l.r_lex, 0) AS r_lex,
                       COALESCE(s.r_sem, 0) AS r_sem,
                       (CASE WHEN l.doc_id IS NULL THEN 0.0 ELSE 1.0 / (60.0 + CAST(l.r_lex AS DOUBLE)) END)
                     + (CASE WHEN s.doc_id IS NULL THEN 0.0 ELSE 1.0 / (60.0 + CAST(s.r_sem AS DOUBLE)) END) AS rrf
                FROM ltop l FULL OUTER JOIN stop_ s ON l.doc_id = s.doc_id)
      SELECT doc_id, r_lex, r_sem, rrf
      FROM fused ORDER BY rrf DESC, doc_id LIMIT 20""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tb = t(spark, dir)
    val lex = tb.documents.select(
      $"doc_id",
      expr("cast(size(filter(split(text, ' '), t -> t IN ('dup','spark','window'))) as bigint)").as("hits"))
    val ltop = lex.orderBy($"hits".desc, $"doc_id").limit(100)
      .withColumn("r_lex", row_number().over(Window.orderBy($"hits".desc, $"doc_id")).cast("long"))
    val v = tb.embeddings.select(
      $"vec_id",
      expr("transform(embedding, x -> cast(x as double))").as("e"))
      .withColumn("nrm", sqrt(expr("aggregate(e, 0.0d, (acc, x) -> acc + x * x)")))
    val q = v.filter($"vec_id" === 0).select($"e".as("qe"), $"nrm".as("qn"))
    val sem = v.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(q))
      .select($"vec_id".as("doc_id"),
        (expr("aggregate(zip_with(qe, e, (a, b) -> a * b), 0.0d, (acc, x) -> acc + x)") /
          ($"qn" * $"nrm")).as("score"))
    val stop = sem.orderBy($"score".desc, $"doc_id").limit(100)
      .withColumn("r_sem", row_number().over(Window.orderBy($"score".desc, $"doc_id")).cast("long"))
      .drop("score")
    ltop.as("l").join(stop.as("s"), $"l.doc_id" === $"s.doc_id", "full_outer")
      .select(
        coalesce($"l.doc_id", $"s.doc_id").as("doc_id"),
        coalesce($"r_lex", lit(0L)).as("r_lex"),
        coalesce($"r_sem", lit(0L)).as("r_sem"),
        (when($"l.doc_id".isNull, lit(0.0))
          .otherwise(lit(1.0) / (lit(60.0) + $"r_lex".cast("double"))) +
          when($"s.doc_id".isNull, lit(0.0))
            .otherwise(lit(1.0) / (lit(60.0) + $"r_sem".cast("double")))).as("rrf"))
      .orderBy($"rrf".desc, $"doc_id")
      .limit(20)
  }

  /** Pareto skyline of `part` on (minimize p_retailprice, maximize
    * p_size) — the SKYLINE operator (Börzsönyi et al., ICDE'01): rows no
    * other row dominates.
    *
    * Scale shape: the naive formulation is an O(n²) self-join; this plan
    * is the grid-pruned distributed skyline instead — (1) bucket price
    * into a 64-cell grid (cell width 100/64 = 1.5625, a dyadic rational,
    * so the bucketing arithmetic is float-exact), (2) per-cell max size
    * (one groupBy), (3) running max over STRICTLY-lower cells (a 64-row
    * window — bounded, see PlanSpec allowlist), (4) keep rows whose size
    * exceeds that bound (every pruned row is provably dominated by a
    * SURVIVING row, by descending-bucket induction on the dominance
    * chain), (5) exact dominance anti-join among the few survivors
    * (broadcast nested-loop on a set ~ the skyline size). Pathological
    * distributions that collapse into one cell degrade step 5 toward the
    * naive join — at scale, refine the grid over the dense price range.
    * Oracle: the direct NOT-EXISTS dominance SQL over all of `part`.
    */
  val qSkyline: GQuery = GQuery(
    "q_agg_skyline",
    Some("""
      SELECT p.p_partkey, p.p_retailprice, p.p_size
      FROM part p
      WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
      ORDER BY p.p_partkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    val p = t(spark, dir).part.select($"p_partkey", $"p_retailprice", $"p_size")
      .withColumn("bucket",
        least(greatest(floor(($"p_retailprice" - lit(900.0)) / lit(1.5625)), lit(0L)), lit(63L)))
    val cellMax = p.groupBy($"bucket").agg(max($"p_size").as("cell_max"))
    val wLower = Window.orderBy($"bucket").rowsBetween(Window.unboundedPreceding, -1)
    val dom = cellMax.withColumn("dom_size", max($"cell_max").over(wLower)).drop("cell_max")
    val survivors = p.join(broadcast(dom), Seq("bucket"))
      .filter($"dom_size".isNull || $"p_size" > $"dom_size")
      .drop("bucket", "dom_size")
    survivors.as("p").join(
      broadcast(survivors.as("q")),
      $"q.p_retailprice" <= $"p.p_retailprice" && $"q.p_size" >= $"p.p_size" &&
        ($"q.p_retailprice" < $"p.p_retailprice" || $"q.p_size" > $"p.p_size"),
      "left_anti")
      .orderBy($"p_partkey")
  }

  /** Split conformal prediction: calibrate a distribution-free error
    * threshold per event_type (model = calibration-split mean; score =
    * |value − mean|; threshold = the ⌈0.9·(n+1)⌉-th smallest calibration
    * score — the finite-sample 90% coverage guarantee), then audit
    * empirical coverage on the held-out split.
    *
    * Scale shape: the split is the repo's portable md5 gate; the mean is
    * the DECIMAL-sum convention; the threshold is an EXACT order
    * statistic selected by a rank window partitioned by event_type — the
    * same per-group-sort shape as the median/percentile family (at
    * extreme per-group cardinality swap in the approx-quantile tier,
    * q_agg_approx_quantile, whose bound-encoded oracle pattern covers the
    * approximation). Every compared double is a decimal-cast, an IEEE
    * subtraction, or an integer ratio.
    */
  val qConformal: GQuery = GQuery(
    "q_stat_conformal",
    Some("""
      WITH e AS (SELECT event_id, event_type, value,
                        substr(md5(CAST(event_id AS VARCHAR) || ':31'), 1, 4) < '8000' AS is_cal
                 FROM events),
      m AS (SELECT event_type, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu
            FROM e WHERE is_cal GROUP BY 1),
      cal AS (SELECT e.event_type, e.event_id, abs(e.value - m.mu) AS score
              FROM e JOIN m USING (event_type) WHERE e.is_cal),
      kk AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cal,
                    least(CAST(ceil(0.9 * (COUNT(*) + 1)) AS BIGINT), COUNT(*)) AS k
             FROM cal GROUP BY 1),
      th AS (SELECT c.event_type, c.score AS threshold
             FROM (SELECT event_type, score,
                          row_number() OVER (PARTITION BY event_type ORDER BY score, event_id) AS rn
                   FROM cal) c JOIN kk ON c.event_type = kk.event_type AND c.rn = kk.k),
      tst AS (SELECT e.event_type,
                     CAST(COUNT(*) AS BIGINT) AS n_test,
                     CAST(SUM(CASE WHEN abs(e.value - m.mu) <= th.threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
              FROM e JOIN m USING (event_type) JOIN th USING (event_type)
              WHERE NOT e.is_cal GROUP BY 1)
      SELECT kk.event_type, kk.n_cal, CAST(kk.k AS BIGINT) AS k, th.threshold, tst.n_test, tst.n_covered,
             CAST(tst.n_covered AS DOUBLE) / CAST(tst.n_test AS DOUBLE) AS coverage
      FROM kk JOIN th USING (event_type) JOIN tst USING (event_type)
      ORDER BY event_type""")
  ) { (spark, dir) =>
    import spark.implicits._
    val e = t(spark, dir).events.select(
      $"event_id", $"event_type", $"value",
      (substring(md5(concat($"event_id".cast("string"), lit(":31"))), 1, 4) < "8000").as("is_cal"))
    val m = e.filter($"is_cal").groupBy($"event_type").agg(davg($"value").as("mu"))
    val cal = e.filter($"is_cal").join(broadcast(m), "event_type")
      .select($"event_type", $"event_id", abs($"value" - $"mu").as("score"))
    val kk = cal.groupBy($"event_type").agg(
      count(lit(1)).as("n_cal"),
      least(ceil(lit(0.9) * (count(lit(1)) + 1)).cast("long"), count(lit(1))).as("k"))
    val wRank = Window.partitionBy($"event_type").orderBy($"score", $"event_id")
    val th = cal.withColumn("rn", row_number().over(wRank))
      .join(broadcast(kk), Seq("event_type"))
      .filter($"rn" === $"k")
      .select($"event_type", $"score".as("threshold"))
    val tst = e.filter(!$"is_cal")
      .join(broadcast(m), "event_type")
      .join(broadcast(th), "event_type")
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_test"),
        sum(when(abs($"value" - $"mu") <= $"threshold", 1L).otherwise(0L)).as("n_covered"))
    kk.join(th, "event_type").join(tst, "event_type")
      .select($"event_type", $"n_cal", $"k", $"threshold", $"n_test", $"n_covered",
        ($"n_covered".cast("double") / $"n_test".cast("double")).as("coverage"))
      .orderBy($"event_type")
  }

  /** t-closeness audit (Li et al., ICDE'07) — completes the repo's
    * k-anonymity / l-diversity privacy trio: per quasi-identifier group
    * (mktsegment × region), the ordered earth-mover's distance between
    * the group's sensitive-attribute distribution (acctbal deciles) and
    * the global one; a release is t-close when every group's EMD ≤ t.
    *
    * Scale shape: counts aggregate once per (group, bucket); the dense
    * 10-bucket spine comes from an explode over a literal sequence (no
    * row-multiplying Expand over data); the ordered EMD is a cumulative
    * window over the ≤10 spine rows PER GROUP (bounded partition) and the
    * final Σ|cum| is a DECIMAL-sum — order-insensitive. The cumulative
    * sums run over INTEGER counts (exact under any association — DuckDB's
    * windowed SUM uses a segment tree, so a float cumsum would differ by
    * association order, and a DECIMAL(38,18) cast of an arbitrary double
    * is itself engine-divergent). The whole EMD numerator
    * Σ|cumq·tn − cump·n| stays integer; ONE final division produces the
    * compared double. Numerator bound n·tn·9 must fit BIGINT/2^53 — holds
    * through ~3e7-row groups against a 3e9 population; beyond that, lift
    * the products to DECIMAL(38,0).
    */
  val qTClose: GQuery = GQuery(
    "q_privacy_tclose",
    Some("""
      WITH c AS (SELECT cu.c_custkey, cu.c_mktsegment AS seg, r.r_name AS region,
                        CAST(least(greatest(floor((cu.c_acctbal + 1000.0) / 1100.0), 0), 9) AS BIGINT) + 1 AS bucket
                 FROM customer cu JOIN nation n ON cu.c_nationkey = n.n_nationkey
                                  JOIN region r ON n.n_regionkey = r.r_regionkey),
      g AS (SELECT seg, region, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM c GROUP BY 1,2,3),
      gn AS (SELECT seg, region, CAST(SUM(cnt) AS BIGINT) AS n FROM g GROUP BY 1,2),
      tot AS (SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS tcnt FROM g GROUP BY 1),
      tn AS (SELECT CAST(SUM(tcnt) AS BIGINT) AS tn FROM tot),
      spine AS (SELECT gn.seg, gn.region, gn.n, b.bucket
                FROM gn CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS bucket) b),
      dist AS (SELECT s.seg, s.region, s.n, s.bucket,
                      COALESCE(g.cnt, 0) AS qc, COALESCE(t.tcnt, 0) AS pc, tn.tn AS tn
               FROM spine s LEFT JOIN g ON s.seg = g.seg AND s.region = g.region AND s.bucket = g.bucket
                            LEFT JOIN tot t ON s.bucket = t.bucket CROSS JOIN tn),
      cum AS (SELECT seg, region, n, tn, bucket,
                     abs(CAST(SUM(qc) OVER w AS BIGINT) * tn
                       - CAST(SUM(pc) OVER w AS BIGINT) * n) AS cd_num
              FROM dist
              WINDOW w AS (PARTITION BY seg, region ORDER BY bucket))
      SELECT seg, region, n,
             CAST(CAST(SUM(cd_num) AS BIGINT) AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(tn AS DOUBLE) * 9.0) AS emd,
             (CAST(CAST(SUM(cd_num) AS BIGINT) AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(tn AS DOUBLE) * 9.0) <= 0.25) AS t_ok
      FROM cum WHERE bucket < 10 GROUP BY 1,2,3,tn ORDER BY seg, region""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tb = t(spark, dir)
    val c = tb.customer
      .join(broadcast(tb.nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(tb.region), $"n_regionkey" === $"r_regionkey")
      .select($"c_mktsegment".as("seg"), $"r_name".as("region"),
        (least(greatest(floor(($"c_acctbal" + lit(1000.0)) / lit(1100.0)), lit(0L)), lit(9L)) + 1)
          .as("bucket"))
    val g = c.groupBy($"seg", $"region", $"bucket").agg(count(lit(1)).as("cnt"))
    val gn = g.groupBy($"seg", $"region").agg(sum($"cnt").as("n"))
    val tot = g.groupBy($"bucket").agg(sum($"cnt").as("tcnt"))
    val tn = tot.agg(sum($"tcnt").as("tn"))
    val spine = gn.select($"seg", $"region", $"n", explode(sequence(lit(1L), lit(10L))).as("bucket"))
    val dist = spine.as("s")
      .join(g.as("g"), $"s.seg" === $"g.seg" && $"s.region" === $"g.region" && $"s.bucket" === $"g.bucket", "left")
      .join(broadcast(tot.as("t")), $"s.bucket" === $"t.bucket", "left")
      .crossJoin(broadcast(tn))
      .select($"s.seg".as("seg"), $"s.region".as("region"), $"s.n".as("n"), $"s.bucket".as("bucket"),
        coalesce($"g.cnt", lit(0L)).as("qc"), coalesce($"t.tcnt", lit(0L)).as("pc"), $"tn")
    val wCum = Window.partitionBy($"seg", $"region").orderBy($"bucket")
    val cum = dist.withColumn("cd_num",
      abs(sum($"qc").over(wCum).cast("long") * $"tn" -
        sum($"pc").over(wCum).cast("long") * $"n"))
    cum.filter($"bucket" < 10)
      .groupBy($"seg", $"region", $"n", $"tn")
      .agg((sum($"cd_num").cast("long").cast("double") /
        ($"n".cast("double") * $"tn".cast("double") * lit(9.0))).as("emd"))
      .select($"seg", $"region", $"n", $"emd", ($"emd" <= 0.25).as("t_ok"))
      .orderBy($"seg", $"region")
  }

  /** Multi-touch attribution over the event stream: every purchase is a
    * conversion; the view/click/signup touches in its 7-day lookback
    * window split credit under four standard models (last-touch,
    * first-touch, linear, position-based 40/20/40), aggregated per
    * channel — the marketing-analytics counterpart of the funnel family.
    *
    * Scale shape: the conversion×touch pair join is keyed on user_id with
    * a time-range predicate (the interval-join shape); the per-conversion
    * touch list is then truncated to the 32 most recent by a rank window
    * partitioned by conversion (map-side WindowGroupLimit) — the hot-key
    * cap for always-on users whose 7-day activity is unbounded at 100 TB.
    * Credits are quantized to MICRO-credits (1e-6): floor(1e6·w + 0.5) of
    * an identical-both-engines double is the same integer everywhere, and
    * integer sums are exact under any aggregation order — the
    * DECIMAL-cast-of-double hazard (PARITY.md) never arises. A credit
    * model is a reporting convention, so 1e-6 quantization is
    * semantically free. Timestamps stay in the µs-integer domain
    * throughout (ns-parquet portability rule).
    */
  val qAttribution: GQuery = GQuery(
    "q_seq_attribution",
    Some("""
      WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS tus FROM events),
      conv AS (SELECT event_id AS conv_id, user_id, tus AS ct FROM e WHERE event_type = 'purchase'),
      tch AS (SELECT event_id AS touch_id, user_id, event_type AS channel, tus FROM e
              WHERE event_type IN ('view','click','signup')),
      pairs AS (SELECT * FROM (
                  SELECT c.conv_id, t.touch_id, t.channel, t.tus,
                         row_number() OVER (PARTITION BY c.conv_id ORDER BY t.tus DESC, t.touch_id) AS rn_rec
                  FROM conv c JOIN tch t ON c.user_id = t.user_id
                  WHERE t.tus <= c.ct AND t.tus > c.ct - 604800000000)
                WHERE rn_rec <= 32),
      sized AS (SELECT conv_id, channel, rn_rec,
                       CAST(COUNT(*) OVER (PARTITION BY conv_id) AS BIGINT) AS n,
                       row_number() OVER (PARTITION BY conv_id ORDER BY tus, touch_id) AS rn_old
                FROM pairs),
      cred AS (SELECT channel, conv_id,
                      CASE WHEN rn_rec = 1 THEN 1000000 ELSE 0 END AS u_last,
                      CASE WHEN rn_old = 1 THEN 1000000 ELSE 0 END AS u_first,
                      CAST(floor(1000000.0 / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS u_linear,
                      CASE WHEN n = 1 THEN 1000000
                           WHEN n = 2 THEN 500000
                           WHEN rn_old = 1 OR rn_rec = 1 THEN 400000
                           ELSE CAST(floor(200000.0 / CAST(n - 2 AS DOUBLE) + 0.5) AS BIGINT) END AS u_pos
               FROM sized)
      SELECT channel,
             CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_conversions,
             CAST(CAST(SUM(u_last) AS BIGINT) AS DOUBLE) / 1000000.0 AS credit_last,
             CAST(CAST(SUM(u_first) AS BIGINT) AS DOUBLE) / 1000000.0 AS credit_first,
             CAST(CAST(SUM(u_linear) AS BIGINT) AS DOUBLE) / 1000000.0 AS credit_linear,
             CAST(CAST(SUM(u_pos) AS BIGINT) AS DOUBLE) / 1000000.0 AS credit_position
      FROM cred GROUP BY 1 ORDER BY channel""")
  ) { (spark, dir) =>
    import spark.implicits._
    val e = t(spark, dir).events.select(
      $"event_id", $"user_id", $"event_type", expr("ts div 1000").as("tus"))
    val conv = e.filter($"event_type" === "purchase")
      .select($"event_id".as("conv_id"), $"user_id", $"tus".as("ct"))
    val tch = e.filter($"event_type".isin("view", "click", "signup"))
      .select($"event_id".as("touch_id"), $"user_id", $"event_type".as("channel"), $"tus")
    val wRec = Window.partitionBy($"conv_id").orderBy($"tus".desc, $"touch_id")
    val pairs = conv.join(tch, Seq("user_id"))
      .filter($"tus" <= $"ct" && $"tus" > $"ct" - 604800000000L)
      .withColumn("rn_rec", row_number().over(wRec))
      .filter($"rn_rec" <= 32)
    val wOld = Window.partitionBy($"conv_id").orderBy($"tus", $"touch_id")
    val wN = Window.partitionBy($"conv_id")
    val sized = pairs.select($"conv_id", $"channel", $"rn_rec",
      count(lit(1)).over(wN).as("n"),
      row_number().over(wOld).as("rn_old"))
    val cred = sized.select($"channel", $"conv_id",
      when($"rn_rec" === 1, 1000000L).otherwise(0L).as("u_last"),
      when($"rn_old" === 1, 1000000L).otherwise(0L).as("u_first"),
      floor(lit(1000000.0) / $"n".cast("double") + 0.5).cast("long").as("u_linear"),
      when($"n" === 1, 1000000L)
        .when($"n" === 2, 500000L)
        .when($"rn_old" === 1 || $"rn_rec" === 1, 400000L)
        .otherwise(floor(lit(200000.0) / ($"n" - 2).cast("double") + 0.5).cast("long"))
        .as("u_pos"))
    cred.groupBy($"channel")
      .agg(
        countDistinct($"conv_id").as("n_conversions"),
        (sum($"u_last").cast("double") / lit(1000000.0)).as("credit_last"),
        (sum($"u_first").cast("double") / lit(1000000.0)).as("credit_first"),
        (sum($"u_linear").cast("double") / lit(1000000.0)).as("credit_linear"),
        (sum($"u_pos").cast("double") / lit(1000000.0)).as("credit_position"))
      .orderBy($"channel")
  }

  /** Theil–Sen robust trend per event_type over the day-grain value
    * series: slope = median of all pairwise slopes (y_j−y_i)/(d_j−d_i),
    * intercept = median residual — the outlier-robust regression the
    * anomaly family (q_ts_anomaly, q_ts_cusum) wants as a baseline.
    *
    * Scale shape: the pairwise fan-out runs on the DAY-GRAIN aggregate
    * (30 days → 435 pairs per key), not the event rows — bounded per key
    * regardless of corpus size, the same day-grain class the ts-family
    * lint allowlist documents. Day y-values are DECIMAL-sum casts;
    * slopes/residuals are single IEEE divides/multiplies of those exact
    * doubles; medians are exact rank-selected order statistics (a 2-row
    * AVG for even counts — fp addition of two terms is commutative, so
    * order cannot matter).
    */
  val qTheilSen: GQuery = GQuery(
    "q_ts_theil_sen",
    Some(s"""
      WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day, value FROM events),
      d AS (SELECT event_type, day, ${sqlSum("value")} AS y
            FROM e GROUP BY 1, 2),
      nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days FROM d GROUP BY 1),
      pr AS (SELECT a.event_type, a.day AS d1, b.day AS d2,
                    (b.y - a.y) / CAST(b.day - a.day AS DOUBLE) AS slope
             FROM d a JOIN d b ON a.event_type = b.event_type AND a.day < b.day),
      cnt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m FROM pr GROUP BY 1),
      rk AS (SELECT pr.event_type, pr.slope,
                    row_number() OVER (PARTITION BY pr.event_type ORDER BY pr.slope, pr.d1, pr.d2) AS rn
             FROM pr),
      med AS (SELECT rk.event_type, AVG(rk.slope) AS slope
              FROM rk JOIN cnt ON rk.event_type = cnt.event_type
              WHERE rk.rn IN ((cnt.m + 1) // 2, (cnt.m + 2) // 2)
              GROUP BY 1),
      res AS (SELECT d.event_type, d.day, d.y - med.slope * CAST(d.day AS DOUBLE) AS r
              FROM d JOIN med ON d.event_type = med.event_type),
      rrk AS (SELECT res.event_type, res.r,
                     row_number() OVER (PARTITION BY res.event_type ORDER BY res.r, res.day) AS rn
              FROM res),
      icept AS (SELECT rrk.event_type, AVG(rrk.r) AS intercept
                FROM rrk JOIN nd ON rrk.event_type = nd.event_type
                WHERE rrk.rn IN ((nd.n_days + 1) // 2, (nd.n_days + 2) // 2)
                GROUP BY 1)
      SELECT nd.event_type, nd.n_days, cnt.m AS n_pairs, med.slope, icept.intercept
      FROM nd JOIN cnt USING (event_type) JOIN med USING (event_type) JOIN icept USING (event_type)
      ORDER BY event_type""")
  ) { (spark, dir) =>
    import spark.implicits._
    val e = t(spark, dir).events.select(
      $"event_type", expr("(ts div 1000) div 86400000000").as("day"), $"value")
    val d = e.groupBy($"event_type", $"day").agg(dsum($"value").as("y"))
    val nd = d.groupBy($"event_type").agg(count(lit(1)).as("n_days"))
    val pr = d.as("a")
      .join(d.as("b"), $"a.event_type" === $"b.event_type" && $"a.day" < $"b.day")
      .select($"a.event_type".as("event_type"), $"a.day".as("d1"), $"b.day".as("d2"),
        (($"b.y" - $"a.y") / ($"b.day" - $"a.day").cast("double")).as("slope"))
    val cnt = pr.groupBy($"event_type").agg(count(lit(1)).as("m"))
    val wS = Window.partitionBy($"event_type").orderBy($"slope", $"d1", $"d2")
    // NB Spark's `/` on integers is DOUBLE division — `div` for the
    // median-rank arithmetic, or (m+1)/2 = 15.5 matches no rank at all.
    val med = pr.withColumn("rn", row_number().over(wS))
      .join(broadcast(cnt), Seq("event_type"))
      .filter($"rn" === expr("(m + 1) div 2") || $"rn" === expr("(m + 2) div 2"))
      .groupBy($"event_type").agg(avg($"slope").as("slope"))
    val res = d.join(broadcast(med), Seq("event_type"))
      .select($"event_type", $"day", ($"y" - $"slope" * $"day".cast("double")).as("r"))
    val wR = Window.partitionBy($"event_type").orderBy($"r", $"day")
    val icept = res.withColumn("rn", row_number().over(wR))
      .join(broadcast(nd), Seq("event_type"))
      .filter($"rn" === expr("(n_days + 1) div 2") || $"rn" === expr("(n_days + 2) div 2"))
      .groupBy($"event_type").agg(avg($"r").as("intercept"))
    nd.join(cnt, "event_type").join(med, "event_type").join(icept, "event_type")
      .select($"event_type", $"n_days", $"m".as("n_pairs"), $"slope", $"intercept")
      .orderBy($"event_type")
  }

  /** RFM customer segmentation — recency / frequency / monetary quintile
    * scores concatenated into the classic 125-cell segment grid, reported
    * as a per-segment roll-up (the retention/marketing slicing operator;
    * for a corpus pipeline, the same recipe segments SOURCES by
    * last-crawl/first-party-volume/quality mass).
    *
    * Scale shape: one orders shuffle to per-customer (r, f, m), then each
    * metric's quintile edges come from a value-grouped count table run
    * through the range-partitioned two-pass prefix scan
    * ([[graft.operators.Sampling.prefixSumsBy]]) — NEVER ntile over a
    * global `Window.orderBy` (one task would sort every customer). The
    * bucket rule is the deterministic tie-stable form
    * b = 1 + 5·(cum_exclusive) div n — every row sharing a value lands in
    * the same bucket on both engines, all-integer arithmetic (`div`, not
    * `/` — CLAUDE.md integer-division trap). Monetary is the
    * DECIMAL(38,6)-exact spend sum cast to DOUBLE (short-decimal inputs,
    * so the cast is portable), reused as an exact join key for the
    * bucket map. Output is the bounded ≤125-row segment table with exact
    * integer witnesses.
    */
  val qRfm: GQuery = GQuery(
    "q_mining_rfm",
    Some("""
      WITH maxd AS (SELECT max(o_orderdate) AS md FROM orders),
      cust AS (
        SELECT o_custkey,
               CAST(date_diff('day', max(o_orderdate), (SELECT md FROM maxd)) AS BIGINT) AS r,
               CAST(COUNT(*) AS BIGINT) AS f,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS m
        FROM orders GROUP BY 1),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cust),
      rc AS (SELECT r AS v, CAST(COUNT(*) AS BIGINT) AS cnt FROM cust GROUP BY 1),
      rb AS (SELECT v, 1 + (CAST(SUM(cnt) OVER (ORDER BY v) - cnt AS BIGINT) * 5) // n.n AS b
             FROM rc, n),
      fc AS (SELECT f AS v, CAST(COUNT(*) AS BIGINT) AS cnt FROM cust GROUP BY 1),
      fb AS (SELECT v, 1 + (CAST(SUM(cnt) OVER (ORDER BY v) - cnt AS BIGINT) * 5) // n.n AS b
             FROM fc, n),
      mc AS (SELECT m AS v, CAST(COUNT(*) AS BIGINT) AS cnt FROM cust GROUP BY 1),
      mb AS (SELECT v, 1 + (CAST(SUM(cnt) OVER (ORDER BY v) - cnt AS BIGINT) * 5) // n.n AS b
             FROM mc, n),
      scored AS (
        SELECT c.o_custkey, 6 - rb.b AS rs, fb.b AS fs, mb.b AS ms, c.m, c.r
        FROM cust c
        JOIN rb ON c.r = rb.v JOIN fb ON c.f = fb.v JOIN mb ON c.m = mb.v)
      SELECT CAST(rs AS VARCHAR) || CAST(fs AS VARCHAR) || CAST(ms AS VARCHAR) AS segment,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(CAST(m AS DECIMAL(38,6))) AS DOUBLE) AS total_monetary,
             CAST(SUM(r) AS BIGINT) AS sum_recency_days
      FROM scored GROUP BY 1 ORDER BY segment""")
  ) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    val o = t(spark, dir).orders
    val maxd = o.agg(max($"o_orderdate").as("maxd"))
    val cust = o.groupBy($"o_custkey")
      .agg(max($"o_orderdate").as("last_d"), count(lit(1)).as("f"),
        sum($"o_totalprice".cast(D)).as("mdec"))
      .crossJoin(broadcast(maxd))
      .select($"o_custkey", datediff($"maxd", $"last_d").cast("long").as("r"),
        $"f", $"mdec".cast("double").as("m"))
      .ckptLazy() // feeds three bucket maps + the final join
    val n = cust.agg(count(lit(1)).as("n"))
    // deterministic tie-stable quintile map for one metric: value ->
    // bucket via the two-pass prefix scan over the value-count table
    def bucketMap(c: String): DataFrame = {
      val vc = cust.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
      graft.operators.Sampling.prefixSumsBy(vc, Seq(col("v")), Seq("cnt"))
        .crossJoin(broadcast(n))
        .select($"v", expr("1 + (((cum_cnt - cnt) * 5) div n)").as("b"))
    }
    val scored = cust
      .join(bucketMap("r").withColumnRenamed("b", "rb"), $"r" === $"v").drop("v")
      .join(bucketMap("f").withColumnRenamed("b", "fb"), $"f" === $"v").drop("v")
      .join(bucketMap("m").withColumnRenamed("b", "mb"), $"m" === $"v").drop("v")
      .select($"o_custkey", (lit(6L) - $"rb").as("rs"), $"fb".as("fs"),
        $"mb".as("ms"), $"m", $"r")
    scored
      .groupBy(concat($"rs".cast("string"), $"fs".cast("string"),
        $"ms".cast("string")).as("segment"))
      .agg(count(lit(1)).as("n_customers"),
        dsum($"m").as("total_monetary"),
        sum($"r").as("sum_recency_days"))
      .orderBy($"segment")
  }

  /** 1-D DBSCAN over o_totalprice (eps = 100, minPts = 5) — exact
    * density-based clustering with noise, the distribution-shape
    * discovery that k-means (fixed k, spherical) can't do. In 1-D the
    * algorithm is fully relational: a value is CORE iff the total row
    * weight in [v−eps, v+eps] ≥ minPts; clusters are maximal runs of
    * core values with gaps ≤ eps; border values attach to the nearest
    * core within eps (tie → lower core value); everything else is noise
    * (cluster −1). Output is the bounded per-cluster summary.
    *
    * Scale shape: all neighborhoods resolve through a floor(v/eps) grid
    * bucket join — a center's ±eps window spans exactly 3 buckets, so
    * the join volume is Σ (per-bucket distinct values)², bounded by the
    * grid instead of O(n²), and it shuffles on bucket id like any
    * equi-join. The run/island numbering is the range-partitioned
    * two-pass prefix scan ([[graft.operators.Sampling.prefixSumsBy]]
    * over break flags) — never a global `Window.orderBy` funnel; the
    * oracle replays it as a window because DuckDB's replay scale is the
    * test SF, not 100 TB. Float portability: floor(v/eps), |Δv| ≤ eps
    * and the nearest-core compare are single IEEE ops on identical
    * doubles; all emitted aggregates are exact (BIGINT counts, raw data
    * min/max).
    */
  val qDbscan1d: GQuery = GQuery(
    "q_mining_dbscan_1d",
    Some("""
      WITH vals AS (SELECT o_totalprice AS v, CAST(COUNT(*) AS BIGINT) AS cnt
                    FROM orders GROUP BY 1),
      bv AS (SELECT v, cnt, CAST(floor(v / 100.0) AS BIGINT) AS bk FROM vals),
      nb AS (SELECT c.v, CAST(SUM(o.cnt) AS BIGINT) AS w
             FROM bv c JOIN bv o
               ON o.bk BETWEEN c.bk - 1 AND c.bk + 1 AND abs(o.v - c.v) <= 100.0
             GROUP BY 1),
      core AS (SELECT n.v, CAST(floor(n.v / 100.0) AS BIGINT) AS bk
               FROM nb n WHERE n.w >= 5),
      brk AS (SELECT c.v,
                     CASE WHEN EXISTS (SELECT 1 FROM core p
                                       WHERE p.v < c.v AND c.v - p.v <= 100.0)
                          THEN 0 ELSE 1 END AS is_break
              FROM core c),
      cid AS (SELECT v, CAST(SUM(is_break) OVER (ORDER BY v) AS BIGINT) AS cluster_id
              FROM brk),
      corec AS (SELECT cid.v AS cv, cid.cluster_id, core.bk
                FROM cid JOIN core ON core.v = cid.v),
      cand AS (SELECT b.v, corec.cluster_id,
                      ROW_NUMBER() OVER (PARTITION BY b.v
                                         ORDER BY abs(b.v - corec.cv), corec.cv) AS rn
               FROM bv b JOIN corec
                 ON corec.bk BETWEEN b.bk - 1 AND b.bk + 1
                AND abs(b.v - corec.cv) <= 100.0),
      asg AS (SELECT b.v, b.cnt, COALESCE(c.cluster_id, -1) AS cluster_id
              FROM bv b LEFT JOIN (SELECT v, cluster_id FROM cand WHERE rn = 1) c
                ON c.v = b.v),
      ncore AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_core_values
                FROM corec GROUP BY 1)
      SELECT a.cluster_id,
             CAST(COUNT(*) AS BIGINT) AS n_values,
             CAST(SUM(a.cnt) AS BIGINT) AS n_points,
             COALESCE(nc.n_core_values, 0) AS n_core_values,
             MIN(a.v) AS min_v, MAX(a.v) AS max_v
      FROM asg a LEFT JOIN ncore nc ON nc.cluster_id = a.cluster_id
      GROUP BY a.cluster_id, nc.n_core_values
      ORDER BY a.cluster_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val eps = 100.0
    val minPts = 5L
    val vals = t(spark, dir).orders
      .groupBy($"o_totalprice".as("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("bk", floor($"v" / eps).cast("long"))
      .ckpt() // EAGER deliberately (round-13): 4 consumer stages schedule
      // concurrently and the lazy-checkpoint first-use race re-ran the
      // post-shuffle work per stage (median 7.6->9.5 s, p95 10.1 s)
    val other = vals.select($"bk".as("obk"), $"v".as("ov"), $"cnt".as("ocnt"))
    val nb = vals
      .select($"v", explode(array($"bk" - 1, $"bk", $"bk" + 1)).as("obk"))
      .join(other, Seq("obk"))
      .filter(abs($"ov" - $"v") <= eps)
      .groupBy($"v").agg(sum($"ocnt").as("w"))
    val core = nb.filter($"w" >= minPts)
      .select($"v", floor($"v" / eps).cast("long").as("bk"))
      .ckpt() // EAGER deliberately (round-13): same race as vals above
    // island starts: no core predecessor within eps (2-bucket probe)
    val pred = core
      .select($"v", explode(array($"bk" - 1, $"bk")).as("obk"))
      .join(core.select($"bk".as("obk"), $"v".as("uv")), Seq("obk"))
      .filter($"uv" < $"v" && $"v" - $"uv" <= eps)
      .select($"v").distinct()
    val breaks = core
      .join(pred.withColumn("has_pred", lit(1L)), Seq("v"), "left")
      .select($"v", $"bk",
        when($"has_pred".isNull, 1L).otherwise(0L).as("is_break"))
    val corec = graft.operators.Sampling
      .prefixSumsBy(breaks, Seq(col("v")), Seq("is_break"))
      .select($"v".as("cv"), $"bk".as("cbk"), $"cum_is_break".as("cluster_id"))
    // nearest-core assignment: min (distance, core value) struct is the
    // deterministic tie-break the oracle replays as ROW_NUMBER
    val cand = vals
      .select($"v", explode(array($"bk" - 1, $"bk", $"bk" + 1)).as("cbk"))
      .join(corec, Seq("cbk"))
      .filter(abs($"v" - $"cv") <= eps)
      .groupBy($"v")
      .agg(min(struct(abs($"v" - $"cv").as("d"), $"cv", $"cluster_id")).as("m"))
      .select($"v", $"m.cluster_id".as("cluster_id"))
    val asg = vals.join(cand, Seq("v"), "left")
      .na.fill(-1L, Seq("cluster_id"))
    val ncore = corec.groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_core_values"))
    asg.groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_values"), sum($"cnt").as("n_points"),
        min($"v").as("min_v"), max($"v").as("max_v"))
      .join(ncore, Seq("cluster_id"), "left")
      .na.fill(0L, Seq("n_core_values"))
      .select($"cluster_id", $"n_values", $"n_points", $"n_core_values",
        $"min_v", $"max_v")
      .orderBy($"cluster_id")
  }

  /** Frequent 3-itemsets with rule metrics — the apriori level above
    * [[qItemsets]]' pairs: distinct brand triples per basket, support ≥
    * n_baskets/100, confidence(ab→c) against the pair support and the
    * 3-way lift supp_abc·n²/(s_a·s_b·s_c). Triple enumeration is the
    * 3-way within-basket self-join a < b < c — volume Σ C(|basket|,3),
    * bounded because baskets are order-sized (≤ ~7 lineitems; the same
    * basket-bounded contract as the co-purchase edge build — a retail
    * 10⁴-item basket would need the md5-rank item cap first). Every
    * ratio is one IEEE division chain over exact BIGINT supports.
    */
  val qItemsets3: GQuery = GQuery(
    "q_mining_itemsets3",
    Some("""
      WITH b AS (SELECT DISTINCT l.l_orderkey AS bk, p.p_brand AS item
                 FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      n AS (SELECT CAST(COUNT(DISTINCT bk) AS BIGINT) AS n_baskets FROM b),
      s AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS supp FROM b GROUP BY 1),
      p2 AS (SELECT a.item AS ia, c.item AS ib, CAST(COUNT(*) AS BIGINT) AS supp_ab
             FROM b a JOIN b c ON a.bk = c.bk AND a.item < c.item GROUP BY 1, 2),
      p3 AS (SELECT x.item AS item_a, y.item AS item_b, z.item AS item_c,
                    CAST(COUNT(*) AS BIGINT) AS supp_abc
             FROM b x JOIN b y ON x.bk = y.bk AND x.item < y.item
                      JOIN b z ON y.bk = z.bk AND y.item < z.item
             GROUP BY 1, 2, 3)
      SELECT p3.item_a, p3.item_b, p3.item_c, p3.supp_abc,
             p2.supp_ab,
             CAST(p3.supp_abc AS DOUBLE) / CAST(p2.supp_ab AS DOUBLE) AS conf_ab_c,
             CAST(p3.supp_abc AS DOUBLE) * CAST(n.n_baskets AS DOUBLE)
               * CAST(n.n_baskets AS DOUBLE)
               / (CAST(sa.supp AS DOUBLE) * CAST(sb.supp AS DOUBLE)
                  * CAST(sc.supp AS DOUBLE)) AS lift3
      FROM p3
      JOIN p2 ON p2.ia = p3.item_a AND p2.ib = p3.item_b
      JOIN s sa ON sa.item = p3.item_a
      JOIN s sb ON sb.item = p3.item_b
      JOIN s sc ON sc.item = p3.item_c
      CROSS JOIN n
      WHERE p3.supp_abc * 100 >= n.n_baskets
      ORDER BY item_a, item_b, item_c""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tb = t(spark, dir)
    val b = tb.lineitem
      .join(tb.part, $"l_partkey" === $"p_partkey")
      .select($"l_orderkey".as("bk"), $"p_brand".as("item"))
      .distinct()
      .ckptLazy() // feeds the 3-way self-join, pair supports, item supports
    val n = b.agg(countDistinct($"bk").as("n_baskets"))
    val s = b.groupBy($"item").agg(count(lit(1)).as("supp"))
    val p2 = b.as("a").join(b.as("c"),
        col("a.bk") === col("c.bk") && col("a.item") < col("c.item"))
      .groupBy(col("a.item").as("ia"), col("c.item").as("ib"))
      .agg(count(lit(1)).as("supp_ab"))
    val p3 = b.as("x")
      .join(b.as("y"), col("x.bk") === col("y.bk") && col("x.item") < col("y.item"))
      .join(b.as("z"), col("y.bk") === col("z.bk") && col("y.item") < col("z.item"))
      .groupBy(col("x.item").as("item_a"), col("y.item").as("item_b"),
        col("z.item").as("item_c"))
      .agg(count(lit(1)).as("supp_abc"))
    p3.crossJoin(broadcast(n))
      .filter($"supp_abc" * 100 >= $"n_baskets")
      .join(broadcast(p2), $"item_a" === $"ia" && $"item_b" === $"ib")
      .join(broadcast(s.select($"item".as("item_a"), $"supp".as("sa"))), Seq("item_a"))
      .join(broadcast(s.select($"item".as("item_b"), $"supp".as("sb"))), Seq("item_b"))
      .join(broadcast(s.select($"item".as("item_c"), $"supp".as("sc"))), Seq("item_c"))
      .select($"item_a", $"item_b", $"item_c", $"supp_abc", $"supp_ab",
        ($"supp_abc".cast("double") / $"supp_ab".cast("double")).as("conf_ab_c"),
        ($"supp_abc".cast("double") * $"n_baskets".cast("double")
          * $"n_baskets".cast("double")
          / ($"sa".cast("double") * $"sb".cast("double") * $"sc".cast("double")))
          .as("lift3"))
      .orderBy($"item_a", $"item_b", $"item_c")
  }

  /** Sequential 2-pattern support (the GSP/SPADE tier-1 primitive that
    * [[graft.queries.SequenceQueries]]'s q_seq_transitions can't see:
    * transitions count ADJACENT steps, sequence patterns count "a
    * EVENTUALLY before b" per user): for every ordered event-type pair,
    * the number of users whose first a precedes their first b, over
    * users who did both. The first-occurrence formulation is the
    * standard existential semantics and keeps the join user-keyed.
    *
    * Portability: first-occurrence timestamps compare at µs grain on
    * both engines (the epoch_us convention — Spark ns `div 1000`
    * truncates exactly like DuckDB's epoch_us); counts are exact
    * BIGINTs, support is one INT÷INT IEEE division. Scale shape: one
    * corpus aggregation to (user, type), then a user-keyed self-join
    * whose per-user width is the type-vocabulary (schema-bounded) —
    * linear in users.
    */
  val qSeqPattern: GQuery = GQuery(
    "q_mining_seq_pattern",
    Some("""
      WITH f AS MATERIALIZED (
        SELECT user_id, event_type, MIN(epoch_us(ts)) AS first_us
        FROM events GROUP BY 1, 2)
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_users_both,
             CAST(SUM(CASE WHEN a.first_us < b.first_us THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a_before_b,
             CAST(SUM(CASE WHEN a.first_us < b.first_us THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS support
      FROM f a JOIN f b ON a.user_id = b.user_id AND a.event_type != b.event_type
      GROUP BY 1, 2
      ORDER BY type_a, type_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    val f = t(spark, dir).events
      .select($"user_id", $"event_type", expr("ts div 1000").as("us"))
      .groupBy($"user_id", $"event_type").agg(min($"us").as("first_us"))
      .ckptLazy() // both sides of the user-keyed self-join
    f.as("a").join(f.as("b"),
        $"a.user_id" === $"b.user_id" && $"a.event_type" =!= $"b.event_type")
      .groupBy($"a.event_type".as("type_a"), $"b.event_type".as("type_b"))
      .agg(count(lit(1)).as("n_users_both"),
        sum(when($"a.first_us" < $"b.first_us", 1L).otherwise(0L)).as("n_a_before_b"))
      .select($"type_a", $"type_b", $"n_users_both", $"n_a_before_b",
        ($"n_a_before_b".cast("double") / $"n_users_both".cast("double")).as("support"))
      .orderBy($"type_a", $"type_b")
  }

  /** Slope One collaborative filtering (Lemire & Maclachlan 2005) — the
    * deviation-based predictor next to [[qItemCf]]'s similarity ranker:
    * item-pair average rating deviations, then per-(user, unrated-item)
    * predictions as the co-rating-weighted mean of (r_ui + dev_ij).
    *
    * Portability: ratings are exact counts; the weighted prediction
    * folds to ONE integer ratio — Σ(dev_sum_ij + r_ui·n_ij) / Σ n_ij
    * (substituting dev_ij = dev_sum_ij/n_ij cancels the inner division)
    * — so both engines divide the SAME two BIGINTs once; no float
    * accumulation anywhere. Scale shape: the deviation matrix is an
    * item-vocabulary-bounded (brand²) aggregate built from per-user
    * bounded pair explosion (≤25² per user — the qItemsets basket
    * contract); predictions join a deterministic user sample against the
    * broadcast-sized deviation table. Linear in ratings.
    */
  val qSlopeOne: GQuery = GQuery(
    "q_rec_slopeone",
    Some("""
      WITH r AS MATERIALIZED (
        SELECT o.o_custkey AS u, p.p_brand AS i, CAST(COUNT(*) AS BIGINT) AS r
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2),
      dev AS MATERIALIZED (
        SELECT a.i AS i, b.i AS j,
               CAST(SUM(a.r - b.r) AS BIGINT) AS dev_sum,
               CAST(COUNT(*) AS BIGINT) AS n_co
        FROM r a JOIN r b ON a.u = b.u AND a.i != b.i
        GROUP BY 1, 2),
      su AS (SELECT u FROM (SELECT DISTINCT u FROM r) d WHERE u % 100 = 0),
      cand AS (
        SELECT su.u, d.j
        FROM su, (SELECT DISTINCT i AS j FROM r) d
        WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.u = su.u AND r.i = d.j)),
      terms AS (
        SELECT c.u, c.j,
               CAST(SUM(dv.dev_sum + ru.r * dv.n_co) AS BIGINT) AS num,
               CAST(SUM(dv.n_co) AS BIGINT) AS den,
               CAST(COUNT(*) AS BIGINT) AS n_terms
        FROM cand c
        JOIN r ru ON ru.u = c.u
        JOIN dev dv ON dv.j = ru.i AND dv.i = c.j
        GROUP BY 1, 2)
      SELECT u AS user_id, j AS item, n_terms, num, den,
             CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS pred
      FROM terms WHERE den > 0
      ORDER BY user_id, item""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tb = t(spark, dir)
    val r = tb.lineitem
      .join(tb.orders, $"o_orderkey" === $"l_orderkey")
      .join(tb.part, $"p_partkey" === $"l_partkey")
      .groupBy($"o_custkey".as("u"), $"p_brand".as("i"))
      .agg(count(lit(1)).as("r"))
      .ckptLazy() // feeds dev pairs, the sample, and the term join
    val dev = r.as("a").join(r.as("b"),
        col("a.u") === col("b.u") && col("a.i") =!= col("b.i"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(col("a.r") - col("b.r")).as("dev_sum"), count(lit(1)).as("n_co"))
    val items = r.select($"i".as("j")).distinct()
    val su = r.select($"u").distinct().filter($"u" % 100 === 0)
    val cand = su.crossJoin(broadcast(items))
      .join(r.select($"u", $"i".as("j")), Seq("u", "j"), "left_anti")
    // dev row (di = target item, dj = the user's rated item)
    val devR = broadcast(
      dev.select($"i".as("di"), $"j".as("dj"), $"dev_sum", $"n_co"))
    cand
      .join(r.select($"u", $"i".as("ri"), $"r"), Seq("u"))
      .join(devR, $"j" === $"di" && $"ri" === $"dj")
      .groupBy($"u", $"j")
      .agg(sum($"dev_sum" + $"r" * $"n_co").as("num"),
        sum($"n_co").as("den"), count(lit(1)).as("n_terms"))
      .filter($"den" > 0)
      .select($"u".as("user_id"), $"j".as("item"), $"n_terms", $"num", $"den",
        ($"num".cast("double") / $"den".cast("double")).as("pred"))
      .orderBy($"user_id", $"item")
  }

  override def queries: Seq[GQuery] = Seq(
    qItemsets, qItemCf, qRankFusion, qSkyline,
    qConformal, qTClose, qAttribution, qTheilSen, qRfm, qDbscan1d, qItemsets3,
    qSeqPattern, qSlopeOne)
}
