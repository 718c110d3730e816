package graft.queries

import Common._

/** Subquery surface — correlated scalar, EXISTS, and IN — expressed through
  * the engine's SQL entry point (`spark.sql` over registered views) so the
  * parser/analyzer path is exercised alongside the DataFrame API. Catalyst
  * rewrites each into the usual join shapes (scalar → aggregate + join,
  * EXISTS/IN → left-semi), so the 100 TB story is the join story.
  *
  * The reference has no subqueries (no SQL at all — SURVEY.md §2.5); these
  * are part of the relational surface the Spark engine adds.
  */
object Subqueries extends QuerySet {

  private def withViews(spark: org.apache.spark.sql.SparkSession, dir: String): Unit =
    Seq("part", "supplier", "orders", "lineitem", "customer").foreach { n =>
      t(spark, dir).table(n).createOrReplaceTempView(n)
    }

  /** Correlated scalar subquery (TPC-H Q17 shape): lineitems under 30% of
    * their part's average quantity.
    */
  val qScalarCorrelated: GQuery = GQuery(
    "q_subquery_scalar",
    Some(s"""
      SELECT l_partkey,
             COUNT(*) AS n_small,
             ${sqlSum("l_extendedprice")} AS small_revenue
      FROM lineitem l1
      WHERE l_quantity < 0.3 * (SELECT AVG(l_quantity)
                                FROM lineitem l2
                                WHERE l2.l_partkey = l1.l_partkey)
      GROUP BY l_partkey
      ORDER BY l_partkey""")
  ) { (spark, dir) =>
    withViews(spark, dir)
    spark.sql(s"""
      SELECT l_partkey,
             COUNT(*) AS n_small,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS small_revenue
      FROM lineitem l1
      WHERE l_quantity < 0.3 * (SELECT AVG(l_quantity)
                                FROM lineitem l2
                                WHERE l2.l_partkey = l1.l_partkey)
      GROUP BY l_partkey
      ORDER BY l_partkey""")
  }

  /** EXISTS (TPC-H Q4 shape): orders with at least one returned,
    * deeply-discounted lineitem (this corpus has no receipt/commit dates).
    */
  val qExists: GQuery = GQuery(
    "q_subquery_exists",
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n_flagged_orders
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_returnflag = 'R' AND l_discount > 0.05)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")
  ) { (spark, dir) =>
    withViews(spark, dir)
    spark.sql("""
      SELECT o_orderpriority, COUNT(*) AS n_flagged_orders
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_returnflag = 'R' AND l_discount > 0.05)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")
  }

  /** IN subquery: customers from nations that have suppliers. */
  val qIn: GQuery = GQuery(
    "q_subquery_in",
    Some("""
      SELECT c_nationkey, COUNT(*) AS n_cust
      FROM customer
      WHERE c_nationkey IN (SELECT s_nationkey FROM supplier)
      GROUP BY c_nationkey
      ORDER BY c_nationkey""")
  ) { (spark, dir) =>
    withViews(spark, dir)
    spark.sql("""
      SELECT c_nationkey, COUNT(*) AS n_cust
      FROM customer
      WHERE c_nationkey IN (SELECT s_nationkey FROM supplier)
      GROUP BY c_nationkey
      ORDER BY c_nationkey""")
  }

  /** NOT IN over a subquery — the null-aware anti join, SQL's trickiest
    * join shape: if the subquery produces ANY null, NOT IN returns no
    * rows at all, and a null probe value never qualifies. Spark must plan
    * a null-aware anti join (broadcast-only) rather than a plain
    * left-anti. Nulls are injected on the PROBE side (every 17th
    * customer), which a plain anti join would wrongly admit — under
    * NOT IN a null probe is 'unknown', never true; the build side stays
    * null-free so the result is non-trivial (an any-null build returns
    * zero rows, which would gate nothing). DuckDB implements the same
    * standard independently — the hash match proves the semantics.
    */
  val qNotIn: GQuery = GQuery(
    "q_subquery_not_in",
    Some("""
      WITH probe AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 17 = 0 THEN NULL ELSE c_nationkey END AS nk
        FROM customer),
      sup AS (SELECT s_nationkey AS snk FROM supplier WHERE s_nationkey < 20)
      SELECT COUNT(*) AS n_outside,
             CAST(SUM(c_custkey) AS BIGINT) AS sum_keys
      FROM probe
      WHERE nk NOT IN (SELECT snk FROM sup)""")
  ) { (spark, dir) =>
    withViews(spark, dir)
    spark.sql("""
      WITH probe AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 17 = 0 THEN NULL ELSE c_nationkey END AS nk
        FROM customer),
      sup AS (SELECT s_nationkey AS snk FROM supplier WHERE s_nationkey < 20)
      SELECT COUNT(*) AS n_outside,
             CAST(SUM(c_custkey) AS BIGINT) AS sum_keys
      FROM probe
      WHERE nk NOT IN (SELECT snk FROM sup)""")
  }

  /** Correlated LATERAL subquery in FROM: per supplier, its top part by
    * shipped quantity. Catalyst decorrelates the lateral into a ranked
    * join (DecorrelateInnerQuery), so the 100 TB plan is one shuffle on
    * suppkey with a windowed top-1 — not a per-row re-execution.
    */
  val qLateral: GQuery = GQuery(
    "q_subquery_lateral",
    Some("""
      SELECT s.s_suppkey, t.top_part, t.total_qty
      FROM supplier s,
           LATERAL (SELECT l_partkey AS top_part,
                           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
                    FROM lineitem
                    WHERE l_suppkey = s.s_suppkey
                    GROUP BY l_partkey
                    ORDER BY total_qty DESC, l_partkey
                    LIMIT 1) t
      ORDER BY s.s_suppkey""")
  ) { (spark, dir) =>
    withViews(spark, dir)
    spark.sql("""
      SELECT s.s_suppkey, t.top_part, t.total_qty
      FROM supplier s,
           LATERAL (SELECT l_partkey AS top_part,
                           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
                    FROM lineitem
                    WHERE l_suppkey = s.s_suppkey
                    GROUP BY l_partkey
                    ORDER BY total_qty DESC, l_partkey
                    LIMIT 1) t
      ORDER BY s.s_suppkey""")
  }

  /** SQL-defined scalar UDFs (`CREATE TEMPORARY FUNCTION ... RETURN expr`)
    * — the declarative end of the extension surface. Unlike a JVM closure
    * UDF, the analyzer INLINES the SQL function body into the plan, so the
    * expression stays inside whole-stage codegen and predicate
    * pushdown/constant folding see through it; at 100 TB a SQL UDF costs
    * exactly what writing the expression inline would, while a closure UDF
    * is an opaque per-row call. The oracle runs the bodies inlined —
    * matching results prove the expansion is semantically transparent.
    *
    * The reference's "UDF surface" is arbitrary Rust closures in agents
    * (SURVEY.md §2.6 extension row); SQL UDFs are the engine-side analog
    * for relational logic.
    */
  val qSqlUdf: GQuery = GQuery(
    "q_fn_sql_udf",
    Some(s"""
      SELECT l_returnflag,
             COUNT(*) AS n,
             ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
             CAST(SUM(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")
  ) { (spark, dir) =>
    withViews(spark, dir)
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(p DOUBLE, d DOUBLE)
                 RETURNS DOUBLE RETURN p * (1.0 - d)""")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_is_bulk(q DOUBLE)
                 RETURNS INT RETURN CASE WHEN q >= 25 THEN 1 ELSE 0 END""")
    spark.sql("""
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(graft_disc_price(l_extendedprice, l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
             CAST(SUM(graft_is_bulk(l_quantity)) AS BIGINT) AS n_bulk
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")
  }

  /** Custom graft EXPRESSIONS through the SQL PARSER — the registry
    * ([[graft.functions.GraftFunctions.register]]) makes every codegen
    * extension a first-class SQL function, so `spark.sql` users get the
    * same surface as the Column API. The oracle replays each function
    * with DuckDB's native counterpart (nfc_normalize / strip_accents) or
    * the exact bit formula (z-order), proving the SQL-path results match
    * an independent implementation — not just that the parser resolves.
    */
  val qGraftSql: GQuery = GQuery(
    "q_fn_graft_sql",
    Some(s"""
      WITH d AS (SELECT doc_id, text, n_chars % 256 AS m FROM documents)
      SELECT doc_id,
             (nfc_normalize(text) = text) AS already_nfc,
             CAST(length(strip_accents(text)) AS INT) AS n_stripped,
             CAST(${graft.functions.ZOrder.oracleSql(Seq("doc_id", "m"), 8)} AS BIGINT) AS zkey
      FROM d
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    t(spark, dir).documents.createOrReplaceTempView("documents")
    spark.sql("""
      SELECT doc_id,
             (graft_unicode_norm(text, 'NFC') = text) AS already_nfc,
             length(graft_strip_accents(text)) AS n_stripped,
             graft_zorder(8, doc_id, n_chars % 256) AS zkey
      FROM documents
      ORDER BY doc_id""")
  }

  /** TWO correlated existence subqueries with opposite polarity in ONE
    * predicate (TPC-H Q21's signature shape): orders that have at least
    * one returned lineitem AND no high-discount lineitem. Catalyst plans
    * a left-semi AND a left-anti join against the same fact table in one
    * query — the shape that catches planners double-scanning or
    * mis-merging correlated predicates.
    */
  val qExistsNotExists: GQuery = GQuery(
    "q_subquery_exists_notexists",
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n_orders,
             CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
      FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        AND NOT EXISTS (SELECT 1 FROM lineitem l
                        WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.09)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")
  ) { (spark, dir) =>
    withViews(spark, dir)
    spark.sql("""
      SELECT o_orderpriority, COUNT(*) AS n_orders,
             CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
      FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        AND NOT EXISTS (SELECT 1 FROM lineitem l
                        WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.09)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")
  }

  /** Recursive CTE (`WITH RECURSIVE`, Spark 4's UnionLoop): transitive
    * closure over a decimal-digit part hierarchy (parent = key ÷ 10, roots
    * are single-digit keys) — every part reached exactly once at depth =
    * digits−1, rolled up per level. The recursion runs O(depth) JOBS, not
    * O(depth) self-joins materialized at once: each iteration equi-joins
    * the frontier against the (pruned, pushed-down) part scan, so at
    * 100 TB the cost is depth × one hash join on the frontier — the same
    * shape as [[graft.operators.Dedup.connectedComponents]]'s hand-rolled
    * loop but expressed declaratively through the parser. The frontier
    * join is non-monotonic in size only if the hierarchy branches, which a
    * digit-tree does 10-fold — exactly the fan-out Catalyst's per-
    * iteration re-plan (AQE) is allowed to re-broadcast.
    *
    * Only the divide operator differs cross-dialect (Spark `DIV`, DuckDB
    * `//`); both are exact integer division, and SUM(node) is pinned to
    * BIGINT against DuckDB's HUGEINT default.
    */
  val qRecursiveCte: GQuery = GQuery(
    "q_sql_recursive_cte",
    Some("""
      WITH RECURSIVE anc AS (
        SELECT p_partkey AS node, 0 AS depth FROM part WHERE p_partkey < 10
        UNION ALL
        SELECT p.p_partkey AS node, a.depth + 1 AS depth
        FROM part p JOIN anc a ON p.p_partkey // 10 = a.node
        WHERE p.p_partkey >= 10)
      SELECT depth, COUNT(*) AS n_nodes, CAST(SUM(node) AS BIGINT) AS sum_node
      FROM anc
      GROUP BY depth
      ORDER BY depth""")
  ) { (spark, dir) =>
    withViews(spark, dir)
    spark.sql("""
      WITH RECURSIVE anc AS (
        SELECT p_partkey AS node, 0 AS depth FROM part WHERE p_partkey < 10
        UNION ALL
        SELECT p.p_partkey AS node, a.depth + 1 AS depth
        FROM part p JOIN anc a ON p.p_partkey DIV 10 = a.node
        WHERE p.p_partkey >= 10)
      SELECT depth, COUNT(*) AS n_nodes, CAST(SUM(node) AS BIGINT) AS sum_node
      FROM anc
      GROUP BY depth
      ORDER BY depth""")
  }

  override def queries: Seq[GQuery] =
    Seq(qScalarCorrelated, qExists, qIn, qNotIn, qExistsNotExists, qLateral, qSqlUdf,
      qGraftSql, qRecursiveCte)
}
