package graft.queries

import org.apache.spark.sql.functions._

import Common._

/** Set-operation inventory: UNION ALL / UNION DISTINCT / INTERSECT / EXCEPT.
  * Absent from the reference (SURVEY.md §2.5); first-class here.
  */
object SetOps extends QuerySet {

  /** UNION ALL of two projected relations, then aggregate. */
  val qUnionAll: GQuery = GQuery(
    "q_set_union_all",
    Some("""
      SELECT nationkey, kind, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier)
      GROUP BY nationkey, kind
      ORDER BY nationkey, kind""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    tt.customer
      .select($"c_nationkey".as("nationkey"), lit("customer").as("kind"))
      .unionAll(tt.supplier.select($"s_nationkey".as("nationkey"), lit("supplier").as("kind")))
      .groupBy($"nationkey", $"kind")
      .agg(count(lit(1)).as("n"))
      .orderBy($"nationkey", $"kind")
  }

  /** UNION DISTINCT. */
  val qUnionDistinct: GQuery = GQuery(
    "q_set_union_distinct",
    Some("""
      SELECT nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier)
      ORDER BY nationkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    tt.customer
      .select($"c_nationkey".as("nationkey"))
      .union(tt.supplier.select($"s_nationkey".as("nationkey")))
      .distinct()
      .orderBy($"nationkey")
  }

  /** INTERSECT: parts shipped by both supplier 1 and supplier 2. */
  val qIntersect: GQuery = GQuery(
    "q_set_intersect",
    Some("""
      SELECT l_partkey FROM lineitem WHERE l_suppkey = 1
      INTERSECT
      SELECT l_partkey FROM lineitem WHERE l_suppkey = 2
      ORDER BY l_partkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    tt.lineitem.filter($"l_suppkey" === 1).select($"l_partkey")
      .intersect(tt.lineitem.filter($"l_suppkey" === 2).select($"l_partkey"))
      .orderBy($"l_partkey")
  }

  /** EXCEPT: parts shipped by supplier 1 but never by supplier 2. */
  val qExcept: GQuery = GQuery(
    "q_set_except",
    Some("""
      SELECT l_partkey FROM lineitem WHERE l_suppkey = 1
      EXCEPT
      SELECT l_partkey FROM lineitem WHERE l_suppkey = 2
      ORDER BY l_partkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    tt.lineitem.filter($"l_suppkey" === 1).select($"l_partkey")
      .except(tt.lineitem.filter($"l_suppkey" === 2).select($"l_partkey"))
      .orderBy($"l_partkey")
  }

  /** EXCEPT ALL (bag semantics): multiplicities subtract instead of the
    * set-collapse EXCEPT applies — a part shipped 3× by supplier 1 and 1×
    * by supplier 2 survives twice.
    */
  val qExceptAll: GQuery = GQuery(
    "q_set_except_all",
    Some("""
      SELECT l_partkey FROM (
        SELECT l_partkey FROM lineitem WHERE l_suppkey = 1
        EXCEPT ALL
        SELECT l_partkey FROM lineitem WHERE l_suppkey = 2)
      ORDER BY l_partkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    tt.lineitem.filter($"l_suppkey" === 1).select($"l_partkey")
      .exceptAll(tt.lineitem.filter($"l_suppkey" === 2).select($"l_partkey"))
      .orderBy($"l_partkey")
  }

  /** INTERSECT ALL (bag semantics): min of the two multiplicities. */
  val qIntersectAll: GQuery = GQuery(
    "q_set_intersect_all",
    Some("""
      SELECT l_partkey FROM (
        SELECT l_partkey FROM lineitem WHERE l_suppkey = 1
        INTERSECT ALL
        SELECT l_partkey FROM lineitem WHERE l_suppkey = 2)
      ORDER BY l_partkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tt = t(spark, dir)
    tt.lineitem.filter($"l_suppkey" === 1).select($"l_partkey")
      .intersectAll(tt.lineitem.filter($"l_suppkey" === 2).select($"l_partkey"))
      .orderBy($"l_partkey")
  }

  /** Schema-evolution union (`unionByName` with `allowMissingColumns`):
    * merging shards written by different pipeline versions — columns are
    * matched by NAME (positional union would silently pair wrong columns)
    * and columns absent on one side null-fill. The everyday operation
    * when a 100 TB corpus spans months of schema drift; DuckDB spells it
    * `UNION ALL BY NAME`.
    */
  val qUnionByName: GQuery = GQuery(
    "q_set_union_by_name",
    Some("""
      SELECT doc_id, lang, source FROM (
        SELECT doc_id, lang, source FROM documents WHERE doc_id % 2 = 0
        UNION ALL BY NAME
        SELECT source, doc_id FROM documents WHERE doc_id % 2 = 1)
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val d = t(spark, dir).documents
    val v1 = d.filter($"doc_id" % 2 === 0).select($"doc_id", $"lang", $"source")
    val v2 = d.filter($"doc_id" % 2 === 1).select($"source", $"doc_id") // old shard: no lang, reordered
    v1.unionByName(v2, allowMissingColumns = true)
      .select($"doc_id", $"lang", $"source")
      .orderBy($"doc_id")
  }

  override def queries: Seq[GQuery] =
    Seq(qUnionAll, qUnionDistinct, qIntersect, qExcept, qExceptAll, qIntersectAll, qUnionByName)
}
