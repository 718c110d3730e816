package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Similarity search over embedding columns (array<float>).
  *
  * Everything is expressed with higher-order functions (zip_with /
  * aggregate) over the native array type — codegen'd, no UDF, no UDT.
  * Dot products run in double precision (deterministic left-fold order,
  * matching an explicit SQL oracle bit-for-bit).
  *
  * Scale path: brute force is O(|Q|·|N|·d) — fine when |Q| is small and
  * broadcast; the LSH variant buckets by random-hyperplane signs so the
  * candidate join is an equi-join on the bucket key (shuffle-partitioned,
  * skew-handled by AQE), never a cross join.
  */
object Similarity {

  /** Elementwise double-cast of a float array. */
  def toDouble(arr: Column): Column = transform(arr, x => x.cast(DoubleType))

  /** Dot product of two equal-length numeric arrays, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(toDouble(a), x => x * x), lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector.
    *
    * `queries` must be small (it is broadcast); candidates stream through
    * a rank window partitioned by query id. Output: (query_id, neighbor_id,
    * rank) — scores are kept internal so downstream comparisons are not
    * sensitive to last-ulp float ordering.
    */
  def bruteForceTopK(
      candidates: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    )
    val scored = candidates
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
      .join(q, col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        cosine(col("qvec"), col("nvec")).as("score")
      )
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Deterministic random hyperplanes: `planes x dim` in [-1, 1), seeded —
    * identical across executors and runs (plain scala.util.Random with a
    * fixed seed, materialized once on the driver as a literal).
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextDouble() * 2 - 1)
  }

  /** Sign-bucket key of a vector under the given hyperplanes: bit p is
    * sign(v · plane_p). 16 planes → 65536 buckets.
    */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.map { p =>
      val plane = typedlit(p.toSeq)
      when(dot(vec, plane) > 0, 1L).otherwise(0L)
    }
    bits.reduceLeft((acc, b) => acc * 2 + b)
  }

  /** Approximate top-k via multi-table sign-LSH (banded amplification,
    * same shape as MinHash-LSH): L independent tables of r hyperplanes
    * each; a candidate is scored iff it shares a bucket with the query in
    * at least one table. Per-table collision for angle θ is (1−θ/π)^r, so
    * recall across L tables is 1−(1−p)^L — tune (L, r) for the recall/
    * candidate-volume trade-off. Candidate generation is an equi-join on
    * (table, bucket) — shuffle-based, skew handled by AQE, no cross join.
    */
  def lshTopK(
      candidates: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nTables: Int = 16,
      planesPerTable: Int = 3,
      dim: Int = 64
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tables = Array.tabulate(nTables)(t => hyperplanes(planesPerTable, dim, seed = 42L + t))

    def buckets(vec: Column): Column =
      array(tables.zipWithIndex.map { case (planes, tIdx) =>
        struct(lit(tIdx).as("tbl"), lshBucket(vec, planes).as("bucket"))
      }: _*)

    val cand = candidates
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"), explode(buckets(col(vecCol))).as("bk"))
      .select(col("neighbor_id"), col("nvec"), col("bk.tbl").as("tbl"), col("bk.bucket").as("bucket"))
    val q = broadcast(
      queries
        .select(col(idCol).as("query_id"), col(vecCol).as("qvec"), explode(buckets(col(vecCol))).as("bk"))
        .select(col("query_id"), col("qvec"), col("bk.tbl").as("tbl"), col("bk.bucket").as("bucket"))
    )
    val scored = cand
      .join(q, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qvec"), col("nvec"))
      .distinct() // a pair may collide in several tables; score once
      .select(col("query_id"), col("neighbor_id"), cosine(col("qvec"), col("nvec")).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Exact near-duplicate pairs within a blocking key (e.g. a label or
    * cluster id): pairs are generated per block via equi-join, scored in
    * double, thresholded. Blocking bounds the quadratic term to the block
    * size; at scale the block key would come from LSH/IVF assignment.
    */
  def blockedCosinePairs(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      threshold: Double
  ): DataFrame = {
    val v = vectors.select(
      col(blockCol).as("block"),
      col(idCol).as("id"),
      col(vecCol).as("vec")
    )
    val a = v.as("a")
    val b = v.as("b")
    a.join(b, col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"),
        col("b.id").as("id_b"),
        cosine(col("a.vec"), col("b.vec")).as("cos_sim")
      )
      .filter(col("cos_sim") >= threshold)
  }
}
