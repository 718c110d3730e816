package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: the zero-shuffle co-located join path.
  *
  * At 100 TB the single biggest join cost is shuffling the fact table.
  * Writing it ONCE bucketed (+sorted) by the join key makes every later
  * equi-join or aggregation on that key shuffle-free: the scan itself
  * reports HashPartitioning(key, n), so EnsureRequirements inserts no
  * Exchange (and with sorted buckets, no Sort) — BucketingSpec asserts
  * exactly that on the physical plan. This is Spark's native analog of the
  * reference's per-key topic partitioning, where co-partitioned Kafka
  * topics make CTable lookups node-local (reference
  * callysto/src/types/table.rs partition-wise changelog; SURVEY.md §1.3).
  *
  * Sizing: nBuckets is fixed at write time — pick ~(total size /
  * 256 MB) rounded to a power of two, and use the SAME bucket count for
  * tables that will be joined together (mismatched counts fall back to
  * shuffling one side).
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed and sorted by `key`.
    * Overwrites any existing table of the same name — including an
    * orphaned location left by a previous session (the in-memory catalog
    * dies with the JVM, the warehouse directory doesn't; CTAS refuses an
    * existing unmanaged location, so clear it explicitly).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Read a previously bucketed table. */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
