package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Hive-style partitioned layout: the directory-level data-skipping path.
  *
  * Where bucketing (see [[Bucketing]]) kills the JOIN shuffle, partitioned
  * layout kills the SCAN itself: writing `.../col=value/part-*.parquet`
  * directories lets a filter on the partition column prune whole
  * directories at PLANNING time — a 100 TB table filtered to one day reads
  * one day's files, not 100 TB. The reference has no storage layout at all
  * (topics are the only organization, callysto/src/kafka/ctopic.rs:36-119);
  * this is the batch-lake organization a Spark engine must provide.
  *
  * Rules of thumb at scale: partition on LOW-cardinality columns that
  * queries filter on (date, region, source); thousands of partitions are
  * fine, millions are a metastore problem; never partition on a
  * high-cardinality key (that's bucketing's job). Combine both: partition
  * by day, bucket by join key inside each partition.
  */
object Partitioned {

  /** Write `df` partitioned by `cols` (directory per distinct combo). */
  def write(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Read a partitioned layout back; partition columns are reconstructed
    * from directory names, so their VALUES survive but their physical
    * position moves to the end of the schema and their type is inferred
    * (pin with a `.select` / cast if the original type must round-trip).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Count the data files the scan over `df` would actually read —
    * the partition-pruning proof: filtered scans over a partitioned
    * layout must report fewer files than the full layout.
    */
  def filesRead(df: DataFrame): Long =
    fileScans(df).map(_.selectedPartitions.totalNumberOfFiles).sum

  /** The scan's partition filters (non-empty ⇔ pruning happened at the
    * directory level rather than row level).
    */
  def partitionFilters(df: DataFrame): Seq[String] =
    fileScans(df).flatMap(_.partitionFilters.map(_.sql))

  /** Per-scan (filesReadAtRuntime, filesBeforeDynamicPruning) for every
    * scan carrying a DynamicPruningExpression, AFTER the frame has
    * executed. `selectedPartitions` (what [[filesRead]] counts) is the
    * PLANNING-time selection; runtime DPP skipping only shows up in the
    * scan's metrics — `numFiles` is what was actually read, and Spark adds
    * `staticFilesNum` (the pre-pruning count) exactly when dynamic
    * pruning applies. A (read, static) pair with read < static is the
    * proof the runtime subquery skipped whole directories.
    */
  def dynamicPruningReport(df: DataFrame): Seq[(Long, Long)] =
    fileScans(df)
      .filter(_.metrics.contains("staticFilesNum"))
      .map(s => (s.metrics("numFiles").value, s.metrics("staticFilesNum").value))

  /** All file scans in the executed plan, looking through AQE wrapping —
    * under AQE (any join/aggregate over the scan) the scans live inside
    * `AdaptiveSparkPlanExec.executedPlan`, and once a stage has run they
    * move inside `QueryStageExec` LEAVES (whose wrapped plan is a member,
    * not a child, so a plain `collect` never reaches them).
    */
  private def fileScans(
      df: DataFrame
  ): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    collectScans(df.queryExecution.executedPlan)

  private def collectScans(
      plan: org.apache.spark.sql.execution.SparkPlan
  ): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    plan.collect {
      case a: AdaptiveSparkPlanExec => collectScans(a.executedPlan)
      case q: QueryStageExec        => collectScans(q.plan)
      case s: FileSourceScanExec    => Seq(s)
    }.flatten
  }

  /** Small-file compaction: rewrite a layout into `targetFiles` files.
    * The operational counterpart of streaming ingest — a micro-batch
    * sink drips thousands of KB-sized files per day, and scan throughput
    * at 100 TB dies on file-open overhead (and the driver dies on
    * listing). Writes to a side directory, then publishes via the
    * crash-recoverable swap in [[Swap]] — the old layout survives as a
    * `__backup` until the compacted copy is live, and a leftover
    * `__compacting`/`__backup` from a crashed run is recovered on the
    * next call. At real scale run this per partition directory so one
    * compaction failure never invalidates the table (lake formats do the
    * same swap via metadata).
    */
  def compact(
      spark: SparkSession,
      path: String,
      targetFiles: Int,
      partitionCols: Seq[String] = Nil
  ): Unit = {
    require(targetFiles > 0, "targetFiles must be positive")
    val tmp = path + "__compacting"
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val t = new org.apache.hadoop.fs.Path(tmp)
    val fs = p.getFileSystem(conf)
    Swap.recover(fs, p, t)
    val df = spark.read.parquet(path)
    val writer =
      if (partitionCols.isEmpty) df.repartition(targetFiles).write
      else
        // preserve the hive layout: cluster rows by partition key so each
        // directory is rewritten as few files (targetFiles bounds the
        // total task count, and a task holds whole partitions)
        df.repartition(targetFiles, partitionCols.map(org.apache.spark.sql.functions.col): _*)
          .write.partitionBy(partitionCols: _*)
    writer.mode("overwrite").parquet(tmp)
    Swap.publish(fs, p, t)
  }

  /** Count the parquet data files under `path` (recursive). */
  def dataFileCount(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
    n
  }

  /** Dynamic-overwrite of only the partitions present in `df` — the
    * incremental-reload idiom (reprocess one day without touching the
    * rest of the table).
    */
  def overwritePartitions(df: DataFrame, path: String, cols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
