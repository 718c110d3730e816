package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming sources — the engine analogs of the reference's ingest
  * surface (SURVEY.md §2.1 P17-P18: `topic()` handles + the consumer
  * thread pumping a `CStream`).
  *
  * Kafka options mirror `KafkaConfig` (callysto/src/config.rs:16-161):
  * `startingOffsets` ↔ auto.offset.reset earliest/latest,
  * `kafka.isolation.level` ↔ read_committed/uncommitted, and any
  * `kafka.*` security option passes through (SSL/SASL, app.rs:493-571).
  * The Kafka connector jar is not shipped in this build, so [[kafka]] is
  * exercised structurally; [[rate]] and MemoryStream serve as the live
  * sources for tests — exactly the role `CSource`/`flow` play in the
  * reference (any stream is a source, flows.rs:17-79).
  */
object Sources {

  /** Kafka topic subscription with the reference's config surface.
    * `security` is the TYPED protocol/SSL/SASL object ([[KafkaSecurity]],
    * enums.rs:60-145 parity) — invalid combinations fail at build time,
    * and its validated options land ahead of `extraOptions` (which stays
    * as the raw passthrough escape hatch).
    */
  def kafka(
      spark: SparkSession,
      bootstrapServers: String,
      subscribe: String,
      startingOffsets: String = "earliest",
      isolationLevel: String = "read_uncommitted",
      maxOffsetsPerTrigger: Option[Long] = None,
      security: Option[KafkaSecurity] = None,
      extraOptions: Map[String, String] = Map.empty
  ): DataFrame = {
    val b = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", subscribe)
      .option("startingOffsets", startingOffsets)
      .option("kafka.isolation.level", isolationLevel)
    val withMax = maxOffsetsPerTrigger.fold(b)(n => b.option("maxOffsetsPerTrigger", n.toString))
    val opts = security.map(_.sourceOptions).getOrElse(Map.empty) ++ extraOptions
    opts.foldLeft(withMax) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  /** Synthetic rows-per-second source (columns: timestamp, value) — the
    * stand-in for a firehose topic in tests and demos.
    */
  def rate(spark: SparkSession, rowsPerSecond: Long, numPartitions: Int = 0): DataFrame = {
    val b = spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
    (if (numPartitions > 0) b.option("numPartitions", numPartitions.toString) else b).load()
  }

  /** Directory-watching file source (new parquet files become batches).
    *
    * `maxFilesPerTrigger` is the ingest backpressure knob — the analog of
    * the reference sinks' `buffer_size` poll_ready bound
    * (callysto/src/sinks/postgres.rs:114-125) applied at the SOURCE,
    * where Spark puts it: a restart facing a week of backlog processes it
    * as bounded micro-batches instead of one giant catch-up batch that
    * overwhelms executor memory (the reference's unbounded consumer
    * channel, cconsumer.rs:69, has exactly that burst failure mode).
    * Kafka's equivalent is `maxOffsetsPerTrigger`.
    */
  def parquetDir(
      spark: SparkSession,
      path: String,
      schemaSource: DataFrame,
      maxFilesPerTrigger: Option[Int] = None
  ): DataFrame = {
    val r = spark.readStream.schema(schemaSource.schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(path)
  }
}
