package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch sources: the driver-generated parquet star schema.
  *
  * The reference's only sources are Kafka topics of opaque bytes
  * (reference: callysto/src/kafka/cconsumer.rs:36-122); the relational
  * surface of this engine is exercised against parquet tables instead.
  * Column pruning + predicate pushdown reach the parquet scan because every
  * operator downstream stays declarative (check `.explain` for
  * PushedFilters / ReadSchema).
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  // The driver has shipped events.ts both as int64 ns-since-epoch and as
  // timestamp[us] parquet across rounds. Every consumer (and the DuckDB
  // oracles, whose epoch_us(ts) is invariant to the change) expects the
  // ns-since-epoch BIGINT shape; normalize here. Session tz is pinned UTC
  // (engine/Graft.scala), so the NTZ→LTZ cast is value-preserving.
  def events: DataFrame = {
    val raw = table("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ =>
        raw.withColumn(
          "ts",
          org.apache.spark.sql.functions.expr("unix_micros(cast(ts as timestamp)) * 1000L")
        )
    }
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
