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
  def events: DataFrame     = table("events")
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
