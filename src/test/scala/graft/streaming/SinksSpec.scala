package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.BinaryType

import graft.SparkSpec

/** Sink layer: JDBC batch writer round-trips through a real embedded
  * database (Derby stands in for the reference's Postgres target —
  * identical JDBC surface: connection, prepared statement, addBatch/
  * executeBatch, commit; callysto/src/sinks/postgres.rs:24-150), the
  * Kafka shape contract, and the parquet sink.
  */
class SinksSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftsink;create=true"

  test("jdbc sink writes streaming micro-batches with prepared-statement batching") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    Sinks.jdbcExecute(url, "CREATE TABLE sunk (id BIGINT, name VARCHAR(64))")
    val in = MemoryStream[(Long, String)]
    val app = new GraftApp(s, "jdbc-app", Files.createTempDirectory("graft-jdbc").toString)
    // batchSize 3 forces several executeBatch flushes per partition
    app.agent("writer", () => in.toDF(), GraftSink.Jdbc(url, "sunk", batchSize = 3),
      outputMode = "append")(_.toDF("id", "name"))

    app.start("writer")
    in.addData((1L to 10L).map(i => (i, s"row-$i")): _*)
    app.processAllAvailable("writer")
    in.addData((11L, "row-11"))
    app.processAllAvailable("writer")
    app.stop("writer")

    assert(Sinks.jdbcQueryLong(url, "SELECT COUNT(*) FROM sunk") === 11L)
    assert(Sinks.jdbcQueryLong(url, "SELECT SUM(id) FROM sunk") === (1L to 11L).sum)
  }

  test("kafkaShape produces the key/value binary contract") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "hello"), (2L, "world")).toDF("k", "payload")
    val shaped = Sinks.kafkaShape(df, "k", "payload")
    assert(shaped.schema.fieldNames.toSeq === Seq("key", "value"))
    assert(shaped.schema.fields.forall(_.dataType == BinaryType))
    val vals = shaped.collect().map(r => new String(r.getAs[Array[Byte]]("value"))).sorted
    assert(vals.toSeq === Seq("hello", "world"))
  }

  test("parquet sink appends streaming output to files") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val dir = Files.createTempDirectory("graft-pq-sink").toString + "/out"
    val in = MemoryStream[(Long, String)]
    val app = new GraftApp(s, "pq-app", Files.createTempDirectory("graft-pq-ck").toString)
    app.agent("pq", () => in.toDF(), GraftSink.Parquet(dir), outputMode = "append")(
      _.toDF("id", "name"))
    app.start("pq")
    in.addData((1L, "x"), (2L, "y"), (3L, "z"))
    app.processAllAvailable("pq")
    app.stop("pq")

    assert(s.read.parquet(dir).count() === 3L)
  }
}
