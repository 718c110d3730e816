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

  test("exactly-once jdbc sink: replayed batches insert nothing twice") {
    val s = spark
    import s.implicits._
    Sinks.jdbcExecute(url, "CREATE TABLE eo_sunk (id BIGINT, name VARCHAR(64))")
    Sinks.jdbcExecute(url,
      "CREATE TABLE eo_log (sink_table VARCHAR(128) NOT NULL, batch_id BIGINT NOT NULL, " +
        "partition_id INT NOT NULL, PRIMARY KEY (sink_table, batch_id, partition_id))")
    val df = (1L to 20L).map(i => (i, s"row-$i")).toDF("id", "name")
    val write = Sinks.jdbcWriteBatchExactlyOnce(url, "eo_sunk", "eo_log", batchSize = 7) _
    write(df, 42L)
    assert(Sinks.jdbcQueryLong(url, "SELECT COUNT(*) FROM eo_sunk") === 20L)
    // at-least-once replay of the SAME micro-batch: markers make it a no-op
    write(df, 42L)
    assert(Sinks.jdbcQueryLong(url, "SELECT COUNT(*) FROM eo_sunk") === 20L)
    // a genuinely new batch still lands
    write(df, 43L)
    assert(Sinks.jdbcQueryLong(url, "SELECT COUNT(*) FROM eo_sunk") === 40L)
  }

  test("fan-out writes one micro-batch to jdbc AND parquet from a single query") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    Sinks.jdbcExecute(url, "CREATE TABLE fan_sunk (id BIGINT, name VARCHAR(64))")
    val pqDir = Files.createTempDirectory("graft-fanout-pq").toString
    val in = MemoryStream[(Long, String)]
    val app = new GraftApp(s, "fanout-app", Files.createTempDirectory("graft-fanout").toString)
    app.agent(
      "mux",
      () => in.toDF(),
      GraftSink.ForeachBatch(Sinks.fanOut(
        Sinks.jdbcWriteBatch(url, "fan_sunk", batchSize = 4),
        (df, _) => df.write.mode("append").parquet(pqDir)
      )),
      outputMode = "append"
    )(_.toDF("id", "name"))

    app.start("mux")
    in.addData((1L to 9L).map(i => (i, s"row-$i")): _*)
    app.processAllAvailable("mux")
    in.addData((10L, "row-10"))
    app.processAllAvailable("mux")
    app.stop("mux")

    // Both targets saw the identical frames: same count, same id mass.
    assert(Sinks.jdbcQueryLong(url, "SELECT COUNT(*) FROM fan_sunk") === 10L)
    val pq = s.read.parquet(pqDir)
    assert(pq.count() === 10L)
    assert(pq.agg(org.apache.spark.sql.functions.sum($"id")).head.getLong(0) === (1L to 10L).sum)
    assert(Sinks.jdbcQueryLong(url, "SELECT SUM(id) FROM fan_sunk") === (1L to 10L).sum)
  }

  test("elastic sink emits well-formed _bulk ndjson with one action per row") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // capture must go through a STATIC holder: the transport closure is
    // serialized to executors, so a captured local queue would be a copy
    SinksSpec.esBodies.clear()
    val bodies = SinksSpec.esBodies
    val transport: EsSink.Transport = body => { SinksSpec.esBodies.add(body); () }
    val in = MemoryStream[(Long, String)]
    val app = new GraftApp(s, "es-app", Files.createTempDirectory("graft-es").toString)
    // actionsPerBulk 2 forces chunking: 5 rows -> >= 3 transport calls
    app.agent("indexer", () => in.toDF(), GraftSink.Elastic("docs", "id", transport, 2),
      outputMode = "append")(_.toDF("id", "body"))
    app.start("indexer")
    in.addData((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
    app.processAllAvailable("indexer")
    app.stop("indexer")

    import scala.jdk.CollectionConverters._
    val lines = bodies.asScala.toList.flatMap(_.split("\n"))
    val actions = lines.grouped(2).toList
    assert(actions.size === 5)
    val ids = actions.map(_.head).map { meta =>
      assert(meta.startsWith("""{"index":{"_index":"docs","_id":""""))
      meta.replaceAll(""".*"_id":"(\d+)".*""", "$1").toLong
    }.sorted
    assert(ids === List(1L, 2L, 3L, 4L, 5L))
    // each doc line is the full row as JSON
    assert(lines.exists(_.contains(""""body":"c"""")))
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

object SinksSpec {
  val esBodies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}
