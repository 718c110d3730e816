package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.engine.Graft
import graft.streaming.{GraftApp, GraftSink}

/** Streaming ingest micro-benchmark mirroring the reference's double-agent
  * run (the only published number: 278.47 MB/s consuming 200k × ~74 KB
  * Kafka messages with two agents —
  * reference: examples/src/double-agent.rs:36-48,79, producer.py:18-21).
  *
  * Two agents on one session, each draining its own in-process stream of
  * 74,000-byte messages through a count+bytes aggregation into shared
  * driver counters (the `fetch_add` parity). No Kafka broker exists in
  * this container, so the default source is MemoryStream: the figure
  * measures the engine's micro-batch machinery — encode, plan,
  * aggregate, sink — not broker I/O. Printed as one JSON line; recorded
  * in BASELINE.md.
  *
  * Broker-backed mode: set GRAFT_TPUT_BROKER=host:port (and
  * GRAFT_TPUT_TOPICS=t1,t2, default graft-tput-1/2) on a cluster with
  * the spark-sql-kafka connector (build.sbt SPARK_GRAFT_KAFKA block) to
  * drain the SAME double-agent topology from two pre-produced Kafka
  * topics — the reference's exact double-agent.rs setup. The drain is
  * timed from earliest offsets with availableNow semantics via
  * processAllAvailable.
  */
object ThroughputBench {

  val msgBytes = new AtomicLong(0L)
  val msgCount = new AtomicLong(0L)

  def main(args: Array[String]): Unit = {
    val rounds = sys.env.getOrElse("GRAFT_TPUT_ROUNDS", "10").toInt
    val perBatch = sys.env.getOrElse("GRAFT_TPUT_BATCH", "1000").toInt
    val broker = sys.env.get("GRAFT_TPUT_BROKER")
    val spark = Graft.session("graft-throughput")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val payload = "a" * 74000 // ~74 KB, like producer.py's 74-char URL x 1000
    val batch = Seq.fill(perBatch)(payload)

    val in1 = MemoryStream[String]
    val in2 = MemoryStream[String]
    val app = new GraftApp(spark, "tput", Files.createTempDirectory("graft-tput").toString)

    // broker mode reads the pre-produced topics from earliest; memory
    // mode gets batches pushed below. Both feed the same value column
    // shape through identical agents.
    val topics = sys.env.getOrElse("GRAFT_TPUT_TOPICS", "graft-tput-1,graft-tput-2")
      .split(",").map(_.trim)
    def source(i: Int): () => DataFrame = broker match {
      case Some(servers) =>
        () =>
          graft.streaming.Sources
            .kafka(spark, servers, topics(i), startingOffsets = "earliest")
            .select($"value".cast("string").as("value"))
      case None =>
        if (i == 0) () => in1.toDF() else () => in2.toDF()
    }

    def sink: GraftSink = GraftSink.ForeachBatch { (df: DataFrame, _: Long) =>
      val r = df.agg(count(lit(1)), sum(length($"value"))).collect()(0)
      msgCount.addAndGet(r.getLong(0))
      if (!r.isNullAt(1)) msgBytes.addAndGet(r.getLong(1))
      ()
    }
    app.agent("double-agent-1", source(0), sink)(identity)
    app.agent("double-agent-2", source(1), sink)(identity)
    app.startAll()

    if (broker.isEmpty) {
      // warmup round (plan compilation, codegen) — not timed
      in1.addData(batch); in2.addData(batch)
      app.processAllAvailable("double-agent-1")
      app.processAllAvailable("double-agent-2")
      msgBytes.set(0L); msgCount.set(0L)

      // pre-produce the whole backlog (the reference's producer.py runs
      // before its timing window), then time the drain only
      var r = 0
      while (r < rounds) { in1.addData(batch); in2.addData(batch); r += 1 }
    } else if (sys.env.contains("GRAFT_TPUT_PRODUCE")) {
      // producer.py parity: batch-produce rounds×perBatch 74 KB messages
      // into each topic BEFORE the timing window (untimed, like the
      // reference's separate producer process)
      val backlog = spark.range(rounds.toLong * perBatch)
        .select(lit(payload).cast("binary").as("value"))
      topics.foreach(t =>
        backlog.write.format("kafka")
          .option("kafka.bootstrap.servers", broker.get)
          .option("topic", t).save())
    }

    val t0 = System.nanoTime()
    app.processAllAvailable("double-agent-1")
    app.processAllAvailable("double-agent-2")
    val sec = (System.nanoTime() - t0) / 1e9
    app.stopAll()
    val mb = msgBytes.get() / 1e6
    val src = broker.fold("memory")(_ => "kafka")
    println(
      s"""{"metric":"stream_consume_throughput","value":${mb / sec},"unit":"MB/sec",""" +
        s""""source":"$src","messages":${msgCount.get()},"payload_bytes":74000,""" +
        s""""agents":2,"seconds":$sec}""")
    spark.stop()
  }
}
