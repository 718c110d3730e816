package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Agent lifecycle parity: two concurrent agents on one session with
  * shared driver state (the reference's double-agent example,
  * examples/src/double-agent.rs:82-95), state-machine transitions, and
  * restart-from-checkpoint continuing exactly where the agent stopped.
  */
class AgentsSpec extends SparkSpec {

  private def counterSink(into: ConcurrentHashMap[String, Long]): GraftSink =
    GraftSink.ForeachBatch { (df: DataFrame, _: Long) =>
      df.collect().foreach(r => into.put(r.getString(0), r.getLong(1)))
      ()
    }

  test("two agents run concurrently on one session and both count (double-agent parity)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val in1 = MemoryStream[String]
    val in2 = MemoryStream[String]
    val counts = new ConcurrentHashMap[String, Long]()
    val app = new GraftApp(s, "double-agent", Files.createTempDirectory("graft-app").toString)

    app.agent("agent-1", () => in1.toDF(), counterSink(counts))(
      _.select(lit("agent-1").as("agent"))
        .groupBy($"agent")
        .count()
    )
    app.agent("agent-2", () => in2.toDF(), counterSink(counts))(
      _.select(lit("agent-2").as("agent"))
        .groupBy($"agent")
        .count()
    )
    assert(app.registered === Seq("agent-1", "agent-2"))
    assert(app.state("agent-1") === AgentState.PreStart)

    app.startAll()
    assert(app.state("agent-1") === AgentState.Running)
    assert(app.state("agent-2") === AgentState.Running)

    in1.addData("m1", "m2", "m3")
    in2.addData("m1", "m2")
    app.processAllAvailable("agent-1")
    app.processAllAvailable("agent-2")
    assert(counts.get("agent-1") === 3L)
    assert(counts.get("agent-2") === 2L)

    app.stopAll()
    assert(app.state("agent-1") === AgentState.Stopped)
    assert(app.state("agent-2") === AgentState.Stopped)
  }

  test("chained agents: agent-1's file sink is agent-2's source (topic-bridge parity)") {
    // callysto chains agents through intermediate topics (producer in one
    // agent, consumer group in the next — examples/src/avro-sink.rs:40-56);
    // with no broker in the container the durable hand-off medium is a
    // parquet directory: agent-1 appends files, agent-2's directory-
    // watching source turns each new file into a micro-batch.
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val in = MemoryStream[Long]
    val bridge = Files.createTempDirectory("graft-bridge").toString
    val counts = new ConcurrentHashMap[String, Long]()
    val app = new GraftApp(s, "chain", Files.createTempDirectory("graft-app").toString)

    app.agent("upstream", () => in.toDF(), GraftSink.Parquet(bridge), outputMode = "append")(
      _.filter($"value" % 2 === 0).select($"value".as("v"))
    )
    app.start("upstream")
    in.addData(1L, 2L, 3L, 4L, 5L, 6L)
    app.processAllAvailable("upstream")

    val schemaSource = Seq.empty[Long].toDF("v")
    app.agent("downstream", () => Sources.parquetDir(s, bridge, schemaSource),
      counterSink(counts))(
      _.select(lit("evens").as("k"), $"v").groupBy($"k").count()
    )
    app.start("downstream")
    app.processAllAvailable("downstream")
    assert(counts.get("evens") === 3L, s"expected 3 even rows through the bridge, got $counts")

    // a second wave flows through BOTH hops end-to-end
    in.addData(7L, 8L, 10L)
    app.processAllAvailable("upstream")
    app.processAllAvailable("downstream")
    assert(counts.get("evens") === 5L, s"second wave lost in the bridge: $counts")

    app.stopAll()
  }

  test("agent restart resumes counts from checkpoint") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val in = MemoryStream[String]
    val counts = new ConcurrentHashMap[String, Long]()
    val app = new GraftApp(s, "restarter", Files.createTempDirectory("graft-app-rs").toString)
    app.agent("counter", () => in.toDF(), counterSink(counts))(
      _.select(lit("k").as("agent")).groupBy($"agent").count()
    )

    app.start("counter")
    in.addData("a", "b")
    app.processAllAvailable("counter")
    assert(counts.get("k") === 2L)
    app.stop("counter")

    // Data arriving while stopped + restart: the running count must
    // CONTINUE (2 + 3 = 5), proving offsets and agg state were recovered.
    in.addData("c", "d", "e")
    app.start("counter")
    app.processAllAvailable("counter")
    app.stop("counter")
    assert(counts.get("k") === 5L)
  }

  test("table agent routes messages into keyed state and emits the changelog (inmemory.rs parity)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val in = MemoryStream[Long]
    val changes = new java.util.concurrent.ConcurrentLinkedQueue[(String, Option[Long])]()
    val app = new GraftApp(s, "table-app", Files.createTempDirectory("graft-ta").toString)
    // even/odd routing into a table, like examples/src/inmemory.rs:15-23:
    // even numbers upsert under key "even-<n%4>", odd ones delete that slot
    app.tableAgent[String, Long](
      "evens",
      () => in.toDF(),
      GraftSink.ForeachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach(r =>
          changes.add((r.getString(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))))
        ()
      }
    ) { df =>
      df.as[Long].map { n =>
        if (n % 2 == 0) StateOp.set(s"slot-${n % 4}", n) else StateOp.del[String, Long](s"slot-${n % 4}")
      }
    }
    app.start("evens")
    in.addData(0L, 2L, 3L, 4L)
    app.processAllAvailable("evens")
    app.stop("evens")

    import scala.jdk.CollectionConverters._
    val byKey = changes.asScala.toList.groupBy(_._1)
    assert(byKey("slot-0").map(_._2).toSet === Set(Some(0L), Some(4L))) // two upserts
    assert(byKey("slot-2").map(_._2) === List(Some(2L)))
    assert(byKey("slot-3").map(_._2) === List(None)) // odd 3 → tombstone
  }

  test("AvailableNow agent drains the backlog and stops on its own (batch-drain mode)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val in = MemoryStream[String]
    in.addData("a", "b", "c") // backlog exists BEFORE the agent starts
    val counts = new ConcurrentHashMap[String, Long]()
    val app = new GraftApp(s, "drainer", Files.createTempDirectory("graft-drain").toString)
    app.agent(
      "drain",
      () => in.toDF(),
      counterSink(counts),
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()
    )(_.select(lit("k").as("agent")).groupBy($"agent").count())

    val q = app.start("drain")
    q.awaitTermination(30000)
    assert(!q.isActive, "AvailableNow query should terminate after draining")
    assert(counts.get("k") === 3L)
    assert(app.state("drain") === AgentState.Stopped)
  }

  test("stream-static join enriches a stream against a batch dimension (broadcast, no state)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val in = MemoryStream[String]
    val dim = Seq(("click", 1.0), ("view", 0.5)).toDF("event_type", "weight")
    val out = new ConcurrentHashMap[String, Long]()
    val app = new GraftApp(s, "enricher", Files.createTempDirectory("graft-enrich").toString)
    app.agent(
      "enrich",
      () => in.toDF(),
      GraftSink.ForeachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach(r => out.merge(r.getString(0), 1L, (a, b) => a + b))
        ()
      }
    )(_.withColumnRenamed("value", "event_type")
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("event_type"), "inner")
      .select($"event_type"))

    app.start("enrich")
    in.addData("click", "view", "click", "scroll") // scroll has no dim row
    app.processAllAvailable("enrich")
    app.stop("enrich")
    assert(out.get("click") === 2L)
    assert(out.get("view") === 1L)
    assert(!out.containsKey("scroll"), "inner stream-static join must drop unmatched rows")
  }

  test("a failing agent surfaces Crashed and a restart replays the failed batch (restart-on-crash parity)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val in = MemoryStream[String]
    val explode = new java.util.concurrent.atomic.AtomicBoolean(true)
    val counts = new ConcurrentHashMap[String, Long]()
    val app = new GraftApp(s, "crashy-app", Files.createTempDirectory("graft-crash").toString)
    app.agent(
      "crashy",
      () => in.toDF(),
      GraftSink.ForeachBatch { (df: DataFrame, _: Long) =>
        if (explode.get()) throw new RuntimeException("injected sink failure")
        df.collect().foreach(r => counts.put(r.getString(0), r.getLong(1)))
        ()
      }
    )(_.select(lit("k").as("agent")).groupBy($"agent").count())

    app.start("crashy")
    in.addData("a", "b")
    intercept[Exception] { app.processAllAvailable("crashy") }
    assert(app.state("crashy") === AgentState.Crashed)

    // the reference's onthefly restart loop: clear the fault, start again —
    // the FAILED batch must replay from the checkpoint (nothing lost)
    explode.set(false)
    app.start("crashy")
    app.processAllAvailable("crashy")
    assert(app.state("crashy") === AgentState.Running)
    assert(counts.get("k") === 2L, "failed batch was not replayed after restart")
    app.stop("crashy")
  }

  test("task runs driver-side work at registration (task parity)") {
    var ran = false
    val app = new GraftApp(spark, "tasker", Files.createTempDirectory("graft-task").toString)
    app.task(_ => ran = true)
    assert(ran)
  }
}
