package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

/** LIVE-broker end-to-end: the reference's entire identity is the
  * consume→process→produce loop (callysto/src/kafka/cconsumer.rs:85-122;
  * examples/src/double-agent.rs:82-95), and everything else in this suite
  * drives that loop through MemoryStream. This spec runs it against a real
  * (embedded, KRaft) broker:
  *
  *   1. `TopicAdmin.declare` a compacted topic and verify partitions +
  *      cleanup.policy BROKER-side (ctopic.rs:90-119 / cadmin.rs parity);
  *   2. produce → [[GraftApp]] agent (`Sources.kafka` → transform →
  *      `GraftSink.Kafka`) → consume back, asserting consumed == produced;
  *   3. stop the agent, produce more, restart — the checkpoint must resume
  *      offsets exactly (no replays, no loss), the reference's manual
  *      commit-after-process contract.
  *
  * Gating: the container is zero-egress with no Kafka jars, so this spec
  * CANCELS (never silently passes) unless the build ran with
  * `SPARK_GRAFT_KAFKA=1`, which pins the connector + kafka-clients + an
  * embedded-broker harness (build.sbt). The spec itself compiles either
  * way — Spark's `format("kafka")` is a runtime string lookup, and the
  * broker harness ([[KafkaLiveHarness]], gated source dir) is reached by
  * reflection.
  */
class KafkaLiveSpec extends SparkSpec {

  private val flagOn = sys.env.get("SPARK_GRAFT_KAFKA").exists(_.nonEmpty)

  /** The gated-source-dir harness, if this build compiled it. */
  private lazy val harness: Option[AnyRef] =
    try Some(Class.forName("graft.streaming.KafkaLiveHarness$").getField("MODULE$").get(null))
    catch { case _: ClassNotFoundException => None }

  private def call(method: String, args: AnyRef*): AnyRef = {
    val h = harness.get
    val m = h.getClass.getMethods
      .find(m => m.getName == method && m.getParameterCount == args.length)
      .getOrElse(throw new NoSuchMethodException(s"KafkaLiveHarness.$method/${args.length}"))
    try m.invoke(h, args: _*)
    catch { case e: java.lang.reflect.InvocationTargetException => throw e.getCause }
  }

  test("declare → produce → agent transform → produce → consume, with checkpointed restart") {
    assume(flagOn,
      "SPARK_GRAFT_KAFKA is not set: no Kafka jars in this zero-egress container — " +
        "live-broker loop canceled, not skipped silently")
    assume(harness.nonEmpty,
      "KafkaLiveHarness missing: rebuild with SPARK_GRAFT_KAFKA=1 so the gated test source dir compiles")

    import spark.implicits._
    val inTopic  = "graft-live-in"
    val outTopic = "graft-live-out"
    val bootstrap = call("startBroker").asInstanceOf[String]
    try {
      // --- 1. topic_declare parity, verified broker-side ---------------
      TopicAdmin.declare(bootstrap, TopicSpec(inTopic, partitions = 2, deleting = true))
      TopicAdmin.declare(
        bootstrap,
        TopicSpec(outTopic, partitions = 1, compacting = true, retentionMs = Some(86400000L)))
      assert(call("describeTopic", outTopic) == "partitions=1;cleanup.policy=compact")
      assert(call("describeTopic", inTopic) == "partitions=2;cleanup.policy=delete")

      def produce(ids: Range): Unit =
        ids.toDF("v")
          .selectExpr("CAST(CAST(v AS STRING) AS BINARY) AS value")
          .write.format("kafka")
          .option("kafka.bootstrap.servers", bootstrap)
          .option("topic", inTopic)
          .save()

      // --- 2. the double-agent loop ------------------------------------
      produce(0 until 100)
      val ck  = Files.createTempDirectory("graft-live-ck").toString
      val app = new GraftApp(spark, "live", ck)
      app.agent(
        "doubler",
        () => Sources.kafka(spark, bootstrap, inTopic),
        GraftSink.Kafka(bootstrap, outTopic, None),
        outputMode = "append")(df =>
        df.selectExpr("CAST(value AS STRING) AS v")
          .selectExpr("v AS key", "CAST(CAST(v AS BIGINT) * 2 AS STRING) AS value"))
      app.start("doubler")
      app.processAllAvailable("doubler")
      app.stop("doubler")

      // --- 3. restart: offsets resume from the checkpoint --------------
      produce(100 until 150)
      app.start("doubler")
      app.processAllAvailable("doubler")
      app.stop("doubler")

      val out = spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", outTopic)
        .option("startingOffsets", "earliest")
        .load()
        .selectExpr("CAST(value AS STRING) AS v")
        .as[String].collect().map(_.toLong).sorted.toSeq

      // 150 in → exactly 150 out across the restart: nothing replayed
      // (offsets committed with the batch), nothing lost (offsets not
      // committed ahead of processing) — cconsumer.rs's manual-commit
      // contract, enforced by the checkpoint.
      assert(out == (0 until 150).map(_ * 2L))
    } finally {
      call("stopBroker")
    }
  }
}
