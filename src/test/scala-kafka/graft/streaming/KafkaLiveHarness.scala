package graft.streaming

import java.nio.file.{Files, Path}
import java.util.{Collections, Properties}

import kafka.server.{KafkaConfig, KafkaRaftServer}
import kafka.tools.StorageTool
import org.apache.kafka.clients.admin.Admin
import org.apache.kafka.common.Uuid
import org.apache.kafka.common.config.ConfigResource
import org.apache.kafka.common.utils.{Exit, Time}

/** Embedded single-node KRaft broker for [[KafkaLiveSpec]].
  *
  * This file lives in the SPARK_GRAFT_KAFKA-gated source dir (build.sbt):
  * it is the only code in the repo that needs kafka-core at COMPILE time.
  * The spec reaches it reflectively so the rest of the suite builds and
  * runs in the jar-less container. Combined-mode broker+controller on two
  * ephemeral ports, single replica everywhere — the minimal cluster the
  * reference's consume→process→produce loop
  * (callysto/examples/src/double-agent.rs:82-95) needs to run for real.
  */
object KafkaLiveHarness {

  private var server: KafkaRaftServer = _
  private var dir: Path = _
  private var bootstrapServers: String = _

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort
    finally s.close()
  }

  /** Format storage, start the broker, return `host:port` for clients. */
  def startBroker(): String = synchronized {
    require(server == null, "broker already running")
    dir = Files.createTempDirectory("graft-kraft")
    val port = freePort()
    val ctrl = freePort()
    val props = new Properties()
    props.put("process.roles", "broker,controller")
    props.put("node.id", "1")
    props.put("controller.quorum.voters", s"1@localhost:$ctrl")
    props.put("listeners", s"PLAINTEXT://localhost:$port,CONTROLLER://localhost:$ctrl")
    props.put("advertised.listeners", s"PLAINTEXT://localhost:$port")
    props.put("controller.listener.names", "CONTROLLER")
    props.put("listener.security.protocol.map", "PLAINTEXT:PLAINTEXT,CONTROLLER:PLAINTEXT")
    props.put("inter.broker.listener.name", "PLAINTEXT")
    props.put("log.dirs", dir.resolve("data").toString)
    props.put("metadata.log.dir", dir.resolve("meta").toString)
    props.put("offsets.topic.replication.factor", "1")
    props.put("transaction.state.log.replication.factor", "1")
    props.put("transaction.state.log.min.isr", "1")
    props.put("group.initial.rebalance.delay.ms", "0")
    props.put("auto.create.topics.enable", "false")

    // kafka-storage.sh format, in-process: StorageTool exits through
    // Exit.exit, so intercept the exit procedure for the call.
    val cfgFile = dir.resolve("server.properties")
    val w = Files.newBufferedWriter(cfgFile)
    props.forEach((k, v) => w.write(s"$k=$v\n"))
    w.close()
    Exit.setExitProcedure((code: Int, msg: String) =>
      if (code != 0)
        throw new IllegalStateException(s"kafka-storage format failed ($code): $msg"))
    try StorageTool.main(Array("format", "-t", Uuid.randomUuid().toString, "-c", cfgFile.toString))
    finally Exit.resetExitProcedure()

    server = new KafkaRaftServer(new KafkaConfig(props), Time.SYSTEM)
    server.startup()
    bootstrapServers = s"localhost:$port"
    bootstrapServers
  }

  def stopBroker(): Unit = synchronized {
    if (server != null) {
      server.shutdown()
      server.awaitShutdown()
      server = null
    }
    if (dir != null) {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toList.reverse
        .foreach(p => Files.deleteIfExists(p))
      dir = null
    }
  }

  /** Broker-side view of a topic, for `topic_declare` parity assertions
    * (ctopic.rs:90-119): partition count and effective cleanup.policy.
    */
  def describeTopic(topic: String): String = {
    val props = new Properties()
    props.put("bootstrap.servers", bootstrapServers)
    val admin = Admin.create(props)
    try {
      val desc = admin
        .describeTopics(Collections.singletonList(topic))
        .allTopicNames().get().get(topic)
      val cr = new ConfigResource(ConfigResource.Type.TOPIC, topic)
      val cfg = admin.describeConfigs(Collections.singletonList(cr)).all().get().get(cr)
      s"partitions=${desc.partitions().size()};cleanup.policy=${cfg.get("cleanup.policy").value()}"
    } finally admin.close()
  }
}
