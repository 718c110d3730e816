package graft.streaming

/** Topic administration — `topic_declare` parity
  * (callysto/src/kafka/ctopic.rs:90-119: partitions, replication,
  * `cleanup.policy` from the (compacting, deleting) pair, `retention.ms`;
  * callysto/src/kafka/cadmin.rs: the AdminClient wrapper it runs on).
  *
  * [[TopicSpec]] is the validated declaration — pure data, fully
  * spec-testable. [[TopicAdmin.declare]] executes it against
  * `org.apache.kafka.clients.admin.AdminClient`, resolved REFLECTIVELY:
  * this build ships no kafka-clients jar (zero-egress container, no
  * broker to test against — see build.sbt's SPARK_GRAFT_KAFKA note), so
  * a compile-time dependency would be dead weight, but any deployment
  * that puts kafka-clients on the classpath (every real Spark+Kafka
  * cluster does) gets a working declare with no rebuild.
  */
final case class TopicSpec(
    name: String,
    partitions: Int,
    replication: Short = 1,
    compacting: Boolean = false,
    deleting: Boolean = false,
    retentionMs: Option[Long] = None,
    extraConfigs: Map[String, String] = Map.empty
) {
  require(name.nonEmpty && name.length <= 249, s"invalid topic name: '$name'")
  require(
    name.forall(c => c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
    s"topic name may contain only [a-zA-Z0-9._-]: '$name'")
  require(partitions > 0, "partitions must be positive")
  require(replication > 0, "replication must be positive")
  require(retentionMs.forall(ms => ms > 0 || ms == -1L),
    "retention.ms must be positive, or -1 for unlimited")

  /** ctopic.rs:107-112's match on (compacting, deleting). */
  def cleanupPolicy: Option[String] = (compacting, deleting) match {
    case (true, true)   => Some("compact,delete")
    case (true, false)  => Some("compact")
    case (false, true)  => Some("delete")
    case (false, false) => None
  }

  /** The topic-level config map a NewTopic carries. */
  def configs: Map[String, String] =
    cleanupPolicy.map("cleanup.policy" -> _).toMap ++
      retentionMs.map(ms => "retention.ms" -> ms.toString) ++
      extraConfigs
}

object TopicAdmin {

  /** Create the topic on the cluster; returns once the creation call
    * completes. Throws `ClassNotFoundException` with the pinned
    * coordinates when kafka-clients is absent, and rethrows broker-side
    * failures (e.g. TopicExistsException) unwrapped.
    */
  def declare(
      bootstrapServers: String,
      spec: TopicSpec,
      security: Option[KafkaSecurity] = None,
      timeoutMs: Int = 30000
  ): Unit = {
    val props = new java.util.Properties()
    props.put("bootstrap.servers", bootstrapServers)
    props.put("request.timeout.ms", timeoutMs.toString)
    security.foreach(_.clientOptions.foreach { case (k, v) => props.put(k, v) })

    val cl = Thread.currentThread.getContextClassLoader
    val adminClass =
      try cl.loadClass("org.apache.kafka.clients.admin.AdminClient")
      catch {
        case _: ClassNotFoundException =>
          throw new ClassNotFoundException(
            "kafka-clients is not on the classpath — add " +
              "org.apache.kafka:kafka-clients (and for streaming I/O " +
              "org.apache.spark:spark-sql-kafka-0-10_2.13) matching your " +
              "Spark distribution; see build.sbt's SPARK_GRAFT_KAFKA block")
      }
    val newTopicClass = cl.loadClass("org.apache.kafka.clients.admin.NewTopic")
    val newTopic = newTopicClass
      .getConstructor(classOf[String], classOf[Int], classOf[Short])
      .newInstance(spec.name, Int.box(spec.partitions), Short.box(spec.replication))
    if (spec.configs.nonEmpty) {
      val cfg = new java.util.HashMap[String, String]()
      spec.configs.foreach { case (k, v) => cfg.put(k, v) }
      newTopicClass.getMethod("configs", classOf[java.util.Map[_, _]]).invoke(newTopic, cfg)
    }

    val admin = adminClass
      .getMethod("create", classOf[java.util.Properties])
      .invoke(null, props)
    try {
      val topics = java.util.Collections.singletonList(newTopic)
      val result = adminClass.getMethod("createTopics", classOf[java.util.Collection[_]])
        .invoke(admin, topics)
      val futures = result.getClass.getMethod("all").invoke(result)
      try futures.getClass.getMethod("get").invoke(futures)
      catch {
        // unwrap reflection + future wrapping down to the broker error
        case e: java.lang.reflect.InvocationTargetException =>
          e.getCause match {
            case ee: java.util.concurrent.ExecutionException if ee.getCause != null =>
              throw ee.getCause
            case c if c != null => throw c
            case _              => throw e
          }
      }
    } finally {
      admin.getClass.getMethod("close").invoke(admin)
    }
  }
}
