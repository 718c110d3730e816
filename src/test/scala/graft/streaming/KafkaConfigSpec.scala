package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Typed Kafka security + topic-admin surface: the validated option-map
  * generation the reference does in enums.rs:60-145 + app.rs:493-571
  * (security) and ctopic.rs:90-119 (topic_declare), enforced at build
  * time. Pure data — no broker needed.
  */
class KafkaConfigSpec extends AnyFunSuite {
  import KafkaSecurity._

  test("protocol/mechanism parsing: TryFrom parity — knowns map, unknowns are errors") {
    assert(protocolOf("PLAINTEXT") === Plaintext)
    assert(protocolOf("SSL") === Ssl)
    assert(protocolOf("SASL_PLAINTEXT") === SaslPlaintext)
    assert(protocolOf("SASL_SSL") === SaslSsl)
    val e = intercept[IllegalArgumentException](protocolOf("ssl"))
    assert(e.getMessage.contains("Unknown security protocol"))

    assert(mechanismOf("SCRAM-SHA-512") === ScramSha512)
    assert(mechanismOf("GSSAPI") === GssApi)
    val m = intercept[IllegalArgumentException](mechanismOf("scram"))
    assert(m.getMessage.contains("Unknown SASL mechanism"))
  }

  test("illegal protocol/leg combinations are rejected at build time") {
    // PLAINTEXT carries nothing
    intercept[IllegalArgumentException](
      KafkaSecurity(Plaintext, ssl = Some(SslConfig())))
    intercept[IllegalArgumentException](
      KafkaSecurity(Plaintext,
        sasl = Some(SaslConfig(Plain, Some("u"), Some("p")))))
    // SSL-only carries no SASL; SASL_PLAINTEXT carries no SSL
    intercept[IllegalArgumentException](
      KafkaSecurity(Ssl, sasl = Some(SaslConfig(Plain, Some("u"), Some("p")))))
    intercept[IllegalArgumentException](
      KafkaSecurity(SaslPlaintext,
        ssl = Some(SslConfig()), sasl = Some(SaslConfig(Plain, Some("u"), Some("p")))))
    // SASL protocols require the SASL leg
    intercept[IllegalArgumentException](KafkaSecurity(SaslPlaintext))
    intercept[IllegalArgumentException](KafkaSecurity(SaslSsl))
    // mechanism-level requirements
    intercept[IllegalArgumentException](SaslConfig(Plain)) // no credentials
    intercept[IllegalArgumentException](SaslConfig(GssApi, Some("u"), Some("p"))) // needs jaas
  }

  test("PLAIN/SCRAM generate the right JAAS stanza, credentials escaped") {
    val plain = SaslConfig(Plain, Some("user"), Some("""pa"ss\word""")).options
    assert(plain("sasl.mechanism") === "PLAIN")
    assert(plain("sasl.jaas.config") ===
      """org.apache.kafka.common.security.plain.PlainLoginModule required username="user" password="pa\"ss\\word";""")
    val scram = SaslConfig(ScramSha256, Some("u"), Some("p")).options
    assert(scram("sasl.jaas.config").startsWith(
      "org.apache.kafka.common.security.scram.ScramLoginModule required"))
    // explicit stanza wins
    val oauth = SaslConfig(OauthBearer, jaasConfig = Some("custom module;")).options
    assert(oauth("sasl.jaas.config") === "custom module;")
  }

  test("full SASL_SSL config emits client options and kafka.-prefixed source options") {
    val sec = KafkaSecurity(
      SaslSsl,
      ssl = Some(SslConfig(
        truststoreLocation = Some("/etc/ca.jks"),
        truststorePassword = Some("ts"),
        endpointIdentificationAlgorithm = Some(EndpointHttps))),
      sasl = Some(SaslConfig(ScramSha512, Some("u"), Some("p"))))
    val c = sec.clientOptions
    assert(c("security.protocol") === "SASL_SSL")
    assert(c("ssl.truststore.location") === "/etc/ca.jks")
    assert(c("ssl.endpoint.identification.algorithm") === "https")
    assert(c("sasl.mechanism") === "SCRAM-SHA-512")
    val s = sec.sourceOptions
    assert(s.keySet === c.keySet.map("kafka." + _))
    assert(s("kafka.security.protocol") === "SASL_SSL")
  }

  test("TopicSpec: ctopic.rs:107-112 cleanup.policy matrix + retention + validation") {
    assert(TopicSpec("t", 4).cleanupPolicy === None)
    assert(TopicSpec("t", 4, compacting = true).cleanupPolicy === Some("compact"))
    assert(TopicSpec("t", 4, deleting = true).cleanupPolicy === Some("delete"))
    assert(TopicSpec("t", 4, compacting = true, deleting = true).cleanupPolicy
      === Some("compact,delete"))

    val spec = TopicSpec("events-v2", partitions = 12, replication = 3,
      compacting = true, retentionMs = Some(86400000L),
      extraConfigs = Map("min.insync.replicas" -> "2"))
    assert(spec.configs === Map(
      "cleanup.policy" -> "compact",
      "retention.ms" -> "86400000",
      "min.insync.replicas" -> "2"))

    intercept[IllegalArgumentException](TopicSpec("", 1))
    intercept[IllegalArgumentException](TopicSpec("bad topic", 1)) // space
    intercept[IllegalArgumentException](TopicSpec("t", 0))
    intercept[IllegalArgumentException](TopicSpec("t", 1, replication = 0))
    intercept[IllegalArgumentException](TopicSpec("t", 1, retentionMs = Some(0L)))
    assert(TopicSpec("t", 1, retentionMs = Some(-1L)).configs("retention.ms") === "-1")
  }

  test("declare without kafka-clients on the classpath names the missing coordinates") {
    val e = intercept[ClassNotFoundException](
      TopicAdmin.declare("localhost:9092", TopicSpec("t", 1)))
    assert(e.getMessage.contains("kafka-clients"))
    assert(e.getMessage.contains("spark-sql-kafka-0-10"))
  }
}
