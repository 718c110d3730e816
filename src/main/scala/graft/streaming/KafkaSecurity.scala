package graft.streaming

/** Typed Kafka security configuration — the validated surface the
  * reference exposes as enums + config plumbing
  * (callysto/src/kafka/enums.rs:60-145 `SecurityProtocol`/`SaslMechanism`/
  * `EndpointIdentificationAlgorithm`; callysto/src/app.rs:493-571
  * `build_sasl_context`/`build_ssl_context`), instead of a raw string map
  * where a typo'd protocol or an SSL-only option under PLAINTEXT fails at
  * the broker, minutes into a job.
  *
  * Illegal combinations are rejected at BUILD time, exactly like the
  * reference's match on the protocol: PLAINTEXT carries no SSL/SASL
  * context, SSL carries only SSL, SASL_PLAINTEXT only SASL, SASL_SSL
  * both. PLAIN/SCRAM mechanisms require credentials; GSSAPI/OAUTHBEARER
  * require an explicit JAAS stanza.
  *
  * Key-name note: the reference configures librdkafka
  * (`sasl.username`, `ssl.ca.location`); Spark's Kafka connector drives
  * the JAVA client, whose equivalents are `sasl.jaas.config` and
  * truststore/keystore locations — [[KafkaSecurity.clientOptions]] emits
  * the Java-client names, [[KafkaSecurity.sourceOptions]] the same map
  * `kafka.`-prefixed for `readStream`/`writeStream.format("kafka")`.
  */
object KafkaSecurity {

  sealed abstract class SecurityProtocol(val wire: String)
  case object Plaintext extends SecurityProtocol("PLAINTEXT")
  case object Ssl extends SecurityProtocol("SSL")
  case object SaslPlaintext extends SecurityProtocol("SASL_PLAINTEXT")
  case object SaslSsl extends SecurityProtocol("SASL_SSL")

  /** enums.rs:83-97 TryFrom parity: unknown names are errors, not defaults. */
  def protocolOf(s: String): SecurityProtocol = s match {
    case "PLAINTEXT"      => Plaintext
    case "SSL"            => Ssl
    case "SASL_PLAINTEXT" => SaslPlaintext
    case "SASL_SSL"       => SaslSsl
    case r => throw new IllegalArgumentException(s"Unknown security protocol for Kafka: $r")
  }

  sealed abstract class SaslMechanism(val wire: String)
  case object GssApi extends SaslMechanism("GSSAPI")
  case object Plain extends SaslMechanism("PLAIN")
  case object ScramSha256 extends SaslMechanism("SCRAM-SHA-256")
  case object ScramSha512 extends SaslMechanism("SCRAM-SHA-512")
  case object OauthBearer extends SaslMechanism("OAUTHBEARER")

  /** enums.rs:130-145 TryFrom parity. */
  def mechanismOf(s: String): SaslMechanism = s match {
    case "GSSAPI"        => GssApi
    case "PLAIN"         => Plain
    case "SCRAM-SHA-256" => ScramSha256
    case "SCRAM-SHA-512" => ScramSha512
    case "OAUTHBEARER"   => OauthBearer
    case r => throw new IllegalArgumentException(s"Unknown SASL mechanism: $r")
  }

  sealed abstract class EndpointIdentification(val wire: String)
  case object EndpointNone extends EndpointIdentification("none")
  case object EndpointHttps extends EndpointIdentification("https")

  /** SASL leg. `jaasConfig` overrides the generated login-module stanza;
    * it is REQUIRED for GSSAPI/OAUTHBEARER (no universal user/password
    * shape exists) and optional for PLAIN/SCRAM (generated from the
    * credentials).
    */
  final case class SaslConfig(
      mechanism: SaslMechanism,
      username: Option[String] = None,
      password: Option[String] = None,
      jaasConfig: Option[String] = None
  ) {
    mechanism match {
      case Plain | ScramSha256 | ScramSha512 =>
        require(
          jaasConfig.isDefined || (username.isDefined && password.isDefined),
          s"${mechanism.wire} needs username+password (or an explicit jaasConfig)")
      case GssApi | OauthBearer =>
        require(
          jaasConfig.isDefined,
          s"${mechanism.wire} needs an explicit jaasConfig (no username/password shape)")
    }

    private def escape(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")

    def options: Map[String, String] = {
      val jaas = jaasConfig.getOrElse {
        val module = mechanism match {
          case Plain => "org.apache.kafka.common.security.plain.PlainLoginModule"
          case _     => "org.apache.kafka.common.security.scram.ScramLoginModule"
        }
        s"""$module required username="${escape(username.get)}" password="${escape(password.get)}";"""
      }
      Map("sasl.mechanism" -> mechanism.wire, "sasl.jaas.config" -> jaas)
    }
  }

  /** SSL leg (Java-client key names; every field optional, like the
    * reference's ssl context where each location is `Option`).
    */
  final case class SslConfig(
      truststoreLocation: Option[String] = None,
      truststorePassword: Option[String] = None,
      keystoreLocation: Option[String] = None,
      keystorePassword: Option[String] = None,
      keyPassword: Option[String] = None,
      endpointIdentificationAlgorithm: Option[EndpointIdentification] = None
  ) {
    def options: Map[String, String] =
      truststoreLocation.map("ssl.truststore.location" -> _).toMap ++
        truststorePassword.map("ssl.truststore.password" -> _) ++
        keystoreLocation.map("ssl.keystore.location" -> _) ++
        keystorePassword.map("ssl.keystore.password" -> _) ++
        keyPassword.map("ssl.key.password" -> _) ++
        endpointIdentificationAlgorithm.map(
          "ssl.endpoint.identification.algorithm" -> _.wire)
  }
}

/** The validated whole: protocol + the legs it permits (app.rs:501-517's
  * match, enforced at construction instead of silently dropped).
  */
final case class KafkaSecurity(
    protocol: KafkaSecurity.SecurityProtocol,
    ssl: Option[KafkaSecurity.SslConfig] = None,
    sasl: Option[KafkaSecurity.SaslConfig] = None
) {
  import KafkaSecurity._
  protocol match {
    case Plaintext =>
      require(ssl.isEmpty && sasl.isEmpty, "PLAINTEXT carries no SSL or SASL config")
    case Ssl =>
      require(sasl.isEmpty, "SSL (without SASL) carries no SASL config — use SASL_SSL")
    case SaslPlaintext =>
      require(sasl.isDefined, "SASL_PLAINTEXT requires a SASL config")
      require(ssl.isEmpty, "SASL_PLAINTEXT carries no SSL config — use SASL_SSL")
    case SaslSsl =>
      require(sasl.isDefined, "SASL_SSL requires a SASL config")
  }

  /** Raw Java-client option map (AdminClient / producer / consumer). */
  def clientOptions: Map[String, String] =
    Map("security.protocol" -> protocol.wire) ++
      ssl.map(_.options).getOrElse(Map.empty) ++
      sasl.map(_.options).getOrElse(Map.empty)

  /** The same map `kafka.`-prefixed, as Spark's source/sink expects. */
  def sourceOptions: Map[String, String] =
    clientOptions.map { case (k, v) => s"kafka.$k" -> v }
}
