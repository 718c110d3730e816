ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "callystospark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Live-Kafka path: this container is zero-egress and ships no Kafka
// connector, so the exact coordinates are pinned behind an opt-in flag
// rather than breaking offline resolution. Where a network (or vendored
// jars) exists, `SPARK_GRAFT_KAFKA=1 sbt ...` enables the live
// consume/produce path (streaming/Sources.kafka, Sinks GraftSink.Kafka)
// and TopicAdmin.declare's reflective AdminClient call, plus an embedded
// KRaft broker for end-to-end tests. kafka-clients must match the Spark
// distribution's own pom (Spark 4.x line: kafka-clients 3.9.x).
libraryDependencies ++= (if (sys.env.contains("SPARK_GRAFT_KAFKA")) Seq(
  "org.apache.spark" %% "spark-sql-kafka-0-10" % "4.1.2",
  "org.apache.kafka" % "kafka-clients" % "3.9.1",
  "org.apache.kafka" %% "kafka" % "3.9.1" % Test, // embedded KRaft broker
) else Seq.empty)
// KafkaLiveSpec itself always compiles (it drives Kafka through Spark's
// format("kafka") strings and reflection, and cancels without the flag);
// only the embedded-broker harness needs kafka-core at COMPILE time, so it
// lives in a source dir that joins the build only when the jars resolve.
Test / unmanagedSourceDirectories ++=
  (if (sys.env.contains("SPARK_GRAFT_KAFKA"))
     Seq((Test / sourceDirectory).value / "scala-kafka")
   else Seq.empty)
Test / fork := true
run / fork := true
// Pass the forked process's stdout straight through: the bench driver
// parses Bench's one-line JSON from stdout, and sbt's default logger
// prefixes every line with "[info] ", which breaks that parse.
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
