package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Agent lifecycle states — the reference's `Service` state machine
  * (PreStart/Running/Stopped/Restarting/Crashed, reference:
  * callysto/src/types/service.rs:33-93) mapped onto StreamingQuery status.
  */
object AgentState extends Enumeration {
  val PreStart, Running, Stopped, Crashed = Value
}

/** One registered agent: a named streaming pipeline `source → transform →
  * sink` — the Spark analog of `app.agent(name, topic, closure)`
  * (reference: callysto/src/app.rs:284-300; exec loop
  * callysto/src/types/agent.rs:104-147). One agent = one StreamingQuery.
  *
  * `trigger` carries the reference's timer semantics
  * (`timer(interval_seconds)`, callysto/src/types/timer.rs:23-80 →
  * `Trigger.ProcessingTime`): the closure re-fires per interval with
  * whatever new data arrived.
  */
final case class AgentDef(
    name: String,
    source: () => DataFrame,
    transform: DataFrame => DataFrame,
    sink: GraftSink,
    trigger: Trigger,
    outputMode: String
)

/** The engine's app container: register agents, start/stop them, inspect
  * their state — `Callysto::new().agent(...).run()` parity
  * (callysto/src/app.rs:87-235,644-665) with Spark supplying the
  * scheduling, recovery, and restart the reference implements by hand.
  *
  * Checkpointing: every agent checkpoints under `checkpointRoot/<name>`,
  * so `stop()` + `start()` resumes source offsets AND stateful-operator
  * state exactly where it left off — the recovery path the reference
  * drives by replaying changelog topics (runtime/recovery.rs:51-99),
  * here transactional with the sink batch ids.
  */
final class GraftApp(val spark: SparkSession, val name: String, val checkpointRoot: String) {

  private val agents = mutable.LinkedHashMap.empty[String, AgentDef]
  private val running = mutable.Map.empty[String, StreamingQuery]

  /** Register an agent. `source` is a thunk so a fresh streaming DataFrame
    * is built on every (re)start.
    */
  def agent(
      name: String,
      source: () => DataFrame,
      sink: GraftSink,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      outputMode: String = "update"
  )(transform: DataFrame => DataFrame): this.type = {
    require(!agents.contains(name), s"agent '$name' already registered")
    agents += name -> AgentDef(name, source, transform, sink, trigger, outputMode)
    this
  }

  /** One-off startup job — `app.task(closure)` parity
    * (callysto/src/types/task.rs:21-86): plain driver code executed before
    * the streaming queries spin up.
    */
  def task(f: SparkSession => Unit): this.type = { f(spark); this }

  /** Stateful agent with an attached table — `app.table_agent` parity
    * (reference: callysto/src/app.rs:302-325, types/table_agent.rs:116-179):
    * the closure maps incoming frames to table ops; the agent applies them
    * to keyed state and forwards the applied changelog to the sink —
    * exactly the message→`table.set(...)`→changelog flow of the reference's
    * table examples (examples/src/inmemory.rs:15-23).
    */
  def tableAgent[K, V](
      name: String,
      source: () => DataFrame,
      sink: GraftSink,
      trigger: Trigger = Trigger.ProcessingTime(0L)
  )(toOps: DataFrame => Dataset[StateOp[K, V]])(implicit
      kEnc: org.apache.spark.sql.Encoder[K],
      vEnc: org.apache.spark.sql.Encoder[V],
      cEnc: org.apache.spark.sql.Encoder[StateChange[K, V]]
  ): this.type =
    agent(name, source, sink, trigger, outputMode = "update")(df =>
      StateTable.changes(toOps(df)).toDF())

  def start(name: String): StreamingQuery = {
    val a = agents.getOrElse(name, throw new NoSuchElementException(s"no agent '$name'"))
    require(!running.get(name).exists(_.isActive), s"agent '$name' already running")
    val df = a.transform(a.source())
    val base = df.writeStream
      .queryName(s"${this.name}-${a.name}")
      .outputMode(a.outputMode)
      .trigger(a.trigger)
      .option("checkpointLocation", s"$checkpointRoot/${a.name}")
    val q = a.sink match {
      case GraftSink.ForeachBatch(f) => base.foreachBatch(f).start()
      case GraftSink.Memory(qn)      => base.format("memory").queryName(qn).start()
      case GraftSink.Parquet(path)   => base.format("parquet").option("path", path).start()
      case GraftSink.Kafka(servers, topic, security) =>
        val b = base
          .format("kafka")
          .option("kafka.bootstrap.servers", servers)
          .option("topic", topic)
        security.map(_.sourceOptions).getOrElse(Map.empty)
          .foldLeft(b) { case (acc, (k, v)) => acc.option(k, v) }
          .start()
      case GraftSink.Jdbc(url, table, batchSize) =>
        base.foreachBatch(Sinks.jdbcWriteBatch(url, table, batchSize) _).start()
      case GraftSink.Elastic(index, idCol, transport, perBulk) =>
        base.foreachBatch(EsSink.bulkWriter(index, idCol, transport, perBulk) _).start()
    }
    running += name -> q
    q
  }

  def startAll(): Seq[StreamingQuery] = agents.keys.toSeq.map(start)

  def stop(name: String): Unit = running.get(name).foreach(_.stop())

  def stopAll(): Unit = running.values.foreach(_.stop())

  /** Block until the named agent has processed everything currently
    * available (test/batch-drain helper).
    */
  def processAllAvailable(name: String): Unit =
    running.get(name).foreach(_.processAllAvailable())

  def state(name: String): AgentState.Value = running.get(name) match {
    case None                        => AgentState.PreStart
    case Some(q) if q.isActive       => AgentState.Running
    case Some(q) if q.exception.isDefined => AgentState.Crashed
    case Some(_)                     => AgentState.Stopped
  }

  def query(name: String): Option[StreamingQuery] = running.get(name)

  /** Latest micro-batch progress — the reference's consumer-statistics
    * surface (librdkafka stats → CStatistics, callysto/src/kafka/
    * contexts.rs:12-56; throughput self-instrumentation in
    * examples/src/double-agent.rs:36-48). `inputRowsPerSecond` /
    * `numInputRows` are the engine-native counters.
    */
  def progress(name: String): Option[org.apache.spark.sql.streaming.StreamingQueryProgress] =
    running.get(name).flatMap(q => Option(q.lastProgress))

  def registered: Seq[String] = agents.keys.toSeq
}
