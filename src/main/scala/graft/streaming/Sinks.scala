package graft.streaming

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{BinaryType, StringType}
import org.apache.spark.sql.functions._

/** Engine sinks — the Spark expressions of the reference's sink family
  * (SURVEY.md §2.3).
  *
  * Destinations the streaming layer can write to. Each is either a
  * first-class `writeStream` format or a `foreachBatch` function, matching
  * how callysto models sinks as `futures::Sink` implementations the stream
  * forwards into (`stream.forward(sink)`, examples/src/avro-sink.rs:40-56).
  */
sealed trait GraftSink

object GraftSink {
  /** Per-micro-batch callback — the escape hatch every external system
    * goes through (`foreachBatch`). Exactly-once only if `f` is
    * idempotent on (batchId) replays — same at-least-once contract as the
    * reference's sinks.
    */
  final case class ForeachBatch(f: (DataFrame, Long) => Unit) extends GraftSink

  /** In-memory table named `queryName` (tests / debugging). */
  final case class Memory(queryName: String) extends GraftSink

  /** Append parquet files under `path`. */
  final case class Parquet(path: String) extends GraftSink

  /** Kafka-shaped sink: rows must carry `key`/`value` binary columns (see
    * [[Sinks.kafkaShape]]); `format("kafka")` passthrough. `security` is
    * the typed SSL/SASL surface ([[KafkaSecurity]]) applied as
    * `kafka.`-prefixed options. The Kafka connector jar is not shipped in
    * this build, so this sink is validated structurally (schema contract)
    * and documented as cluster-only.
    */
  final case class Kafka(
      bootstrapServers: String,
      topic: String,
      security: Option[KafkaSecurity] = None
  ) extends GraftSink

  /** JDBC batch-upsert sink (CPostgresSink parity). */
  final case class Jdbc(url: String, table: String, batchSize: Int = 500) extends GraftSink

  /** Elasticsearch-style bulk-index sink (CElasticSearchSink parity);
    * `transport` posts one `_bulk` ndjson body (see [[EsSink]]).
    */
  final case class Elastic(
      index: String,
      idCol: String,
      transport: EsSink.Transport,
      actionsPerBulk: Int = 500
  ) extends GraftSink
}

object Sinks {

  /** Shape a DataFrame for a Kafka-format sink: serialize `keyCol` and
    * `valueCol` to binary, mirroring the producer contract of the
    * reference (`CProducer::send(topic, partition, key, payload)`,
    * callysto/src/kafka/cproducer.rs:24-41).
    */
  def kafkaShape(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    def toBin(name: String) = df.schema(name).dataType match {
      case BinaryType => col(name)
      case StringType => col(name).cast(BinaryType)
      case _          => to_json(struct(col(name))).cast(BinaryType)
    }
    df.select(toBin(keyCol).as("key"), toBin(valueCol).as("value"))
  }

  /** Fan one micro-batch out to several sinks from a SINGLE streaming
    * query — the multiplexed-sink pattern. In the reference, feeding both
    * Kafka and Postgres means two independently-committing consumers
    * (callysto/src/sinks/postgres.rs:24-150 + examples/src/avro-sink.rs:40-56);
    * here one query's offset commit covers every target, so the sinks can
    * never drift apart by more than one micro-batch. The frame is
    * persisted once so N writers share one evaluation of the upstream
    * plan instead of recomputing it per sink — at scale, re-running the
    * source scan per target is the difference between 1× and N× I/O.
    */
  def fanOut(writers: ((DataFrame, Long) => Unit)*)(df: DataFrame, batchId: Long): Unit = {
    df.persist()
    try writers.foreach(w => w(df, batchId))
    finally { df.unpersist(); () }
  }

  /** Write one micro-batch to a JDBC table with prepared-statement
    * batching — the semantics of the reference's Postgres sink (deadpool
    * connection + prepared-statement cache + row-at-a-time `query_raw`,
    * reference: callysto/src/sinks/postgres.rs:24-150), upgraded to
    * `addBatch`/`executeBatch` chunks of `batchSize` (row-at-a-time would
    * be a scale-killer over a WAN link).
    *
    * Runs per partition on the executors: N partitions → N connections,
    * the pool analog. At-least-once on retry — pair with an idempotent
    * schema (PK upsert) for effective exactly-once, like the reference.
    */
  def jdbcWriteBatch(url: String, table: String, batchSize: Int)(df: DataFrame, batchId: Long): Unit = {
    val schema = df.schema
    val cols = schema.fieldNames
    val sql =
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn: Connection = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          try {
            var pending = 0
            rows.foreach { row =>
              var i = 0
              while (i < cols.length) {
                ps.setObject(i + 1, row.get(i))
                i += 1
              }
              ps.addBatch()
              pending += 1
              if (pending >= batchSize) {
                ps.executeBatch()
                pending = 0
              }
            }
            if (pending > 0) ps.executeBatch()
            conn.commit()
          } finally ps.close()
        } finally conn.close()
      }
    }
  }

  /** Exactly-once JDBC writes on top of at-least-once replays: each
    * partition inserts its rows AND a (table, batch_id, partition_id)
    * marker in ONE transaction; a replayed partition sees its marker and
    * skips. This is the step beyond the reference, which stubs
    * exactly-once entirely (`ProcessingGuarantee::ExactlyOnce` →
    * `todo!()`, callysto/src/types/table.rs:149-159).
    *
    * The marker table MUST carry a primary key so the marker insert is the
    * serialization point — two concurrent attempts of the same partition
    * (speculation, zombie task + retry) both pass the read check, but only
    * one marker insert commits; the loser hits the constraint, rolls back
    * its rows, and skips:
    * `CREATE TABLE <logTable> (sink_table VARCHAR(128), batch_id BIGINT,
    * partition_id INT, PRIMARY KEY (sink_table, batch_id, partition_id))`.
    *
    * Contract: idempotence is keyed on the micro-batch's partition ids, so
    * the batch's partitioning must be deterministic across replays (true
    * for a checkpoint-replayed micro-batch recomputing the same plan; NOT
    * guaranteed across code/config changes mid-replay). For partition-
    * layout-independent guarantees, key rows themselves (PK upsert), like
    * the reference's postgres example schema would.
    */
  def jdbcWriteBatchExactlyOnce(
      url: String,
      table: String,
      logTable: String,
      batchSize: Int
  )(df: DataFrame, batchId: Long): Unit = {
    val cols = df.schema.fieldNames
    val insertSql =
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"
    df.foreachPartition { (rows: Iterator[Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val conn: Connection = DriverManager.getConnection(url)
      try {
        conn.setAutoCommit(false)
        val check = conn.prepareStatement(
          s"SELECT COUNT(*) FROM $logTable WHERE sink_table = ? AND batch_id = ? AND partition_id = ?")
        val committed =
          try {
            check.setString(1, table); check.setLong(2, batchId); check.setInt(3, pid)
            val rs = check.executeQuery()
            try { rs.next(); rs.getLong(1) > 0 }
            finally rs.close()
          } finally check.close()
        if (!committed) {
          val ps = conn.prepareStatement(insertSql)
          try {
            var pending = 0
            rows.foreach { row =>
              var i = 0
              while (i < cols.length) { ps.setObject(i + 1, row.get(i)); i += 1 }
              ps.addBatch()
              pending += 1
              if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
            }
            if (pending > 0) ps.executeBatch()
          } finally ps.close()
          val mark = conn.prepareStatement(
            s"INSERT INTO $logTable (sink_table, batch_id, partition_id) VALUES (?, ?, ?)")
          val won =
            try {
              mark.setString(1, table); mark.setLong(2, batchId); mark.setInt(3, pid)
              mark.executeUpdate()
              true
            } catch {
              // PK violation: a concurrent attempt committed first — this
              // attempt must NOT land its rows
              case _: java.sql.SQLIntegrityConstraintViolationException => false
              case e: java.sql.SQLException if e.getSQLState != null
                  && e.getSQLState.startsWith("23") => false
            } finally mark.close()
          if (won) conn.commit() // rows + marker land atomically
          else conn.rollback()
        } else {
          conn.rollback() // release the read txn opened by the marker check
        }
      } finally conn.close()
    }
  }

  /** CREATE TABLE helper for JDBC targets in tests/bootstrap. */
  def jdbcExecute(url: String, ddl: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute(ddl)
      finally st.close()
    } finally conn.close()
  }

  /** Read a scalar (e.g. COUNT(*)) back from a JDBC target. */
  def jdbcQueryLong(url: String, query: String): Long = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(query)
        try { rs.next(); rs.getLong(1) }
        finally rs.close()
      } finally st.close()
    } finally conn.close()
  }
}
