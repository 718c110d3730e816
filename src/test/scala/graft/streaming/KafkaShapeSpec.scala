package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions
import graft.serde.AvroConv

/** One Kafka-wire-shaped frame: the exact source schema a Kafka-backed
  * deployment sees (key/value binary + topic/partition/offset/ts — the
  * `OwnedMessage` fields, reference: callysto/src/kafka/cconsumer.rs:36-37).
  */
final case class KFrame(
    key: Array[Byte],
    value: Array[Byte],
    topic: String,
    partition: Int,
    offset: Long
)

/** End-to-end agents over the Kafka wire schema without a broker:
  * payload_view-style string decode (examples/src/basic.rs:24) and the
  * Avro-stream pipeline (examples/src/avro-stream.rs) — the decode path a
  * real `format("kafka")` source would feed identically.
  */
class KafkaShapeSpec extends SparkSpec {

  test("agent decodes string payloads from kafka-shaped frames (basic.rs parity)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val in = MemoryStream[KFrame]
    val counts = new ConcurrentHashMap[String, Long]()
    val app = new GraftApp(s, "kwire", Files.createTempDirectory("graft-kwire").toString)
    app.agent(
      "payload-view",
      () => in.toDF(),
      GraftSink.ForeachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach(r => counts.put(r.getString(0), r.getLong(1)))
        ()
      }
    ) { frames =>
      // payload_view::<str>() parity: reinterpret value bytes as UTF-8
      frames
        .select($"topic", $"value".cast("string").as("payload"))
        .filter(length($"payload") > 0)
        .groupBy($"topic")
        .count()
    }
    app.start("payload-view")

    def frame(topic: String, n: Int, payload: String) =
      KFrame(s"k$n".getBytes("UTF-8"), payload.getBytes("UTF-8"), topic, n % 2, n.toLong)

    in.addData(
      frame("example", 0, "ElaSt1c"),
      frame("example", 1, "SearCh"),
      frame("other", 2, "data"),
      frame("example", 3, "")
    )
    app.processAllAvailable("payload-view")
    app.stop("payload-view")
    assert(counts.get("example") === 2L) // empty payload filtered
    assert(counts.get("other") === 1L)
  }

  test("agent decodes avro datum payloads from kafka-shaped frames (avro-stream parity)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // SensorData { id: long, data: string } — avro-stream.rs:28-37
    val sensor = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("id", "data")
    val schemaJson = AvroConv.schemaJson(sensor.schema)
    val encoded = sensor
      .select(GraftFunctions.toAvro(struct($"id", $"data")).as("bin"))
      .collect()
      .map(_.getAs[Array[Byte]](0))

    val in = MemoryStream[KFrame]
    val sums = new ConcurrentHashMap[String, Long]()
    val app = new GraftApp(s, "kavro", Files.createTempDirectory("graft-kavro").toString)
    app.agent(
      "avro-agent",
      () => in.toDF(),
      GraftSink.ForeachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach(r => sums.put("sum", r.getLong(0)))
        ()
      },
      outputMode = "complete"
    ) { frames =>
      frames
        .select(GraftFunctions.fromAvro($"value", schemaJson).as("r"))
        .select($"r.id".as("id"), $"r.data".as("data"))
        .agg(sum($"id").as("id_sum"))
    }
    app.start("avro-agent")
    in.addData(encoded.zipWithIndex.map { case (bin, i) =>
      KFrame(Array.emptyByteArray, bin, "avro-stream", 0, i.toLong)
    }.toIndexedSeq: _*)
    app.processAllAvailable("avro-agent")
    app.stop("avro-agent")
    assert(sums.get("sum") === 6L)
  }
}
