package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Elasticsearch-style sink (CElasticSearchSink parity: JSON-index each
  * document by id, reference: callysto/src/sinks/elasticsearch.rs:22-135),
  * expressed as the standard ES `_bulk` wire protocol over a pluggable
  * transport.
  *
  * Shape per micro-batch: rows → (id, JSON doc) columns on the executors
  * (codegen'd `to_json`), then per-partition chunked bulk bodies of
  * `actionsPerBulk` actions each — the batching/backpressure role the
  * reference implements with its `buffer_size` bounded sink. One transport
  * call per chunk per partition: N partitions → N concurrent indexers,
  * the pool analog.
  *
  * The transport is injectable because this build has no live ES (and no
  * egress): production uses [[EsSink.httpTransport]]; tests capture the
  * exact bulk bodies. At-least-once on replay — index with stable _id so
  * re-delivery upserts, like the reference.
  */
object EsSink {

  /** (bulkBody) => Unit; must be serializable (runs on executors). */
  type Transport = String => Unit

  /** One HttpClient per JVM (it is thread-safe): a client per chunk would
    * pay TCP/TLS setup on every 500-action bulk and defeat keep-alive.
    */
  @transient private lazy val sharedClient: HttpClient = HttpClient.newHttpClient()

  /** JDK HttpClient POST to `<base>/_bulk` (ndjson). */
  def httpTransport(baseUrl: String): Transport = { body =>
    val req = HttpRequest
      .newBuilder(URI.create(s"$baseUrl/_bulk"))
      .header("Content-Type", "application/x-ndjson")
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = sharedClient.send(req, HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2, s"ES bulk failed: HTTP ${resp.statusCode()}")
  }

  /** Minimal JSON string escape for metadata values — an id containing a
    * quote, backslash, or newline must not break the ndjson framing (a
    * malformed action line would poison the whole bulk on every replay).
    */
  private[streaming] def jsonEscape(s: String): String = {
    val sb = new java.lang.StringBuilder
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case c if c < ' '  => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.toString
  }

  /** Build the two ndjson lines for one document. */
  private[streaming] def bulkAction(index: String, id: String, docJson: String): String =
    s"""{"index":{"_index":"${jsonEscape(index)}","_id":"${jsonEscape(id)}"}}""" +
      "\n" + docJson + "\n"

  /** foreachBatch body: index every row of the micro-batch by `idCol`. */
  def bulkWriter(index: String, idCol: String, transport: Transport, actionsPerBulk: Int = 500)(
      df: DataFrame,
      batchId: Long
  ): Unit = {
    val payload = df.select(
      col(idCol).cast("string").as("__id"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("__doc")
    )
    payload.foreachPartition { (rows: Iterator[Row]) =>
      rows.grouped(actionsPerBulk).foreach { chunk =>
        val body = chunk.map(r => bulkAction(index, r.getString(0), r.getString(1))).mkString
        if (body.nonEmpty) transport(body)
      }
    }
  }
}
