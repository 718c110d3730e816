package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.operators.Dedup

/** STREAMING near-dup ingest gate: each micro-batch is admitted against the
  * already-accepted corpus through the fuzzy incremental gate
  * ([[Dedup.minhashIncrementalNew]] — banded minhash candidates, pairwise
  * verify), and admitted docs are appended to the persisted corpus the NEXT
  * batch gates against. The streaming form of q_dedup_incremental_fuzzy: a
  * re-crawl of an accepted page (same content modulo small edits) never
  * re-enters the corpus, across micro-batches AND across restarts — the
  * gate's memory lives in the corpus store, not in query state, so a fresh
  * query (new checkpoint, new source) inherits it for free.
  *
  * Scale note: the spec re-sketches the accepted corpus each batch for
  * simplicity; production persists the signature table instead (content-
  * independent ~0.5 KB/doc — see minhashIncrementalNew's Scaladoc) so each
  * batch sketches only itself. The gate's join shape is identical either way.
  */
class StreamFuzzyDedupSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def corpusOrEmpty(dir: String): DataFrame =
    if (Files.exists(Paths.get(dir)) && Files.list(Paths.get(dir)).findFirst().isPresent)
      spark.read.schema(schema).parquet(dir)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** The per-batch gate: admit what survives against corpus + batch, then
    * append the survivors' full rows to the corpus.
    */
  private def gateBatch(corpusDir: String)(batch: DataFrame, id: Long): Unit = {
    val existing = corpusOrEmpty(corpusDir)
    val admitted = Dedup
      .minhashIncrementalNew(existing, batch, "doc_id", "text", threshold = 0.5)
    batch
      .join(admitted, batch("doc_id") === admitted("keep_id"))
      .select("doc_id", "text")
      .write.mode("append").parquet(corpusDir)
  }

  private val textA  = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val textA2 = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
  private val textB  = "one two three four five six seven eight nine ten"
  private val textB2 = "one two three four five six seven eight nine eleven"
  private val textC  = "совершенно unrelated words about engines and parquet layouts here"

  test("near-dups are rejected across micro-batches and across a restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val corpusDir = Files.createTempDirectory("graft-fuzzy-corpus").resolve("docs").toString

    val in = MemoryStream[(Long, String)]
    val app = new GraftApp(s, "fuzzy-gate", Files.createTempDirectory("graft-fuzzy-ckpt").toString)
    app.agent(
      "gate",
      () => in.toDF().toDF("doc_id", "text"),
      GraftSink.ForeachBatch(gateBatch(corpusDir)),
      outputMode = "append"
    )(identity)

    app.start("gate")
    // batch 1: two genuinely distinct docs — both admitted
    in.addData((1L, textA), (2L, textB))
    app.processAllAvailable("gate")
    // batch 2: near-dup of an EARLIER batch's doc rejected, new doc admitted
    in.addData((3L, textA2), (4L, textC))
    app.processAllAvailable("gate")
    app.stop("gate")

    val afterTwo = s.read.parquet(corpusDir).select($"doc_id").as[Long].collect().toSet
    assert(afterTwo === Set(1L, 2L, 4L),
      s"batch-2 gate: expected near-dup 3 rejected, 4 admitted; corpus = $afterTwo")

    // restart: NEW source, NEW checkpoint — only the corpus store carries over
    val in2 = MemoryStream[(Long, String)]
    val app2 = new GraftApp(s, "fuzzy-gate-2", Files.createTempDirectory("graft-fuzzy-ckpt2").toString)
    app2.agent(
      "gate",
      () => in2.toDF().toDF("doc_id", "text"),
      GraftSink.ForeachBatch(gateBatch(corpusDir)),
      outputMode = "append"
    )(identity)

    app2.start("gate")
    // exact re-arrival AND a near-dup, both of pre-restart docs: rejected;
    // within-batch near-dup pair (D, D'): the smaller id wins
    in2.addData((5L, textB2), (6L, textA))
    app2.processAllAvailable("gate")
    app2.stop("gate")

    val afterRestart = s.read.parquet(corpusDir).select($"doc_id").as[Long].collect().toSet
    assert(afterRestart === Set(1L, 2L, 4L),
      s"post-restart gate must remember pre-restart corpus; corpus = $afterRestart")
  }

  test("signature-index gate: text is sketched once, the index alone carries the memory") {
    val s = spark
    import s.implicits._

    val sigDir = Files.createTempDirectory("graft-fuzzy-sigs").resolve("sigs").toString
    val sigSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("sig", org.apache.spark.sql.types.ArrayType(LongType))))

    // the production per-batch gate: sketch ONLY the batch, gate against
    // the persisted signature table, append admitted signatures
    def gate(rows: Seq[(Long, String)]): Set[Long] = {
      val existing =
        if (Files.list(Paths.get(sigDir).getParent).findFirst().isPresent &&
            Files.exists(Paths.get(sigDir)))
          s.read.schema(sigSchema).parquet(sigDir)
        else
          s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], sigSchema)
      val sigI = Dedup.minhashSigTable(rows.toDF("doc_id", "text"), "doc_id", "text")
      val admitted = Dedup.minhashGateFromIndex(existing, sigI).localCheckpoint()
      admitted.select($"keep_id".as("id"), $"sig").write.mode("append").parquet(sigDir)
      admitted.select($"keep_id").as[Long].collect().toSet
    }

    assert(gate(Seq((1L, textA), (2L, textB))) === Set(1L, 2L))
    // near-dup of batch-1 doc rejected purely from the index; new doc admitted
    assert(gate(Seq((3L, textA2), (4L, textC))) === Set(4L))
    // exact and near re-arrivals of indexed docs: both rejected
    assert(gate(Seq((5L, textB2), (6L, textA))) === Set.empty[Long])
    // the index accumulated exactly the admitted signatures
    val idx = s.read.parquet(sigDir).select($"id").as[Long].collect().toSet
    assert(idx === Set(1L, 2L, 4L))
  }
}
