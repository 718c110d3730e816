package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextOps

/** STREAMING model serving for the quantized naive Bayes classifier
  * ([[TextOps.nbQuantizedModel]] / [[TextOps.nbScore]]): the model is
  * trained ONCE in batch, shipped as a parquet artifact, and every
  * micro-batch scores against it — the deterministic-serving promise
  * (integer micro-log arithmetic) means the stream path must produce
  * BIT-IDENTICAL predictions and margins to batch scoring, regardless
  * of how documents are split across micro-batches or query restarts.
  *
  * The batch closure reads the model from parquet INSIDE foreachBatch
  * (the repo's static-holder discipline: closures are serialized, so
  * they must not capture DataFrames).
  */
class StreamNbServeSpec extends SparkSpec {

  private def scoreBatch(modelDir: String, clsqDir: String, outDir: String)(
      batch: DataFrame, id: Long): Unit = {
    val s = batch.sparkSession
    val model = s.read.parquet(modelDir)
    val clsq = s.read.parquet(clsqDir)
    val tok = batch.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tk"))
    TextOps.nbScore(tok, model, clsq)
      .select("doc_id", "pred", "margin_micro")
      .write.mode("append").parquet(outDir)
    ()
  }

  test("stream-served predictions are bit-identical to batch scoring across micro-batches and a restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val tok = docs.select($"doc_id", $"lang", explode(TextOps.tokens($"text")).as("tk"))
    val (model, clsq) = TextOps.nbQuantizedModel(tok.filter($"doc_id" % 5 =!= 0))

    val modelDir = Files.createTempDirectory("graft-nb-model").resolve("m").toString
    val clsqDir = Files.createTempDirectory("graft-nb-clsq").resolve("c").toString
    val outDir = Files.createTempDirectory("graft-nb-out").resolve("pred").toString
    model.write.parquet(modelDir)
    clsq.write.parquet(clsqDir)

    // batch reference over the full test split
    val testDocs = docs.filter($"doc_id" % 5 === 0).select($"doc_id", $"text")
    val expected = TextOps
      .nbScore(testDocs.select($"doc_id", explode(TextOps.tokens($"text")).as("tk")),
        model, clsq)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(expected.size >= 5, s"fixture too small: ${expected.size} test docs")

    val rows = testDocs.as[(Long, String)].collect().sortBy(_._1)
    val (evenDocs, oddDocs) = rows.partition(_._1 % 2 == 0)

    val in = MemoryStream[(Long, String)]
    val app = new GraftApp(s, "nb-serve", Files.createTempDirectory("graft-nb-ckpt").toString)
    app.agent(
      "serve",
      () => in.toDF().toDF("doc_id", "text"),
      GraftSink.ForeachBatch(scoreBatch(modelDir, clsqDir, outDir)),
      outputMode = "append"
    )(identity)
    app.start("serve")
    in.addData(evenDocs.toIndexedSeq)
    app.processAllAvailable("serve")
    app.stop("serve")

    // restart: NEW source + NEW checkpoint; only the model artifact carries
    val in2 = MemoryStream[(Long, String)]
    val app2 = new GraftApp(s, "nb-serve-2", Files.createTempDirectory("graft-nb-ckpt2").toString)
    app2.agent(
      "serve",
      () => in2.toDF().toDF("doc_id", "text"),
      GraftSink.ForeachBatch(scoreBatch(modelDir, clsqDir, outDir)),
      outputMode = "append"
    )(identity)
    app2.start("serve")
    in2.addData(oddDocs.toIndexedSeq)
    app2.processAllAvailable("serve")
    app2.stop("serve")

    val served = s.read.parquet(outDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(served.keySet === expected.keySet,
      s"doc coverage differs: missing=${expected.keySet -- served.keySet} extra=${served.keySet -- expected.keySet}")
    val diffs = expected.keys.filter(k => served(k) != expected(k))
    assert(diffs.isEmpty,
      s"stream/batch divergence on ${diffs.toSeq.sorted.take(5).map(k => s"$k: ${served(k)} vs ${expected(k)}")}")
  }
}
