package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.UnigramLm

/** STREAMING serving for the unigram-LM tokenizer ([[UnigramLm]]): the
  * model is trained ONCE in batch (the q_text_unigram_train pipeline),
  * shipped as a (piece, w_micro) parquet artifact, and every
  * micro-batch Viterbi-segments its words against it — the
  * deterministic-decoding promise (integer max-plus arithmetic, fixed
  * tie-breaks) means the stream path must produce BIT-IDENTICAL
  * segmentations and scores to batch decoding, regardless of how words
  * are split across micro-batches or apps (the StreamNbServeSpec
  * serving discipline; the vocab is read from parquet INSIDE
  * foreachBatch — closures are serialized and must not capture
  * DataFrames).
  */
class StreamTokenizeSpec extends SparkSpec {

  private def segmentBatch(vocabDir: String, outDir: String)(
      batch: DataFrame, id: Long): Unit = {
    val s = batch.sparkSession
    val vocab = s.read.parquet(vocabDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap // bounded model-size
    UnigramLm
      .viterbiSegment(batch.select(col("word"), lit(1L).as("freq")), vocab)
      .select(col("word"), col("score_micro"), col("segmented"), col("n_pieces"))
      .write.mode("append").parquet(outDir)
    ()
  }

  test("stream-served segmentations are bit-identical to batch decoding across apps") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // train once on the corpus word table (the q_text_unigram_train shape)
    val words = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(lower($"text"), " ")).as("w"))
      .filter($"w".rlike("^[a-z]{2,12}$"))
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"w").limit(300)
      .select($"w".as("word"), $"freq")
    val (model, batchSeg) = UnigramLm.train(words, maxVocab = 160, emRounds = 2)

    val vocabDir = Files.createTempDirectory("graft-uni-vocab").resolve("v").toString
    val outDir = Files.createTempDirectory("graft-uni-out").resolve("seg").toString
    model.select(col("piece"), col("w_micro")).write.parquet(vocabDir)

    val expected = batchSeg.collect()
      .map(r => r.getAs[String]("word") ->
        ((r.getAs[Long]("score_micro"), r.getAs[String]("segmented"),
          r.getAs[Long]("n_pieces"))))
      .toMap
    assert(expected.size >= 10, s"fixture too small: ${expected.size} words")

    val all = expected.keys.toSeq.sorted
    val (evens, odds) = all.zipWithIndex.partition(_._2 % 2 == 0)

    def serve(name: String, batch: Seq[String]): Unit = {
      val in = MemoryStream[String]
      val app = new GraftApp(s, name, Files.createTempDirectory(s"graft-$name").toString)
      app.agent(
        name,
        () => in.toDF().toDF("word"),
        GraftSink.ForeachBatch(segmentBatch(vocabDir, outDir)),
        outputMode = "append"
      )(identity)
      app.start(name)
      in.addData(batch.toIndexedSeq)
      app.processAllAvailable(name)
      app.stop(name)
    }
    // two separate apps: only the parquet model artifact carries over
    serve("uni-serve", evens.map(_._1))
    serve("uni-serve-2", odds.map(_._1))

    val served = s.read.parquet(outDir).collect()
      .map(r => r.getAs[String]("word") ->
        ((r.getAs[Long]("score_micro"), r.getAs[String]("segmented"),
          r.getAs[Long]("n_pieces"))))
      .toMap
    assert(served.keySet === expected.keySet,
      s"word coverage differs: missing=${expected.keySet -- served.keySet}")
    val diffs = expected.keys.filter(k => served(k) != expected(k))
    assert(diffs.isEmpty,
      s"stream/batch divergence on ${diffs.toSeq.sorted.take(5).map(k => s"$k: ${served(k)} vs ${expected(k)}")}")
  }
}
