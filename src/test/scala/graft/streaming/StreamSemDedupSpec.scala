package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Similarity

/** STREAMING semantic ingest gate: each micro-batch of embeddings is
  * admitted against a PERSISTED sign-LSH index
  * ([[Similarity.semIndexTable]] + [[Similarity.semGateFromIndex]]) —
  * the embedding analog of StreamCdcDedupSpec's chunk gate, catching
  * re-phrased near-duplicates that share no lexical surface. The gate's
  * memory is the index parquet (id, emb, cell, fp), not query state;
  * a fresh query (new checkpoint, new source) inherits it for free.
  * `planes` is pinned once at index creation (here 3) — the caller
  * contract the operator documents.
  */
class StreamSemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val planes = 3

  private def indexOrEmpty(dir: String): DataFrame =
    if (Files.exists(Paths.get(dir)) && Files.list(Paths.get(dir)).findFirst().isPresent)
      spark.read.parquet(dir)
    else
      Similarity.semIndexTable(
        Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
          .withColumn("embedding", $"embedding".cast("array<float>")),
        "vec_id", "embedding", planes)

  private def gateBatch(indexDir: String, keptDir: String)(batch: DataFrame, id: Long): Unit = {
    val inc = Similarity.semIndexTable(batch, "vec_id", "embedding", planes)
    val admitted = Similarity
      .semGateFromIndex(indexOrEmpty(indexDir), inc, tau = 0.9)
      .localCheckpoint()
    admitted.select($"keep_id".as("id"), $"emb", $"cell", $"fp")
      .write.mode("append").parquet(indexDir)
    admitted.select($"keep_id").write.mode("append").parquet(keptDir)
  }

  private def vec(seed: Long): Seq[Float] = {
    val rng = new java.util.Random(seed)
    Array.fill(64)(rng.nextGaussian().toFloat).toSeq
  }

  test("semantic near-dups are rejected across micro-batches and a restart") {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val indexDir = Files.createTempDirectory("graft-sem-index").resolve("idx").toString
    val keptDir = Files.createTempDirectory("graft-sem-kept").resolve("ids").toString

    val vA = vec(1)
    val vB = vec(2)
    val vAScaled = vA.map(x => x * 1.4f) // same direction: cell-mate, cos = 1

    val in = MemoryStream[(Long, Seq[Float])]
    val app = new GraftApp(s, "sem-gate", Files.createTempDirectory("graft-sem-ckpt").toString)
    app.agent(
      "gate",
      () => in.toDF().toDF("vec_id", "embedding")
        .withColumn("embedding", $"embedding".cast("array<float>")),
      GraftSink.ForeachBatch(gateBatch(indexDir, keptDir)),
      outputMode = "append"
    )(identity)

    app.start("gate")
    in.addData((1L, vA), (2L, vB))
    app.processAllAvailable("gate")
    // batch 2: verbatim copy of 1 (fp), scaled copy of 1 (cos), novel
    in.addData((3L, vA), (4L, vAScaled), (5L, vec(3)))
    app.processAllAvailable("gate")
    app.stop("gate")

    val afterTwo = s.read.parquet(keptDir).as[Long].collect().toSet
    assert(afterTwo === Set(1L, 2L, 5L),
      s"expected verbatim 3 (fp) and same-direction 4 (cos) rejected; kept $afterTwo")

    // restart: new source + checkpoint; only the index carries over
    val in2 = MemoryStream[(Long, Seq[Float])]
    val app2 = new GraftApp(s, "sem-gate-2", Files.createTempDirectory("graft-sem-ckpt2").toString)
    app2.agent(
      "gate",
      () => in2.toDF().toDF("vec_id", "embedding")
        .withColumn("embedding", $"embedding".cast("array<float>")),
      GraftSink.ForeachBatch(gateBatch(indexDir, keptDir)),
      outputMode = "append"
    )(identity)
    app2.start("gate")
    // 6 = pre-restart near-dup of 2; 7+8 = within-batch verbatim pair
    in2.addData((6L, vB.map(_ * 0.7f)), (7L, vec(4)), (8L, vec(4)))
    app2.processAllAvailable("gate")
    app2.stop("gate")

    val afterRestart = s.read.parquet(keptDir).as[Long].collect().toSet
    assert(afterRestart === Set(1L, 2L, 5L, 7L),
      s"post-restart: 6 (index near-dup) and 8 (batch fp twin) rejected; kept $afterRestart")
  }
}
