package graft.streaming

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.operators.Dedup

/** STREAMING Bloom admission gate: each micro-batch probes a PERSISTED
  * Bloom position index ([[Dedup.bloomPositions]] / [[Dedup.bloomVerdict]])
  * before touching the (much larger) exact fingerprint index — the cheap
  * first tier of streaming ingest dedup. The gate is one-sided: a Bloom
  * MISS is definitely-new (admit without consulting the fingerprint
  * index); a Bloom HIT is a suspect routed through the exact check, so a
  * false positive can never wrongly reject a document (the cap-inversion
  * rule's fallback, proven here with an ENGINEERED collision). Like the
  * CDC/semantic gates, the memory is index parquet, not query state — a
  * fresh query (new checkpoint, new source) inherits it for free.
  */
class StreamBloomDedupSpec extends SparkSpec {

  private val M = 32L // tiny bit space so an engineered collision is findable
  private val K = 3

  private val posSchema = StructType(Seq(StructField("pos", LongType)))
  private val fpSchema = StructType(Seq(StructField("fp", StringType)))

  private def orEmpty(dir: String, schema: StructType): DataFrame =
    if (Files.exists(Paths.get(dir)) && Files.list(Paths.get(dir)).findFirst().isPresent)
      spark.read.schema(schema).parquet(dir)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Admit = bloom-miss OR exact-fingerprint-miss; within-batch, first
    * (smallest-id) occurrence per fingerprint wins. Admitted docs append
    * their positions, fingerprints, and rows to the three stores.
    */
  private def gateBatch(posDir: String, fpDir: String, corpusDir: String)(
      batch: DataFrame, id: Long): Unit = {
    val s = batch.sparkSession
    import s.implicits._
    val fps = Dedup.contentFp(batch, "doc_id", "text")
    val pos = Dedup.bloomPositions(fps, K, lit(M))
    val verdict = Dedup.bloomVerdict(orEmpty(posDir, posSchema), pos, K)
    val exact = orEmpty(fpDir, fpSchema).select($"fp".as("efp")).distinct()
    // localCheckpoint PINS the admission decision before the appends below
    // mutate the very indexes it was computed from — a lazily re-evaluated
    // plan would see its own batch's positions/fingerprints on the second
    // write and reject everything (the repo's standard eager-materialize
    // rule for read-modify-write over file-backed state).
    val admitted = verdict.join(exact, verdict("fp") === $"efp", "left")
      .filter(!$"bloom_hit" || $"efp".isNull)
      .groupBy($"fp").agg(min($"id").as("id"))
      .localCheckpoint()
    Dedup.bloomPositions(admitted, K, lit(M)).select("pos")
      .write.mode("append").parquet(posDir)
    admitted.select("fp").write.mode("append").parquet(fpDir)
    batch.join(admitted.select($"id"), batch("doc_id") === admitted("id"))
      .select("doc_id", "text")
      .write.mode("append").parquet(corpusDir)
    ()
  }

  private val docA = "alpha document about stream gates and bloom filters number one"
  private val docB = "beta document on rocksdb compaction and watermark semantics two"
  private val docC = "gamma document covering reciprocal rank fusion and skylines three"
  private val docD = "delta document with conformal thresholds and attribution four"

  // ——— JVM replicas of the engine's md5 position math (fixture search)
  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def jvmFp(text: String): String =
    md5hex(text.toLowerCase.replaceAll("\\s+", " ").trim)

  private def jvmPos(fp: String): Set[Long] =
    (1 to K).map(j => java.lang.Long.parseLong(md5hex(fp + ":" + j).substring(0, 8), 16) % M).toSet

  test("verbatim dups rejected across batches and across a restart; distinct docs admitted") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val posDir = Files.createTempDirectory("graft-bloom-pos").resolve("pos").toString
    val fpDir = Files.createTempDirectory("graft-bloom-fp").resolve("fp").toString
    val corpusDir = Files.createTempDirectory("graft-bloom-corpus").resolve("docs").toString

    val in = MemoryStream[(Long, String)]
    val app = new GraftApp(s, "bloom-gate", Files.createTempDirectory("graft-bloom-ckpt").toString)
    app.agent(
      "gate",
      () => in.toDF().toDF("doc_id", "text"),
      GraftSink.ForeachBatch(gateBatch(posDir, fpDir, corpusDir)),
      outputMode = "append"
    )(identity)

    app.start("gate")
    in.addData((1L, docA), (2L, docB))
    app.processAllAvailable("gate")
    // batch 2: verbatim copy of A (reject), fresh C (admit), within-batch
    // dup pair of D (only the smaller id admitted)
    in.addData((3L, docA), (4L, docC), (5L, docD), (6L, docD))
    app.processAllAvailable("gate")
    app.stop("gate")

    val afterTwo = s.read.parquet(corpusDir).select($"doc_id").as[Long].collect().toSet
    assert(afterTwo === Set(1L, 2L, 4L, 5L),
      s"expected verbatim 3 and within-batch dup 6 rejected; corpus = $afterTwo")

    // restart: NEW source, NEW checkpoint — only the index parquet carries
    val in2 = MemoryStream[(Long, String)]
    val app2 = new GraftApp(s, "bloom-gate-2", Files.createTempDirectory("graft-bloom-ckpt2").toString)
    app2.agent(
      "gate",
      () => in2.toDF().toDF("doc_id", "text"),
      GraftSink.ForeachBatch(gateBatch(posDir, fpDir, corpusDir)),
      outputMode = "append"
    )(identity)
    app2.start("gate")
    in2.addData((7L, docC), (8L, "epsilon fresh content that matches nothing earlier five"))
    app2.processAllAvailable("gate")
    app2.stop("gate")

    val afterRestart = s.read.parquet(corpusDir).select($"doc_id").as[Long].collect().toSet
    assert(afterRestart === Set(1L, 2L, 4L, 5L, 8L),
      s"post-restart: 7 (pre-restart dup) rejected, 8 admitted; corpus = $afterRestart")
  }

  test("one-sidedness: a dup's verdict is always bloom_hit (no false negatives)") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val fps = Dedup.contentFp(docs, "doc_id", "text")
    val index = Dedup.bloomPositions(fps, K, lit(M)).select("pos")
    val probes = Seq((10L, docA), (11L, docB), (12L, docC)).toDF("doc_id", "text")
    val v = Dedup.bloomVerdict(index,
      Dedup.bloomPositions(Dedup.contentFp(probes, "doc_id", "text"), K, lit(M)), K)
    assert(v.filter(!$"bloom_hit").count() == 0, "a true dup escaped the Bloom set")
  }

  test("engineered Bloom false positive is admitted by the exact-fingerprint fallback") {
    val s = spark
    import s.implicits._
    val setBits = jvmPos(jvmFp(docA)) ++ jvmPos(jvmFp(docB))
    // deterministic search for a DISTINCT text whose k positions all
    // collide with the A∪B bit set (expected ~(|set|/M)^k hit rate)
    val fpText = (0 until 100000).iterator
      .map(i => s"collider text variant number $i")
      .find(t => jvmPos(jvmFp(t)).subsetOf(setBits))
      .getOrElse(fail(s"no collider found in 100k candidates against $setBits"))

    val idx = Dedup.bloomPositions(
      Dedup.contentFp(Seq((1L, docA), (2L, docB)).toDF("doc_id", "text"), "doc_id", "text"),
      K, lit(M)).select("pos")
    val probe = Seq((9L, fpText)).toDF("doc_id", "text")
    val verdict = Dedup.bloomVerdict(idx,
      Dedup.bloomPositions(Dedup.contentFp(probe, "doc_id", "text"), K, lit(M)), K)
    // the Bloom tier alone WOULD reject it…
    assert(verdict.select($"bloom_hit").as[Boolean].head(), "collider was not a bloom hit")
    // …but the exact-fingerprint fallback proves it new, so the gate admits
    val exact = Seq(jvmFp(docA), jvmFp(docB)).toDF("efp")
    val admitted = verdict.join(exact, verdict("fp") === $"efp", "left")
      .filter(!$"bloom_hit" || $"efp".isNull)
    assert(admitted.count() == 1, "gate wrongly rejected a non-duplicate on a Bloom collision")
  }

  test("JVM position math matches the engine's (fixture-search validity)") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, docA)).toDF("doc_id", "text")
    val enginePos = Dedup.bloomPositions(Dedup.contentFp(docs, "doc_id", "text"), K, lit(M))
      .select($"pos").as[Long].collect().toSet
    assert(enginePos === jvmPos(jvmFp(docA)),
      s"engine $enginePos != jvm ${jvmPos(jvmFp(docA))} — fixture search is invalid")
  }
}
