package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.operators.Dedup

/** STREAMING chunk-level ingest gate: each micro-batch is admitted against
  * a PERSISTED chunk-hash index ([[Dedup.cdcChunkTable]] +
  * [[Dedup.cdcGateFromIndex]]) — the content-defined-chunking analog of
  * StreamFuzzyDedupSpec's minhash gate, and the one that catches PARTIAL
  * copies (a re-crawl that prepends a new header to an accepted page shares
  * all its post-edit chunks, which whole-doc sketches may miss and fixed
  * windows mis-align on). The gate's memory is the index parquet, not
  * query state: only (id, 16-byte chunk hash) rows persist — text is
  * chunked exactly once, at ingest — and a fresh query (new checkpoint,
  * new source) inherits the memory for free.
  */
class StreamCdcDedupSpec extends SparkSpec {

  private val idxSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("h", StringType)))

  private def indexOrEmpty(dir: String): DataFrame =
    if (Files.exists(Paths.get(dir)) && Files.list(Paths.get(dir)).findFirst().isPresent)
      spark.read.schema(idxSchema).parquet(dir)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], idxSchema)

  /** Per-batch gate: chunk the batch ONCE, admit what survives against
    * index + batch, append the admitted docs' chunk hashes to the index
    * and their rows to the corpus.
    */
  private def gateBatch(indexDir: String, corpusDir: String)(batch: DataFrame, id: Long): Unit = {
    val chI = Dedup.cdcChunkTable(batch, "doc_id", "text")
    val admitted = Dedup.cdcGateFromIndex(indexOrEmpty(indexDir), chI)
    chI.join(admitted, chI("id") === admitted("keep_id"))
      .select("id", "h")
      .write.mode("append").parquet(indexDir)
    batch
      .join(admitted, batch("doc_id") === admitted("keep_id"))
      .select("doc_id", "text")
      .write.mode("append").parquet(corpusDir)
  }

  // ~500-char fixtures: long enough for several ~64-char CDC chunks
  private val tail =
    "the quick brown fox jumps over the lazy dog while parquet files stream " +
      "through partitioned readers and every shuffle stage spills politely to disk " +
      "because the planner sized its partitions from honest statistics gathered at " +
      "ingest time rather than wishful defaults chosen by a config file nobody reads " +
      "and the watermark keeps late arrivals from resurrecting closed windows forever"
  private val docA = "original header alpha beta gamma " + tail
  private val docAPartial = "COMPLETELY REWRITTEN HEADLINE 12345 " + tail // partial copy of A
  private val docB =
    "unrelated content about rocksdb compaction levels and bloom filters " +
      "arranged so that no contiguous region matches the other document at all " +
      "since every token here comes from a disjoint vocabulary of storage engine " +
      "terminology including memtables sstables write amplification and leveled " +
      "compaction strategies that never mention foxes or dogs or any such creature"

  private val docC = "fresh third subject matter " + tail.reverse // unrelated to A and B
  private val docCPartial = "ANOTHER HEAD 999 " + tail.reverse

  private def chunkSet(text: String): Set[String] = {
    import graft.functions.CdcChunkUtil
    val st = {
      val a = CdcChunkUtil.starts(org.apache.spark.unsafe.types.UTF8String.fromString(text))
      (0 until a.numElements()).map(a.getInt)
    }
    val bounds = st :+ (text.length + 1)
    bounds.sliding(2).map { case Seq(x, y) => text.substring(x - 1, y - 1) }.toSet
  }

  test("fixture guard: partial copies share >= 2 chunks with their originals; B shares none") {
    val sharedA = chunkSet(docA) intersect chunkSet(docAPartial)
    assert(sharedA.size >= 2, s"fixture too weak: only ${sharedA.size} shared A-chunks")
    val sharedC = chunkSet(docC) intersect chunkSet(docCPartial)
    assert(sharedC.size >= 2, s"fixture too weak: only ${sharedC.size} shared C-chunks")
    assert((chunkSet(docA) intersect chunkSet(docB)).isEmpty)
    assert((chunkSet(docA) intersect chunkSet(docC)).isEmpty)
  }

  test("partial copies are rejected across micro-batches and across a restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val indexDir = Files.createTempDirectory("graft-cdc-index").resolve("idx").toString
    val corpusDir = Files.createTempDirectory("graft-cdc-corpus").resolve("docs").toString

    val in = MemoryStream[(Long, String)]
    val app = new GraftApp(s, "cdc-gate", Files.createTempDirectory("graft-cdc-ckpt").toString)
    app.agent(
      "gate",
      () => in.toDF().toDF("doc_id", "text"),
      GraftSink.ForeachBatch(gateBatch(indexDir, corpusDir)),
      outputMode = "append"
    )(identity)

    app.start("gate")
    // batch 1: two genuinely distinct docs — both admitted
    in.addData((1L, docA), (2L, docB))
    app.processAllAvailable("gate")
    // batch 2: PARTIAL copy of an earlier batch's doc rejected
    in.addData((3L, docAPartial))
    app.processAllAvailable("gate")
    app.stop("gate")

    val afterTwo = s.read.parquet(corpusDir).select($"doc_id").as[Long].collect().toSet
    assert(afterTwo === Set(1L, 2L),
      s"batch-2 gate: expected partial copy 3 rejected; corpus = $afterTwo")

    // restart: NEW source, NEW checkpoint — only the index carries over.
    // Within-batch: 5 is a partial copy of 4 (same batch, larger id loses).
    val in2 = MemoryStream[(Long, String)]
    val app2 = new GraftApp(s, "cdc-gate-2", Files.createTempDirectory("graft-cdc-ckpt2").toString)
    app2.agent(
      "gate",
      () => in2.toDF().toDF("doc_id", "text"),
      GraftSink.ForeachBatch(gateBatch(indexDir, corpusDir)),
      outputMode = "append"
    )(identity)

    app2.start("gate")
    in2.addData((4L, docC), (5L, docCPartial), (6L, docAPartial))
    app2.processAllAvailable("gate")
    app2.stop("gate")

    val afterRestart = s.read.parquet(corpusDir).select($"doc_id").as[Long].collect().toSet
    assert(afterRestart === Set(1L, 2L, 4L),
      s"post-restart: 4 admitted, 5 (within-batch partial) and 6 (pre-restart partial) " +
        s"rejected; corpus = $afterRestart")
  }

  test("a >maxBatchDf verbatim cluster in ONE batch cannot evade the gate") {
    // round-9 advice (medium): 25 identical docs in one batch push every
    // chunk's batch-df over maxBatchDf=20, so the df-capped pair join
    // sees nothing — the heaviest duplication evading the gate because
    // it is too duplicated. The exact chunk-set-fingerprint fallback
    // must keep exactly one (the smallest id); the unrelated doc rides
    // along untouched.
    val s = spark
    import s.implicits._
    val batch = ((1L to 25L).map(i => (i, docA)) :+ (100L, docB)).toDF("doc_id", "text")
    val chI = Dedup.cdcChunkTable(batch, "doc_id", "text")
    val emptyIdx =
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], idxSchema)
    val keep = Dedup.cdcGateFromIndex(emptyIdx, chI)
      .select($"keep_id").as[Long].collect().toSet
    assert(keep === Set(1L, 100L), s"verbatim cluster evaded the gate: kept $keep")
  }
}
