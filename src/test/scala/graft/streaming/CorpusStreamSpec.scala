package graft.streaming

import java.nio.file.Files

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Diagnostics

/** End-to-end STREAMING corpus preparation: one agent composing the
  * pipeline layer's pieces — in-flight quality audit (observe), quality
  * filter, streaming exact dedup (cross-batch, fingerprint-keyed state),
  * and a persist-once fan-out to two sinks. The streaming form of
  * q_pipeline_corpus_prep: documents arrive as a stream, duplicates are
  * suppressed across micro-batches by keyed state, and every target sees
  * the same accepted rows under one offset commit.
  */
class CorpusStreamSpec extends SparkSpec {

  test("one query unions two source streams (multi-topic consumption)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // the reference needs one agent PER topic sharing driver state
    // (examples/src/double-agent.rs); Spark consumes both sources in ONE
    // query — a single offset commit spans them, so the merged view can
    // never observe one topic ahead of a crash and the other behind it
    val a = MemoryStream[(Long, String)]
    val b = MemoryStream[(Long, String)]
    val seen = mutable.ArrayBuffer.empty[(Long, String)]

    val app = new GraftApp(s, "union-app", Files.createTempDirectory("graft-union").toString)
    app.agent(
      "merged",
      () => a.toDF().toDF("id", "src").unionByName(b.toDF().toDF("id", "src")),
      GraftSink.ForeachBatch((df, _) => seen.synchronized {
        seen ++= df.collect().map(r => (r.getLong(0), r.getString(1)))
      }),
      outputMode = "append"
    )(identity)

    app.start("merged")
    a.addData((1L, "a"), (2L, "a"))
    b.addData((10L, "b"))
    app.processAllAvailable("merged")
    b.addData((11L, "b"))
    app.processAllAvailable("merged")
    app.stop("merged")

    val got = seen.synchronized(seen.toSet)
    assert(got === Set((1L, "a"), (2L, "a"), (10L, "b"), (11L, "b")),
      s"union query must see every row from both sources exactly once, got $got")
  }

  test("streaming corpus prep: audit -> quality gate -> cross-batch dedup -> fan-out") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val textA = "the quick brown fox jumps over the lazy dog again and again"
    val textB = "a completely different document about spark streaming state"
    val textC = "yet another unique document that should survive deduplication"

    val in = MemoryStream[(Long, String)]
    val pqDir = Files.createTempDirectory("graft-corpus-pq").toString
    val seen = mutable.ArrayBuffer.empty[(Long, String)]

    val app = new GraftApp(s, "corpus-app", Files.createTempDirectory("graft-corpus").toString)
    app.agent(
      "prep",
      () => in.toDF().toDF("doc_id", "text"),
      GraftSink.ForeachBatch(Sinks.fanOut(
        (df, _) => df.write.mode("append").parquet(pqDir),
        (df, _) => seen.synchronized {
          seen ++= df.collect().map(r => (r.getLong(0), r.getString(1)))
        }
      )),
      outputMode = "append"
    ) { raw =>
      // Audit BEFORE any filtering: n_rows counts everything ingested.
      val audited = Diagnostics.observed(
        raw, "ingest", Diagnostics.qualityMetrics(Seq("text")): _*)
      val quality = audited.filter(length($"text") >= 20)
      // Cross-batch exact dedup on the content fingerprint: keyed state
      // suppresses re-arrivals in LATER micro-batches too. (Unbounded
      // here — production pairs it with a watermark, see
      // StreamOps.dedupWithinWatermark.)
      StreamOps.dedup(quality.withColumn("fp", xxhash64($"text")), Seq("fp"))
        .select($"doc_id", $"text")
    }

    app.start("prep")
    // batch 1: dup-within-batch (4 repeats A), junk (2 is too short)
    in.addData((1L, textA), (2L, "short"), (3L, textB), (4L, textA))
    app.processAllAvailable("prep")
    // batch 2: cross-batch dup (5 repeats A), one genuinely new doc
    in.addData((5L, textA), (6L, textC))
    app.processAllAvailable("prep")
    app.stop("prep")

    // Accepted set: first occurrence of each unique quality doc, ever.
    val texts = seen.synchronized(seen.toList).map(_._2).sorted
    assert(texts === List(textA, textB, textC).sorted,
      s"expected exactly A,B,C once each; got $seen")

    // Fan-out consistency: the parquet target saw the identical rows.
    val pq = s.read.parquet(pqDir).select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(pq === seen.synchronized(seen.toSet))

    // The in-flight audit counted RAW ingest (2 rows in the last batch),
    // not the filtered survivors.
    val gate = app.progress("prep")
      .flatMap(p => Option(p.observedMetrics).map(_.asScala))
      .flatMap(_.get("ingest"))
    assert(gate.isDefined, "ingest metrics missing from progress")
    assert(gate.get.getAs[Long]("n_rows") === 2L)
  }
}
