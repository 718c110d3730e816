package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Parquet schema evolution — the ingest reality of a corpus written over
  * months: later partitions grow columns. `mergeSchema` must unify the
  * footers and null-fill the old files, and filters on NEW columns must
  * not wrongly drop old rows (null semantics, not missing-column errors).
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema unifies evolved parquet partitions and null-fills old files") {
    val dir = Files.createTempDirectory("graft-evolve").toString
    // epoch 1: (doc_id, text)
    Seq((1L, "alpha"), (2L, "beta"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir + "/epoch=1")
    // epoch 2: adds a quality column
    Seq((3L, "gamma", 0.9), (4L, "delta", 0.2))
      .toDF("doc_id", "text", "quality")
      .write.mode("overwrite").parquet(dir + "/epoch=2")

    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.toSet == Set("doc_id", "text", "quality", "epoch"))
    assert(df.count() == 4)

    // old rows surface with null quality...
    val nulls = df.filter($"quality".isNull).select($"doc_id").as[Long].collect().toSet
    assert(nulls == Set(1L, 2L))
    // ...and a filter on the new column keeps null-safe semantics
    val kept = df.filter($"quality" >= 0.5).select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))
    val keptOrOld = df.filter($"quality".isNull || $"quality" >= 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(keptOrOld == Set(1L, 2L, 3L))
  }
}
