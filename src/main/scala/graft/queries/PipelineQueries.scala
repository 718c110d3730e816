package graft.queries

import org.apache.spark.sql.functions._

import Common._
import graft.operators.Dedup

/** The flagship LLM-training-data preparation pipeline, composed from the
  * engine's own operators in ONE declarative DAG — the end-to-end shape a
  * real 100 TB corpus prep runs:
  *
  *   1. per-document quality + token stats (pure column expressions);
  *   2. exact-dedup decision table (hash groupBy) joined back as a
  *      keep-list (left-semi);
  *   3. quality/length gates;
  *   4. corpus-level accounting per source.
  *
  * Everything is SQL-expressible, so the whole composition — not just the
  * pieces — is oracle-checked. At scale: one scan of the corpus, one
  * groupBy for the decision table, one broadcast-ish semi join, one final
  * aggregation; no operator materializes text more than once.
  */
object PipelineQueries extends QuerySet {

  val qCorpusPrep: GQuery = GQuery(
    "q_pipeline_corpus_prep",
    Some("""
      WITH keep AS (
        SELECT min(doc_id) AS doc_id
        FROM documents
        GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))),
      scored AS (
        SELECT d.doc_id, d.source,
               len(string_split(d.text, ' ')) AS n_tokens,
               CAST(len(list_distinct(string_split(d.text, ' '))) AS DOUBLE)
                 / len(string_split(d.text, ' ')) AS diversity
        FROM documents d
        JOIN keep k ON d.doc_id = k.doc_id),
      gated AS (
        SELECT * FROM scored
        WHERE n_tokens BETWEEN 10 AND 5000 AND diversity >= 0.3)
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             CAST(SUM(CAST(diversity AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avg_diversity
      FROM gated
      GROUP BY source
      ORDER BY source""")
  ) { (spark, dir) =>
    import spark.implicits._
    val docs = t(spark, dir).documents
    // 1. dedup decision table → keep-list (exact-dedup operator)
    val keep = Dedup
      .exact(docs, "doc_id", "text")
      .select($"keep_id".as("doc_id"))
    // 2.+3. per-doc stats and gates on the surviving docs
    val toks = split($"text", " ")
    val scored = docs
      .join(keep, Seq("doc_id"), "left_semi")
      .select(
        $"doc_id",
        $"source",
        size(toks).as("n_tokens"),
        (size(array_distinct(toks)).cast("double") / size(toks)).as("diversity")
      )
      .filter($"n_tokens".between(10, 5000) && $"diversity" >= 0.3)
    // 4. corpus accounting per source
    scored
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tokens").cast("long").as("total_tokens"),
        davg($"diversity").as("avg_diversity")
      )
      .orderBy($"source")
  }

  /** Deterministic stratified sample of documents by source (hash-gated —
    * reproducible across partitionings/retries, unlike RNG-stream
    * sampling). The portable md5 gate lets DuckDB replay the exact keep
    * decision, so this is fully oracle-checked; the xxhash64 fast path and
    * repartition-invariance are asserted in SamplingSpec.
    */
  val qSample: GQuery = GQuery(
    "q_sample_stratified",
    Some("""
      SELECT doc_id, source FROM documents
      WHERE (source = 'src0' AND substr(md5(doc_id::VARCHAR || ':7'), 1, 4) < '8000')
         OR (source = 'src1' AND substr(md5(doc_id::VARCHAR || ':7'), 1, 4) < '4000')
         OR (source = 'src2' AND substr(md5(doc_id::VARCHAR || ':7'), 1, 4) < '1999')
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    graft.operators.Sampling
      .stratifiedPortable(
        t(spark, dir).documents,
        strataCol = "source",
        fractions = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.1),
        keyCol = "doc_id",
        seed = 7
      )
      .select($"doc_id", $"source")
      .orderBy($"doc_id")
  }

  override def queries: Seq[GQuery] = Seq(qCorpusPrep, qSample)
}
