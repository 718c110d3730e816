package graft.queries

/** Central registry: every operator the engine ships, as driver-checkable
  * queries. SparkEntry derives its `queries` / `oracleSql` maps from here.
  */
object Registry {
  def sets: Seq[QuerySet] = Seq(
    Relational,
    TpchShapes,
    Aggregates,
    Windows,
    SetOps,
    ScalarFns,
    TextAnalysis,
    Subqueries,
    SourceQueries,
    PipelineQueries,
    DedupQueries,
    SimilarityQueries,
    MultimodalQueries,
    StreamingQueries,
    ProfilingQueries,
    SequenceQueries,
    LayoutQueries,
    IngestQueries,
    CurationQueries,
    AuditQueries,
    MiningQueries,
    TokenizerQueries
  )

  lazy val all: Seq[GQuery] = {
    val qs = sets.flatMap(_.queries)
    val dup = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }
}
