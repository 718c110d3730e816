package graft

import org.apache.spark.sql.functions._

import graft.engine.PlanOnly
import graft.engine.PlanOnly.syntax._

/** Contract behind `.ckptLazy()` (the round-13 barrier-job optimization):
  * a LAZY `localCheckpoint` must be a drop-in for the eager form inside
  * pure-batch builders — same rows, same lineage truncation, and the
  * SAME plan statistics (join elections downstream of a checkpoint must
  * not depend on eagerness, or the broadcast-misestimate hazard class
  * the PlanLint hunts would silently reopen).
  */
class EagerLazyStatsSpec extends SparkSpec {

  private def base = {
    import spark.implicits._
    (0L until 1000L).map(i => (i, i % 7)).toDF("id", "k")
      .groupBy($"k").agg(count(lit(1)).as("n"), sum($"id").as("s"))
  }

  test("lazy localCheckpoint: identical rows to eager") {
    val e = base.localCheckpoint().collect().map(_.toSeq).sortBy(_.toString)
    val l = base.localCheckpoint(eager = false).collect().map(_.toSeq).sortBy(_.toString)
    assert(e.toSeq == l.toSeq)
  }

  test("lazy localCheckpoint: same optimized-plan stats as eager") {
    val e = base.localCheckpoint().queryExecution.optimizedPlan.stats
    val l = base.localCheckpoint(eager = false).queryExecution.optimizedPlan.stats
    assert(e.sizeInBytes == l.sizeInBytes,
      s"eager=${e.sizeInBytes} lazy=${l.sizeInBytes}")
    assert(e.rowCount == l.rowCount)
  }

  test("lazy localCheckpoint truncates lineage like eager (LogicalRDD leaf)") {
    val l = base.localCheckpoint(eager = false)
    val leaves = l.queryExecution.analyzed.collectLeaves()
    assert(leaves.size == 1 &&
      leaves.head.getClass.getSimpleName.contains("LogicalRDD"))
  }

  test("ckptLazy is the empty plan-only leaf under the probe") {
    val inner = PlanOnly.planOnly { base.ckptLazy() }
    assert(inner.queryExecution.analyzed.collectLeaves()
      .forall(_.getClass.getSimpleName.contains("LogicalRDD")))
    assert(PlanOnly.planOnly { inner.isEmpty })
  }

  test("ckptLazy reuses one materialization across consumers (CC converges)") {
    import spark.implicits._
    // a 6-node path graph: pointer-halving CC over lazy checkpoints must
    // converge to one component with exactly one action per round
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("id_a", "id_b")
    val cc = graft.operators.Dedup.connectedComponents(pairs)
    assert(cc.select("component").distinct().count() == 1L)
    assert(cc.count() == 6L)
  }
}
