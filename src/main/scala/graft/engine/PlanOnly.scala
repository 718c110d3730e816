package graft.engine

import org.apache.spark.sql.Dataset

/** Plan-only mode for the plan inspection mains ([[graft.PlanProbe]],
  * [[graft.PlanLint]]): operator and query builders call `.ckpt()` (via
  * [[PlanOnly.syntax]]) instead of raw `Dataset.localCheckpoint()`, so
  * building a plan for INSPECTION does not materialize corpus-scaled
  * intermediates — `localCheckpoint` is eager, and at a synthesized
  * decade tier each materialization costs minutes and tens of GB that a
  * plan-only probe must not pay (round-12 PlanProbe caveat, now closed).
  *
  * Outside the two mains the flag is never set, so `.ckpt()` is exactly
  * `localCheckpoint()` — production, bench, Verify and every spec keep
  * the materialization behavior (and the exact post-checkpoint size
  * statistics) they had before.
  *
  * Under plan-only mode the inspected plan shows Catalyst's raw size
  * ESTIMATES where production would have exact checkpointed sizes. That
  * is deliberately CONSERVATIVE for the broadcast-misestimate lint: the
  * failure class being hunted is estimate-elected broadcasts
  * (round-11/12 prefix-filter decade-2 deaths), and a lint hit that
  * production's real checkpoint sizes would demote belongs in the
  * allowlist with its bound stated, not silently unprobed.
  */
object PlanOnly {
  @volatile var enabled: Boolean = false

  /** Run `body` with plan-only mode on; always restores the previous
    * state (the mains are single-threaded — a volatile flag suffices).
    */
  def planOnly[A](body: => A): A = {
    val prev = enabled
    enabled = true
    try body finally enabled = prev
  }

  object syntax {
    implicit class CkptOps(private val df: org.apache.spark.sql.DataFrame) extends AnyVal {
      /** `localCheckpoint()` unless plan-only mode is on.
        *
        * Under plan-only mode this is an EMPTY-RDD leaf with the same
        * schema, NOT a pass-through: checkpoints exist to truncate the
        * lineage of ITERATIVE builders (pagerank/EM/k-round loops), and
        * a pass-through rebuilds the exponentially nested plan the
        * checkpoint was preventing — Catalyst's single-threaded
        * analysis then burns 40+ minutes in `TreeNode.exists`
        * recursion (round-13 measurement). The empty leaf truncates at
        * zero cost; `df.schema` only analyzes the SMALL tree between
        * checkpoint boundaries. Lint semantics survive: subtrees ABOVE
        * a checkpoint have exact sizes in production (eager
        * localCheckpoint stats), so the estimate-elected-broadcast
        * class lives only in non-checkpointed subtrees, which keep
        * their real file scans and estimates in the probed plan.
        * Builders that compute driver scalars from a checkpointed
        * intermediate see empty input and fail — PlanLint reports
        * those as SKIP rather than hanging.
        */
      def ckpt(): org.apache.spark.sql.DataFrame =
        if (PlanOnly.enabled)
          df.sparkSession.createDataFrame(
            df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
        else df.localCheckpoint()

      /** LAZY `localCheckpoint()` unless plan-only mode is on (same empty
        * leaf as [[ckpt]] under the probe).
        *
        * Same lineage truncation and same block-cached materialization as
        * the eager form, but the blocks are computed by the FIRST
        * consuming action instead of a dedicated blocking job — in a
        * batch query that ends in one sink action, every eager
        * checkpoint is a serial barrier job the sink could have absorbed
        * (optimization guide §1.2 "remove passes"; measured round 13:
        * the fixed-k graph loops spent over half their wall time in
        * those barriers). Spark wraps both forms in the same
        * `LogicalRDD` carrying the ORIGINAL optimized plan's stats, so
        * downstream join elections are identical (verified empirically,
        * EagerLazyStatsSpec).
        *
        * Use in pure-batch builders only. Keep the EAGER form wherever a
        * checkpoint must materialize BEFORE a side effect elsewhere can
        * move the data under it (the foreachBatch read-then-append gate
        * class, CLAUDE.md round-10), and for intermediates consumed by
        * many SEPARATE driver actions where the first action would
        * otherwise pay the whole build alone and the timing matters.
        */
      def ckptLazy(): org.apache.spark.sql.DataFrame =
        if (PlanOnly.enabled)
          df.sparkSession.createDataFrame(
            df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
        else df.localCheckpoint(eager = false)
    }
  }
}
