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
    implicit class CkptOps[T](private val ds: Dataset[T]) extends AnyVal {
      /** `localCheckpoint()` unless plan-only mode is on. */
      def ckpt(): Dataset[T] = if (PlanOnly.enabled) ds else ds.localCheckpoint()
    }
  }
}
