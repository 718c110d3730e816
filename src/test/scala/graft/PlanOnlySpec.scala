package graft

import org.apache.spark.sql.functions._

import graft.engine.PlanOnly
import graft.engine.PlanOnly.syntax._

/** Plan-only checkpoint mode ([[PlanOnly]], round-13): `.ckpt()` must
  * materialize eagerly in normal operation and TRUNCATE-without-
  * materializing under `planOnly {}` — the empty-leaf contract that
  * keeps PlanProbe/PlanLint from (a) paying corpus-scale
  * materializations and (b) re-growing the exponentially nested
  * lineage of iterative builders that checkpoints exist to cut (the
  * 40-minute TreeNode.exists analysis hang this round).
  */
class PlanOnlySpec extends SparkSpec {

  test("outside plan-only mode, ckpt() materializes (checkpointed leaf, data intact)") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).toDF("x").filter($"x" % 2 === 0).ckpt()
    assert(df.count() == 50)
    // the lineage is cut: the analyzed plan is a leaf, not the filter tree
    assert(df.queryExecution.analyzed.collectLeaves().size == 1)
    assert(!df.queryExecution.analyzed.toString.contains("Filter"),
      "ckpt() outside plan-only mode must truncate lineage via localCheckpoint")
  }

  test("under planOnly, ckpt() is an empty leaf with the SAME schema and no job runs") {
    val s = spark
    import s.implicits._
    val jobsBefore = s.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val (schemaIn, out) = PlanOnly.planOnly {
      val src = (1 to 100).toDF("x").select($"x", ($"x" * 2).as("y"))
      val ck = src.ckpt()
      (src.schema, ck)
    }
    assert(out.schema == schemaIn, "plan-only ckpt must preserve the schema exactly")
    assert(out.isEmpty, "plan-only ckpt must be empty (truncated, never materialized)")
    val jobsAfter = s.sparkContext.statusTracker.getJobIdsForGroup(null).length
    // building the checkpointed frame itself must not have launched a job
    // (isEmpty above launches one on an empty RDD, which is the assertion's
    // own cost — allow exactly that)
    assert(jobsAfter - jobsBefore <= 1,
      s"plan-only ckpt launched Spark jobs during BUILD: $jobsBefore -> $jobsAfter")
  }

  test("planOnly restores the previous flag even on exception, and nests") {
    assert(!PlanOnly.enabled)
    intercept[RuntimeException] {
      PlanOnly.planOnly {
        assert(PlanOnly.enabled)
        PlanOnly.planOnly(assert(PlanOnly.enabled))
        assert(PlanOnly.enabled)
        throw new RuntimeException("boom")
      }
    }
    assert(!PlanOnly.enabled, "flag leaked after an exception inside planOnly")
  }

  test("iterative lineage stays flat under plan-only (the PlanLint hang regression)") {
    val s = spark
    import s.implicits._
    PlanOnly.planOnly {
      // 8 rounds, each consuming its predecessor twice — without
      // truncation this is a 2^8-leaf tree and analysis crawls; with the
      // empty-leaf ckpt every round's plan is tiny
      var df = (1 to 10).toDF("x")
      val t0 = System.nanoTime()
      for (_ <- 1 to 8) {
        val d = df.ckpt()
        df = d.union(d).groupBy($"x").agg(count(lit(1)).cast("int").as("x2"))
          .select(($"x" + $"x2").as("x"))
      }
      val leaves = df.queryExecution.analyzed.collectLeaves().size
      val sec = (System.nanoTime() - t0) / 1e9
      assert(leaves <= 2, s"iterative plan not truncated: $leaves leaves")
      assert(sec < 30, s"iterative plan-only build took ${sec}s — lineage re-growing?")
    }
  }
}
