package graft

import org.apache.spark.sql.functions._

import graft.operators.SftPrep

/** Chat-transcript assembly edge cases the registry can never reach: the
  * testdata floor is 45 events/user, so the single-event guard
  * (round-8 advice; fixed in round 8, spec'd here per round-8 verdict
  * #6) is only drivable over a hand-built fixture.
  */
class SftPrepSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(rows: (Long, Long, Long, String)*) =
    rows.toDF("user_id", "event_id", "tus", "role")

  test("a ONE-event user assembles with zero violations (the guard), no crash") {
    val out = SftPrep
      .assembleChat(fixture((1L, 10L, 100L, "user")), "user_id", "event_id", "tus", "role")
      .select($"user_id", $"n_turns", $"kept_turns", $"violations", $"overflowed")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(out.toSeq == Seq((1L, 1L, 1L, 0L, false)))
  }

  test("the UNGUARDED formulation fails on a one-turn transcript (regression witness)") {
    // what q_pipeline_chat_assembly computed before the round-8 guard:
    // sequence(1, size-1) over size = 1 walks element_at(s, 0) — invalid
    val s = fixture((1L, 10L, 100L, "user"))
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"tus", $"event_id", $"role"))).as("s"))
      .select(
        aggregate(
          sequence(lit(1), size($"s") - 1),
          lit(0L),
          (acc, i) => acc + when(
            element_at($"s", i + 1).getField("role") ===
              element_at($"s", i).getField("role"),
            1L).otherwise(0L)).as("violations"))
    intercept[Exception] { s.collect() }
  }

  test("adjacent same-role turns count as violations; cap + overflow flag engage") {
    val twoSame = SftPrep
      .assembleChat(
        fixture((1L, 1L, 100L, "user"), (1L, 2L, 200L, "user"), (1L, 3L, 300L, "assistant")),
        "user_id", "event_id", "tus", "role")
      .select($"violations").as[Long].head()
    assert(twoSame == 1L)
    val over = SftPrep
      .assembleChat(
        fixture((1L to 70L).map(i => (5L, i, i * 10L, if (i % 2 == 0) "user" else "assistant")): _*),
        "user_id", "event_id", "tus", "role", maxTurns = 64)
      .select($"n_turns", $"kept_turns", $"overflowed")
      .as[(Long, Long, Boolean)].head()
    assert(over == ((70L, 64L, true)))
  }
}
