package graft.operators

import graft.engine.PlanOnly.syntax._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SFT transcript assembly: per-user event streams → capped, role-tagged
  * chat transcripts with adjacency-violation counts (two consecutive
  * turns by one role) and an overflow flag. The callysto-shaped consumer
  * is an instruction-tuning prep stage (reference: event-log agents,
  * `callysto/src/app.rs` task pipelines); the Spark-first plan is one
  * partitioned rank window (the 64-turn cap BEFORE the collect — a
  * transcript is bounded by contract, never by luck) over one
  * localCheckpointed scan feeding both the uncapped tally and the
  * capped collect.
  *
  * Extracted from q_pipeline_chat_assembly (round 9) so the single-event
  * guard — `violations` must be 0, not a crash, when a user has ONE
  * event (`sequence(1, 0)` is the empty-range edge the round-8 advice
  * flagged) — is drivable over a 1-row fixture in a spec: the testdata's
  * min 45 events/user can never exercise it through the registry.
  *
  * Output: (user_id, n_turns, kept_turns, violations, transcript_md5,
  * overflowed), one row per user.
  */
object SftPrep {

  def assembleChat(
      events: DataFrame,
      userCol: String,
      idCol: String,
      tsUsCol: String,
      roleCol: String,
      maxTurns: Int = 64
  ): DataFrame = {
    val e = events.select(
      col(userCol).as("user_id"), col(idCol).as("event_id"),
      col(tsUsCol).as("tus"), col(roleCol).as("role"))
      .ckptLazy() // feeds both the uncapped tally and the capped collect
    val tot = e.groupBy(col("user_id")).agg(count(lit(1)).as("n_turns"))
    val kept = e
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))))
      .filter(col("rn") <= maxTurns)
    kept.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("tus"), col("event_id"), col("role")))).as("s"))
      .join(tot, Seq("user_id"))
      .select(
        col("user_id"),
        col("n_turns"),
        size(col("s")).cast("long").as("kept_turns"),
        // single-event guard: sequence(1, size-1) with size = 1 would be
        // sequence(1, 0) — Spark throws on a negative-step-less descending
        // range; the when() keeps one-turn users at zero violations
        when(size(col("s")) >= 2,
          aggregate(
            sequence(lit(1), size(col("s")) - 1),
            lit(0L),
            (acc, i) => acc + when(
              element_at(col("s"), i + 1).getField("role") ===
                element_at(col("s"), i).getField("role"),
              1L).otherwise(0L))).otherwise(lit(0L)).as("violations"),
        md5(array_join(
          transform(col("s"), x =>
            concat(x.getField("role"), lit(":"), x.getField("event_id").cast("string"))),
          "|")).as("transcript_md5"),
        (col("n_turns") > maxTurns).as("overflowed"))
  }
}
