package graft.queries

import org.apache.spark.sql.functions._

import Common._
import graft.functions.{GraftFunctions, ZOrder}

/** Data-layout operators: the keys that organize 100 TB on disk.
  *
  * Partitioning ([[graft.sources.Partitioned]]) and bucketing
  * ([[graft.sources.Bucketing]]) organize by ONE key each; the Z-order
  * key here organizes within files by SEVERAL dimensions at once, so
  * min/max row-group statistics stay selective for range filters on any
  * of them (ZOrderSpec measures the file-skipping bound; this query
  * pins the key's exact value cross-engine).
  */
object LayoutQueries extends QuerySet {

  private val zbits = 10

  /** Morton key over (user_id, day-of-month) for every event, exact
    * oracle replay via shift/and/or — the key is a pure bit function, so
    * a hash match proves every interleaved bit. `zbucket` (top 6 bits)
    * is the range-partition id a writer would use: contiguous buckets =
    * contiguous z-ranges = files tight on BOTH dimensions.
    */
  val qZorder: GQuery = GQuery(
    "q_layout_zorder",
    Some(s"""
      WITH ev AS (SELECT event_id, user_id,
                         CAST(strftime(ts, '%d') AS INT) AS day
                  FROM events)
      SELECT event_id, user_id, day,
             CAST(${ZOrder.oracleSql(Seq("user_id", "day"), zbits)} AS BIGINT) AS zkey,
             CAST(${ZOrder.oracleSql(Seq("user_id", "day"), zbits)} >> 14 AS BIGINT) AS zbucket
      FROM ev
      ORDER BY event_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val ev = t(spark, dir).events.select(
      $"event_id",
      $"user_id",
      dayofmonth(graft.streaming.StreamOps.tsFromNanos($"ts")).as("day"))
    ev.select(
        $"event_id",
        $"user_id",
        $"day",
        GraftFunctions.zorder(zbits, $"user_id", $"day").as("zkey"))
      .withColumn("zbucket", shiftright($"zkey", 14).cast("long"))
      .orderBy($"event_id")
  }

  override def queries: Seq[GQuery] = Seq(qZorder)
}
