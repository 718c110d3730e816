package graft

import org.apache.spark.sql.functions._

import graft.sources.{Bucketing, Tables}

/** Bucketed co-located joins: the scan's bucket layout must satisfy the
  * join's distribution requirement so NO Exchange appears — the zero-
  * shuffle path a 100 TB fact table is written for.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("joining two tables bucketed on the key plans with no Exchange and matches the plain join") {
    val t = Tables(spark, sf)
    val orders = t.orders.select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val items = t.lineitem.select($"l_orderkey", $"l_quantity", $"l_extendedprice")
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(items.withColumnRenamed("l_orderkey", "o_orderkey"), "b_items", "o_orderkey", 4)

    // merge hint: forbid broadcast so the plan must rely on the bucket
    // layout (broadcast would hide a missing co-location at toy scale)
    val joined = Bucketing.table(spark, "b_orders")
      .hint("merge")
      .join(Bucketing.table(spark, "b_items"), "o_orderkey")
    val n = joined.count()

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SortMergeJoin, plan:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join should be shuffle-free, plan:\n$plan")

    val plainN = orders
      .join(items.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
      .count()
    assert(n == plainN, s"bucketed join rows $n != plain join rows $plainN")
  }

  test("bucketed tables satisfy the custom as-of exec's distribution: shuffle-free as-of join") {
    import graft.streaming.StreamOps.tsFromNanos
    val ev = Tables(spark, sf).events
      .select($"user_id", $"event_id", $"event_type", tsFromNanos($"ts").as("ts"))
    Bucketing.writeBucketed(
      ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("purchase_id"), $"ts"),
      "b_purchases", "user_id", 4)
    Bucketing.writeBucketed(
      ev.filter($"event_type" === "click")
        .select($"user_id", $"event_id".as("click_id"), $"ts"),
      "b_clicks", "user_id", 4)

    val joined = graft.operators.Joins.asOfJoinNative(
      Bucketing.table(spark, "b_purchases"),
      Bucketing.table(spark, "b_clicks"),
      key = "user_id", tsCol = "ts", payload = Seq("click_id"))
    joined.count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"custom exec missing, plan:\n$plan")
    assert(
      !plan.contains("Exchange"),
      s"bucket layout should satisfy the as-of ClusteredDistribution, plan:\n$plan")

    // and it still returns the same rows as the unbucketed path
    val unbucketed = graft.operators.Joins.asOfJoinNative(
      ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("purchase_id"), $"ts"),
      ev.filter($"event_type" === "click")
        .select($"user_id", $"event_id".as("click_id"), $"ts"),
      "user_id", "ts", Seq("click_id"))
    assert(
      joined.exceptAll(unbucketed).isEmpty && unbucketed.exceptAll(joined).isEmpty,
      "bucketed as-of differs from the shuffled as-of")
  }

  test("aggregation on the bucket key is shuffle-free") {
    val agg = Bucketing.table(spark, "b_items")
      .groupBy($"o_orderkey")
      .agg(sum($"l_quantity").as("q"))
    agg.count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed aggregation should be shuffle-free, plan:\n$plan")
  }
}
