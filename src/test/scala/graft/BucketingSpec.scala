package graft

import graft.io.RefShape
import graft.operators.Bucketing

/** Bucketed co-located join: same results as the plain join, with the
  * shuffle exchanges eliminated from the physical plan. */
class BucketingSpec extends SparkSpec {

  test("bucketed join runs without exchanges and matches the plain join") {
    val items = RefShape.orderItems(spark, sf0001)
      .select("id", "order_id", "sale_price")
    val orders = RefShape.orders(spark, sf0001)
      .select("order_id", "user_id")

    Bucketing.writeBucketed(items, "b_items", "order_id", 8)
    Bucketing.writeBucketed(orders, "b_orders", "order_id", 8)
    // at this test's data size the planner would broadcast the small side
    // (bypassing bucketing entirely); disable auto-broadcast to exercise
    // the co-located sort-merge path a 100-TB join would take
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_items", "b_orders",
        "order_id")
      val plan = joined.queryExecution.executedPlan.toString

      // both sides read pre-bucketed: no shuffle before the join
      assert(!plan.contains("Exchange"), plan.take(2000))
      assert(plan.contains("SortMergeJoin") || plan.contains("HashJoin"),
        plan.take(2000))
      assert(plan.contains("SelectedBucketsCount"), plan.take(2000))

      // results equal the plain (shuffled) join
      val plain = items.join(orders, Seq("order_id"))
      assert(joined.count() === plain.count())
      assert(joined.exceptAll(plain).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_items")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
