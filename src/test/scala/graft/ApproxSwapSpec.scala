package graft

import org.apache.spark.sql.functions._

import graft.io.{RefShape, Sources}

/** The approx-swap twin queries (a2x, x5x) reduce to "every group within
  * bound"; this spec asserts the underlying bounded error DIRECTLY, per
  * group, so a sketch regression is caught with the offending numbers in
  * the failure message rather than as an opaque n_within mismatch. */
class ApproxSwapSpec extends SparkSpec {

  test("approx_count_distinct stays within 4-sigma (20%) of exact per day") {
    val per = RefShape.orders(spark, sf0001)
      .groupBy(substring(col("created_at"), 1, 10).as("order_date"))
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id")).as("approx"))
      .collect()
    assert(per.nonEmpty)
    per.foreach { r =>
      val (e, a) = (r.getAs[Long]("exact"), r.getAs[Long]("approx"))
      assert(math.abs(a - e) <= math.max(0.2 * e, 5.0),
        s"day ${r.getString(0)}: approx $a vs exact $e breaks the 4-sigma bound")
    }
  }

  test("approx_percentile(accuracy 1e4) lands between exact p49 and p51") {
    val per = Sources.table(spark, sf0001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_quantity, 0.5D, 10000)").as("a"),
        expr("percentile(l_quantity, 0.49D)").as("lo"),
        expr("percentile(l_quantity, 0.51D)").as("hi"))
      .collect()
    assert(per.length >= 3)
    per.foreach { r =>
      val (a, lo, hi) = (r.getAs[Any]("a").toString.toDouble,
        r.getAs[Double]("lo"), r.getAs[Double]("hi"))
      assert(lo <= a && a <= hi,
        s"flag ${r.getString(0)}: approx median $a outside exact [$lo, $hi]")
    }
  }
}
