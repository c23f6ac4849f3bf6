package graft

import org.apache.spark.sql.functions._

import graft.io.Sources

/** E117 last-touch attribution: the partition invariants on the driver
  * corpus (the oracle verifies the channel values; this pins that the
  * report is a PARTITION of the purchase set — every purchase credited
  * exactly once, shares summing to 1). */
class AttributionSpec extends SparkSpec {

  test("f15: channels partition the purchases; shares sum to one") {
    val out = SparkEntry.queries("f15_attribution")(spark, sf0001).collect()
    val channels = out.map(_.getAs[String]("channel")).toSet
    assert(channels.subsetOf(Set("view", "click", "direct")))
    val purchases = Sources.table(spark, sf0001, "events")
      .filter(col("event_type") === "purchase").count()
    assert(out.map(_.getAs[Long]("n_purchases")).sum === purchases,
      "every purchase is credited to exactly one channel")
    val shareSum = out.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9)
    out.foreach { r =>
      assert(r.getAs[Double]("attributed_value") >= 0.0)
      assert(r.getAs[Long]("n_purchases") >= 1L)
    }
  }
}
