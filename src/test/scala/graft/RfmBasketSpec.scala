package graft

import org.apache.spark.sql.functions._

import graft.io.Sources

/** E118 RFM segmentation + E119 market-basket affinity: the structural
  * invariants on the driver corpus (the oracle verifies the values; this
  * pins the properties a data change must not break). */
class RfmBasketSpec extends SparkSpec {

  test("f16: one row per customer; quintiles balanced; segment consistent") {
    val out = SparkEntry.queries("f16_rfm")(spark, sf0001).collect()
    val customers = Sources.table(spark, sf0001, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(out.length.toLong === customers, "one row per ordering customer")
    // every score is a quintile; ntile bucket sizes differ by at most 1
    for (c <- Seq("r_score", "f_score", "m_score")) {
      val byBucket = out.groupBy(_.getAs[Long](c)).view.mapValues(_.length)
      assert(byBucket.keySet.subsetOf(Set(1L, 2L, 3L, 4L, 5L)))
      assert(byBucket.values.max - byBucket.values.min <= 1,
        s"$c buckets must be ntile-balanced")
    }
    // the anchor customer (most recent order) has recency 0 and the
    // best possible recency score
    val anchor = out.minBy(_.getAs[Long]("recency_days"))
    assert(anchor.getAs[Long]("recency_days") === 0L)
    assert(anchor.getAs[Long]("r_score") === 5L)
    // segment is a pure function of the scores, mirrored from the query
    out.foreach { r =>
      val (rs, fs, ms) = (r.getAs[Long]("r_score"),
        r.getAs[Long]("f_score"), r.getAs[Long]("m_score"))
      val expected =
        if (rs >= 4 && fs >= 4 && ms >= 4) "champion"
        else if (rs >= 4 && fs >= 3) "loyal"
        else if (rs <= 2 && fs >= 3) "at_risk"
        else if (rs <= 1 && fs <= 2) "lost"
        else "regular"
      assert(r.getAs[String]("segment") === expected)
      assert(r.getAs[Long]("frequency") >= 1L)
      assert(r.getAs[Double]("monetary") > 0.0)
      assert(r.getAs[Long]("recency_days") >= 0L)
    }
  }

  test("mb1: pair identities and the support/confidence/lift relations") {
    val out = SparkEntry.queries("mb1_basket_lift")(spark, sf0001).collect()
    assert(out.nonEmpty)
    val n = Sources.table(spark, sf0001, "lineitem")
      .select(col("l_orderkey")).distinct().count()
    out.foreach { r =>
      val (pa, pb) = (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))
      assert(pa < pb, "pairs are ordered, each unordered pair once")
      val cnt = r.getAs[Long]("pair_count")
      assert(cnt >= 2L, "the min-pair-count filter held")
      val support = r.getAs[Double]("support")
      val conf = r.getAs[Double]("confidence")
      val lift = r.getAs[Double]("lift")
      assert(support === cnt.toDouble / n.toDouble)
      // cnt_a ≤ n_orders ⇒ confidence ≥ support; both are probabilities
      assert(conf >= support && conf <= 1.0 && support > 0.0)
      // lift = confidence / P(b): recover P(b) and check it is a
      // plausible basket rate (in (0, 1])
      val pB = conf / lift
      assert(pB > 0.0 && pB <= 1.0 + 1e-12)
      assert(lift > 0.0)
    }
    // spot-check one pair against first principles
    val b = Sources.table(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val r0 = out.minBy(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b")))
    val (pa, pb) = (r0.getAs[Long]("part_a"), r0.getAs[Long]("part_b"))
    val oa = b.filter(col("l_partkey") === pa)
      .select(col("l_orderkey")).collect().map(_.getLong(0)).toSet
    val ob = b.filter(col("l_partkey") === pb)
      .select(col("l_orderkey")).collect().map(_.getLong(0)).toSet
    val both = (oa intersect ob).size.toLong
    assert(r0.getAs[Long]("pair_count") === both)
    assert(r0.getAs[Double]("lift") ===
      (both * n).toDouble / (oa.size.toLong * ob.size.toLong).toDouble)
  }
}
