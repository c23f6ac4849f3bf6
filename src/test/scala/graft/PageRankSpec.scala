package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.operators.PageRank

/** G1: integer PageRank — hand-computed fixpoint on a 3-node path
  * graph, symmetry, and mass accounting. */
class PageRankSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType)))

  private def mk(rows: (Long, Long)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (o, p) => Row(o, p) }, 2), schema)

  test("g1: two rounds on the A-B-C path match the hand computation") {
    // order 1 = {A, B}, order 2 = {B, C}  ->  path A - B - C
    // (order 3 repeats {A, B}: distinct edges must dedup it)
    val li = mk((1L, 10L), (1L, 20L), (2L, 20L), (2L, 30L),
      (3L, 10L), (3L, 20L))
    try {
      val out = PageRank.productPageRank(li, iters = 2).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // degrees: A=1, B=2, C=1
      assert(out(10L)._1 === 1L && out(20L)._1 === 2L
        && out(30L)._1 === 1L)
      // r0 = S = 1e12 each; base = 1.5e11
      // r1(A) = base + S*85/200          = 575_000_000_000
      // r1(B) = base + 2*(S*85/100)      = 1_850_000_000_000
      // r2(A) = base + r1(B)*85/200      = 936_250_000_000
      // r2(B) = base + 2*(r1(A)*85/100)  = 1_127_500_000_000
      assert(out(10L)._2 === 936250000000L)
      assert(out(20L)._2 === 1127500000000L)
      // symmetric endpoints stay exactly equal
      assert(out(30L)._2 === out(10L)._2)
      // floor-leak bound: total mass within [3S - 2*edges*iters, 3S]
      val total = out.values.map(_._2).sum
      assert(total <= 3L * PageRank.PrScale)
      assert(total >= 3L * PageRank.PrScale - 4L * 2L)
    } finally spark.catalog.clearCache()
  }

  test("g1: a clique ranks above a pendant and isolated parts drop out") {
    // order 1 = {1,2,3} clique; order 2 = {3,4} pendant edge;
    // order 3 = {9} single-item -> part 9 has no edges, not a node
    val li = mk((1L, 1L), (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L),
      (3L, 9L))
    try {
      val out = PageRank.productPageRank(li).collect()
        .map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(out.keySet === Set(1L, 2L, 3L, 4L))
      // the articulation node (in the clique AND on the bridge) wins;
      // the pendant loses to the clique members
      assert(out(3L) > out(1L) && out(1L) > out(4L))
      assert(out(1L) === out(2L)) // symmetric clique pair
    } finally spark.catalog.clearCache()
  }
}
