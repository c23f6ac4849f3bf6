package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.operators.Triangles

/** G2: triangle census — hand-computed counts on a clique, a
  * triangle-with-pendant, and a skewed star (the orientation case). */
class TrianglesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType)))

  private def mk(rows: (Long, Long)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (o, p) => Row(o, p) }, 2), schema)

  private def census(li: DataFrame): Map[Long, (Long, Long, Double)] =
    Triangles.triangleCensus(li).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap

  test("g2: triangle + pendant — counts, lcc, and the deg<2 guard") {
    // order 1 = {1,2,3} -> triangle; order 2 = {3,4} -> pendant edge;
    // order 3 = {9} -> isolated part, out of the graph entirely
    val li = mk((1L, 1L), (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L),
      (3L, 9L))
    try {
      val out = census(li)
      assert(out.keySet === Set(1L, 2L, 3L, 4L))
      assert(out(1L) === ((2L, 1L, 1.0)))       // 2/(2*1)
      assert(out(2L) === ((2L, 1L, 1.0)))
      assert(out(3L) === ((3L, 1L, 1.0 / 3.0))) // 2/(3*2)
      assert(out(4L) === ((1L, 0L, 0.0)))       // deg<2: guarded, no /0
    } finally spark.catalog.clearCache()
  }

  test("g2: K4 — every corner in C(3,2)=3 triangles, lcc exactly 1") {
    // one order with 4 parts = the complete graph K4 (4 triangles,
    // each credited to 3 corners); a duplicate order must NOT double-
    // count (distinct edges)
    val li = mk((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 1L), (2L, 2L), (2L, 3L), (2L, 4L))
    try {
      val out = census(li)
      assert(out.size === 4)
      out.values.foreach { case (deg, tri, lcc) =>
        assert(deg === 3L && tri === 3L && lcc === 1.0)
      }
    } finally spark.catalog.clearCache()
  }

  test("g2: skewed star — hub edges all orient INTO the hub") {
    // edges 1-2, 1-3, 1-4, 2-3: hub 1 has max degree, so orientation
    // gives it out-degree 0 (no wedge fan-out at the hub) yet its one
    // triangle (1,2,3) is still found via the low-degree corner
    val li = mk((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L),
      (3L, 1L), (3L, 4L), (4L, 2L), (4L, 3L))
    try {
      val out = census(li)
      assert(out(1L) === ((3L, 1L, 1.0 / 3.0)))
      assert(out(2L) === ((2L, 1L, 1.0)))
      assert(out(3L) === ((2L, 1L, 1.0)))
      assert(out(4L) === ((1L, 0L, 0.0)))
    } finally spark.catalog.clearCache()
  }
}
