package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.operators.ItemItemCf

/** REC1: item-item CF — hand-computed cosines, the visible tie-break at
  * the k cut, duplicate-line dedup, and the minCo prune. */
class ItemItemCfSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType)))

  private def mk(rows: (Long, Long)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (o, p) => Row(o, p) }, 2), schema)

  // baskets: o1={1,2} (part 1 listed twice — must dedup), o2={1,2},
  // o3={1,2,3}, o4={3,4}
  // n: 1→3, 2→3, 3→2, 4→1; co: (1,2)=3, (1,3)=1, (2,3)=1, (3,4)=1
  private def li = mk((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
    (3L, 1L), (3L, 2L), (3L, 3L), (4L, 3L), (4L, 4L))

  test("rec1: hand-computed cosines and the tie-break at the k cut") {
    try {
      val out = ItemItemCf.recommend(li, k = 2, minCo = 1L).collect()
        .map(r => (r.getLong(0), r.getLong(4)) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      // cos(1,2) = 3/√(3·3) = 1.0 exactly
      assert(out((1L, 1L)) === ((2L, 3L, 1.0)))
      assert(out((1L, 2L)) === ((3L, 1L, 1.0 / math.sqrt(6.0))))
      // product 3: rank 1 = 4 (1/√2 ≈ .707); rank 2 is the 1-vs-2 tie
      // at 1/√6 — broken by id, so 1 survives the k=2 cut and 2 drops
      assert(out((3L, 1L)) === ((4L, 1L, 1.0 / math.sqrt(2.0))))
      assert(out((3L, 2L)) === ((1L, 1L, 1.0 / math.sqrt(6.0))))
      assert(!out.contains((3L, 3L)))
      // pendant product 4 recommends its one neighbor
      assert(out((4L, 1L)) === ((3L, 1L, 1.0 / math.sqrt(2.0))))
    } finally spark.catalog.clearCache()
  }

  test("rec1: minCo prunes the pair relation before symmetrization") {
    try {
      val out = ItemItemCf.recommend(li, k = 5, minCo = 2L).collect()
      // only (1,2) has co >= 2 -> exactly the two symmetric rows
      assert(out.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
      out.foreach(r => assert(r.getDouble(3) === 1.0))
    } finally spark.catalog.clearCache()
  }
}
