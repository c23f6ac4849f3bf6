package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.operators.BfsHops

/** G3: BFS hops — hand-computed distances on a path graph, the
  * deterministic seed election, and the iteration cutoff. */
class BfsHopsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType)))

  private def mk(rows: (Long, Long)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (o, p) => Row(o, p) }, 2), schema)

  // path 1-2-3-4-5: degrees 1,2,2,2,1 — hub = max-degree tie -> min id = 2
  private def path = mk((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L),
    (3L, 3L), (3L, 4L), (4L, 4L), (4L, 5L))

  test("g3: path graph — hub election by (deg desc, id) and exact hops") {
    try {
      val out = BfsHops.hubHops(path).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out === Map(2L -> 0L, 1L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
    } finally spark.catalog.clearCache()
  }

  test("g3: the iteration cutoff bounds the frontier") {
    try {
      val out = BfsHops.hubHops(path, iters = 1).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out === Map(2L -> 0L, 1L -> 1L, 3L -> 1L),
        "one round reaches only the hub's direct neighbors")
    } finally spark.catalog.clearCache()
  }

  test("g3: no cached residue without any caller clearCache (round-10 lifecycle)") {
    spark.catalog.clearCache()
    val out = BfsHops.hubHops(path)
    assert(out.count() === 5L)
    // the d9-aligned lifecycle: per-round eager localCheckpoint (blocks
    // reclaimed by the ContextCleaner once unreferenced) + in-method
    // edge unpersist — a long-lived driver calling this in a loop must
    // not accumulate CacheManager entries
    assert(spark.sharedState.cacheManager.isEmpty,
      "hubHops must not leave cached relations behind")
  }

  test("g3: a strictly higher-degree node takes the seed from the tie") {
    // add order {3,6}: node 3 now has degree 3 and wins the election
    val li = path.union(mk((5L, 3L), (5L, 6L)))
    try {
      val out = BfsHops.hubHops(li).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out === Map(3L -> 0L, 2L -> 1L, 4L -> 1L, 6L -> 1L,
        1L -> 2L, 5L -> 2L))
    } finally spark.catalog.clearCache()
  }
}
