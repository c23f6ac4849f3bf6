package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.operators.{BfsHops, LabelPropagation, PageRank, Triangles}

/** E176: the graph-family composition contract (the FromLabels
  * convention applied to the second shared-upstream family): ONE
  * persisted co-purchase edge relation feeds g1/g2/g3/g4 through the
  * `*FromEdges` overloads, hash-identical to the four standalone runs
  * that each rebuild the graph privately — and the round-12 unified
  * cache-lifetime contract holds: every operator releases every cache
  * it creates in-method (tools/SharedGraph measures the ×30 saving;
  * BASELINE records it). */
class SharedGraphSpec extends SparkSpec {

  private def li = Sources.table(spark, sf0001, "lineitem")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("one persisted edge relation feeds all four operators, hash-identical to standalone") {
    val standalone = Seq(
      rows(PageRank.productPageRank(li)),
      rows(Triangles.triangleCensus(li)),
      rows(BfsHops.hubHops(li)),
      rows(LabelPropagation.communities(li)))
    val edges = PageRank.copurchaseEdges(li).persist()
    val shared = try Seq(
      rows(PageRank.productPageRankFromEdges(edges)),
      rows(Triangles.triangleCensusFromEdges(edges)),
      rows(BfsHops.hubHopsFromEdges(edges)),
      rows(LabelPropagation.communitiesFromEdges(edges)))
    finally { edges.unpersist(); () }
    Seq("g1", "g2", "g3", "g4").zip(standalone.zip(shared)).foreach {
      case (name, (a, b)) =>
        assert(a.nonEmpty, s"$name: fixture produced no rows")
        assert(a === b, s"$name: FromEdges over a shared persisted " +
          "edge relation must be hash-identical to the standalone run")
    }
  }

  test("lifetime: standalone operators leave no cache residue (in-method release)") {
    // a UNIQUE input frame (no other suite builds this exact plan, so
    // the probe below is concurrency-safe under the parallel runner)
    val uin = li.filter(pmod(col("l_orderkey"), lit(2)) === 0)
    PageRank.productPageRank(uin, iters = 2).count()
    Triangles.triangleCensus(uin).count()
    BfsHops.hubHops(uin, iters = 2).count()
    LabelPropagation.communities(uin, iters = 2).count()
    import org.apache.spark.storage.StorageLevel
    // Dataset.storageLevel consults the session CacheManager by plan
    // equality — NONE means no residue for that exact build
    val edgesProbe = PageRank.copurchaseEdges(uin)
    assert(edgesProbe.storageLevel === StorageLevel.NONE,
      "a standalone graph operator left its edge relation cached")
    // ...and the internal derived persists (g1's per-round join input)
    val deg = edgesProbe.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    assert(edgesProbe.join(deg, Seq("src")).storageLevel ===
      StorageLevel.NONE, "g1 left its per-round join input cached")
  }

  test("results stay readable after the in-method release (eager materialization)") {
    // the returned frames must not reference the dropped caches: force
    // a SECOND full read after the operator returned
    val out = PageRank.productPageRank(li)
    val first = rows(out)
    assert(first === rows(out),
      "re-reading the returned frame must reproduce the result without " +
        "the internal caches")
  }
}
