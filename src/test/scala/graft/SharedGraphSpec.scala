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

  test("lifetime: iterative operators release in-method; single-dataflow caches release on demand") {
    // a UNIQUE input frame (no other suite builds this exact plan, so
    // the probes below are concurrency-safe under the parallel runner)
    val uin = li.filter(pmod(col("l_orderkey"), lit(2)) === 0)
    import org.apache.spark.storage.StorageLevel
    // Dataset.storageLevel / unpersist consult the session CacheManager
    // by plan equality — an equal plan probes (and releases) the cache
    def edgesProbe = PageRank.copurchaseEdges(uin)
    // ITERATIVE class (g3/g4): checkpointed rounds, everything released
    // in-method — zero residue the moment the call returns
    BfsHops.hubHops(uin, iters = 2).count()
    LabelPropagation.communities(uin, iters = 2).count()
    assert(edgesProbe.storageLevel === StorageLevel.NONE,
      "an iterative graph operator left its edge relation cached")
    // SINGLE-dataflow class (g1/g2): the returned frame is the LAZY
    // dataflow (the measured AQE choice — BASELINE round 12), interior
    // persists live until the CALLER releases them...
    PageRank.productPageRank(uin, iters = 2).count()
    assert(edgesProbe.storageLevel !== StorageLevel.NONE,
      "g1's interior persists are caller-released by contract")
    // ...and a plan-equal unpersist releases exactly them (the
    // clearCache-free form of the caller contract)
    val deg = edgesProbe.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edProbe = edgesProbe.join(deg, Seq("src"))
    edProbe.unpersist()
    edgesProbe.unpersist()
    assert(edgesProbe.storageLevel === StorageLevel.NONE)
    assert(edProbe.storageLevel === StorageLevel.NONE)
  }

  test("results stay readable after the caller releases the interior caches") {
    val out = PageRank.productPageRank(li)
    val first = rows(out)
    // release every interior persist the g1 build created, then re-read:
    // the lazy frame must recompute the identical result through lineage
    val edgesProbe = PageRank.copurchaseEdges(li)
    val deg = edgesProbe.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    edgesProbe.join(deg, Seq("src")).unpersist()
    edgesProbe.unpersist()
    // the re-read below re-materializes the interior persists; release
    // them again on the way out so no residue outlives this test in the
    // shared session (later suites probe the CacheManager)
    try assert(first === rows(out),
      "re-reading after the caller releases the interior caches must " +
        "reproduce the result")
    finally {
      edgesProbe.join(deg, Seq("src")).unpersist()
      edgesProbe.unpersist()
      ()
    }
  }
}
