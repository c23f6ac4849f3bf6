package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{BfsHops, GraphState, LabelPropagation, PageRank, Triangles}

/** Round-12 measurement (verdict item): is a SHARED edge relation worth
  * it for the graph family? g1 (PageRank), g2 (triangles), g3 (BFS
  * hops) and g4 (LPA communities) each rebuild and persist
  * `PageRank.copurchaseEdges(lineitem)` — the distinct order-grain
  * self-join — when run standalone; a real graph-analytics pass runs
  * the edge build once and feeds all four. This harness times both
  * shapes on a fanned fact tier (the SharedLabels convention):
  *
  *   independent: g1 + g2 + g3 + g4 standalone (each pays the build);
  *   shared:      copurchaseEdges once, persisted by THIS caller (the
  *                FromEdges lifetime contract), then the four
  *                `*FromEdges` forms, then one unpersist.
  *
  * Results are hash-identical either way (SharedGraphSpec pins it);
  * the number here is the wall saving. Usage: SharedGraph
  * <dir-with-lineitem.parquet>. Two passes; the second (post-JIT) is
  * the recorded one. Results → BASELINE.md.
  */
object SharedGraph {
  def main(args: Array[String]): Unit = {
    val Array(dir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def li = spark.read.parquet(s"$dir/lineitem.parquet")
    def timed(label: String)(op: => Unit): Double = {
      val t0 = System.nanoTime()
      op
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[shared-graph] $label: $dt%.2f s")
      dt
    }
    // the g1/g2 contract is caller-released interior caches (the lazy
    // AQE form — see PageRank.copurchaseEdges); in this dedicated JVM
    // clearCache IS the caller release. Between independent ops it also
    // prevents plan-equal cache reuse (g2 silently riding g1's edges
    // would fake the very saving this harness measures).
    for (pass <- 1 to 2) {
      val indep = timed(s"pass$pass independent (g1+g2+g3+g4 standalone)") {
        PageRank.productPageRank(li).count()
        spark.catalog.clearCache()
        Triangles.triangleCensus(li).count()
        spark.catalog.clearCache()
        BfsHops.hubHops(li).count()
        LabelPropagation.communities(li).count()
      }
      val shared = timed(s"pass$pass shared (edges built once)") {
        // the caller-persisted family edge cache rides the GraphState
        // lever too: at ×300 the shared relation is the heap's single
        // biggest tenant, and the composition was skipped last round
        // precisely because its consumers hit the memory walls
        val edges = GraphState.persistGraph(PageRank.copurchaseEdges(li))
        try {
          PageRank.productPageRankFromEdges(edges).count()
          Triangles.triangleCensusFromEdges(edges).count()
          BfsHops.hubHopsFromEdges(edges).count()
          LabelPropagation.communitiesFromEdges(edges).count()
        } finally { spark.catalog.clearCache(); () }
      }
      println(f"""{"pass": $pass, "independent_sec": $indep%.2f, """ +
        f""""shared_sec": $shared%.2f, "saving": ${1 - shared / indep}%.3f}""")
    }
    spark.stop()
  }
}
