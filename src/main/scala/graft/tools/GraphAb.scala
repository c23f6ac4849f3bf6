package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{PageRank, Triangles}

/** Scratch A/B harness for the g1/g2 eager-materialization regression
  * (round 12): times the lazy-count form, the localCheckpoint form, and
  * the pre-materialized-caches + localCheckpoint form on one SF dir.
  * Dev tool; results feed BASELINE, then the loser is deleted. */
object GraphAb {
  def main(args: Array[String]): Unit = {
    val Array(dir) = args
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def li = spark.read.parquet(s"$dir/lineitem.parquet")
    def timed(label: String)(op: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = op
      System.err.println(
        f"[ab] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      spark.catalog.clearCache()
    }
    for (pass <- 1 to 2) {
      timed(s"p$pass g2 A lazy-count") {
        val edges = PageRank.copurchaseEdges(li).persist()
        try {
          val (frame, oriented) = Triangles.censusDataflow(edges)
          val n = frame.count()
          oriented.unpersist()
          n
        } finally { edges.unpersist(); () }
      }
      // after commit 9e20699 the shipping triangleCensus IS the lazy
      // form, so B times the shipping entry point (≈ A plus its own
      // interior cache handling), NOT the deleted localCheckpoint form —
      // variant C rebuilds that one inline for the contrast
      timed(s"p$pass g2 B shipping (lazy)") {
        Triangles.triangleCensus(li).count()
      }
      timed(s"p$pass g2 C pre-materialized + localCheckpoint") {
        val edges = PageRank.copurchaseEdges(li).persist()
        try {
          edges.count()
          val (frame, oriented) = Triangles.censusDataflow(edges)
          oriented.count()
          val out = try frame.localCheckpoint(true)
          finally { oriented.unpersist(); () }
          out.count()
        } finally { edges.unpersist(); () }
      }
      timed(s"p$pass g1 A lazy-count") {
        val edges = PageRank.copurchaseEdges(li).persist()
        try {
          val (frame, ed) = PageRank.rankDataflow(edges, PageRank.PrIters)
          val n = frame.count()
          ed.unpersist()
          n
        } finally { edges.unpersist(); () }
      }
      timed(s"p$pass g1 B shipping (lazy)") {
        PageRank.productPageRank(li).count()
      }
    }
    spark.stop()
  }
}
