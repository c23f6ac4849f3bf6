package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sim.Similarity

/** One-question probe: WHERE does the hierarchical assignment (d13)
  * actually beat the flat argmin (d12)? The ×100 sweep showed flat
  * winning at the derived cell count (assignment is a minor term there;
  * the approximate partition's extra within-cell pairs dominate), and
  * the scaladocs claim the crossover sits where assignment cost
  * N×cells takes over. This measures that claim instead of
  * extrapolating it: same corpus, EXPLICIT numCells stepped upward, one
  * warm run per (operator, cells) cell.
  *
  * Usage: CellCrossover <embDir> <cells csv, e.g. 521,2000,5000,10000>
  * (embDir = a sweep fan-out dir holding embeddings.parquet).
  */
object CellCrossover {
  def main(args: Array[String]): Unit = {
    val Array(dir, cellsCsv) = args
    val cellCounts = cellsCsv.split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // untimed warmup (codegen/JIT) at the smallest setting
    Similarity.semDedup(emb, cellCounts.head).count()
    Similarity.semDedupHier(emb, cellCounts.head).count()
    println("| cells | flat_sec | flat_rows | hier_sec | hier_rows |")
    println("| --- | --- | --- | --- | --- |")
    cellCounts.foreach { c =>
      def time(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (fs, fr) = time(Similarity.semDedup(emb, c).count())
      spark.catalog.clearCache()
      val (hs, hr) = time(Similarity.semDedupHier(emb, c).count())
      spark.catalog.clearCache()
      println(f"| $c | $fs%.2f | $fr | $hs%.2f | $hr |")
    }
    spark.stop()
  }
}
