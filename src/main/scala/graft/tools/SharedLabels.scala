package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.dedup.Dedup

/** Round-10/11 measurement (verdict items): is a SHARED pair-graph
  * worth it for the cluster-grain consumers? d16 (survivor election),
  * s4 (leakage-free split), and mix4 (dedup-aware epoch allocation)
  * each re-derive `connectedComponents(minhashLshPairs(corpus))` when
  * run as standalone queries; a real curation pipeline would run the
  * pair+CC stage once and feed the label relation to all three. This
  * harness times both shapes on a fanned corpus:
  *
  *   independent: d16 full, s4 full, mix4 full (each pays pairs+CC);
  *   shared:      pairs+CC once (the labels come back localCheckpoint-
  *                materialized, so all consumers read blocks), then
  *                d16FromLabels + s4FromLabels + mix4FromLabels.
  *
  * The shared corpus is [[graft.text.TextAnalysis.withSourcedTwins]]
  * (withNearDups + the source column mix4 groups by — same doc_id/text
  * set, so the labels are identical relations either way).
  *
  * Usage: SharedLabels <dir-with-documents.parquet>. Two passes; the
  * second (post-JIT) is the recorded one. Results → BASELINE.md.
  */
object SharedLabels {
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
    def raw = spark.read.parquet(s"$dir/documents.parquet")
    def docs = graft.text.TextAnalysis.withSourcedTwins(raw)
    def timed(label: String)(op: => Unit): Double = {
      val t0 = System.nanoTime()
      op
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[shared-labels] $label: $dt%.2f s")
      dt
    }
    for (pass <- 1 to 2) {
      val indep = timed(s"pass$pass independent (d16 + s4 + mix4 full)") {
        Dedup.dedupSurvivors(docs).count()
        spark.catalog.clearCache()
        Dedup.clusterSplit(docs).count()
        spark.catalog.clearCache()
        graft.text.TextAnalysis.uniqueEpochAllocation(raw).count()
        spark.catalog.clearCache()
      }
      val shared = timed(s"pass$pass shared (pairs+CC once)") {
        val labels = Dedup.connectedComponents(
          Dedup.minhashLshPairs(docs).select(col("doc_a"), col("doc_b")))
        Dedup.dedupSurvivorsFromLabels(docs, labels).count()
        Dedup.clusterSplitFromLabels(docs, labels).count()
        graft.text.TextAnalysis
          .uniqueEpochAllocationFromLabels(docs, labels).count()
        spark.catalog.clearCache()
      }
      println(f"""{"pass": $pass, "independent_sec": $indep%.2f, """ +
        f""""shared_sec": $shared%.2f, "saving": ${1 - shared / indep}%.3f}""")
    }
    spark.stop()
  }
}
