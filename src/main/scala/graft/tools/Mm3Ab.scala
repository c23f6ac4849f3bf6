package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Round-13 measurement (verdict task 1): the mm3 vs mm3x candidate-
  * volume curve — the number the d5→d5x lesson is ABOUT. For one fanned
  * tier this times the full near-dup query at both signature widths and
  * counts the raw banded-join candidates (the relation the hamming
  * filter then scans: band/key matches with doc_a < doc_b, BEFORE the
  * popcount filter and dedup — `Multimodal.bandedFrames` is exactly the
  * query's join input, factored so this harness cannot drift from the
  * shipping plan). Expected shape: the 16-bit exhibit's random term is
  * ~2·frames²/2¹⁶ and grows quadratically with the fan-out; the 60-bit
  * default's is 2¹⁴× smaller — candidates there should track the
  * genuine near-dup relation (planted twins ×N + tail-frame families).
  *
  * Usage: Mm3Ab <dir-with-documents.parquet>. Two passes, second
  * (post-JIT) recorded; one JSON line per (pass, width). Results →
  * BASELINE.md.
  */
object Mm3Ab {
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
    def docs = spark.read.parquet(s"$dir/documents.parquet")
    for (pass <- 1 to 2;
         bits <- Seq(Multimodal.SigBits, Multimodal.SigBitsWide)) {
      val t0 = System.nanoTime()
      val pairs = Multimodal.frameNearDupPairs(docs, bits = bits).count()
      val querySec = (System.nanoTime() - t0) / 1e9
      // raw candidate volume: the banded self-join's match count before
      // the hamming filter (mirrors the query's join condition exactly)
      val banded = Multimodal.bandedFrames(docs, bits)
      val t1 = System.nanoTime()
      val candidates = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") &&
            col("x.key") === col("y.key") &&
            col("x.doc_id") < col("y.doc_id"))
        .count()
      val candSec = (System.nanoTime() - t1) / 1e9
      spark.catalog.clearCache()
      println(f"""{"pass": $pass, "bits": $bits, """ +
        f""""query_sec": $querySec%.2f, "out_pairs": $pairs, """ +
        f""""candidates": $candidates, "cand_sec": $candSec%.2f}""")
    }
    spark.stop()
  }
}
