package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.Sources
import graft.multimodal.Multimodal

/** Dev profiling harness for the mm3/mm3x/mm4 frame near-dup family:
  * times each stage of the pipeline in isolation (noop sink) so the
  * expensive stage is measurable, not guessed. Not part of the driver
  * contract. */
object Mm3Profile {
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def time(label: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"[mm3profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Sources.table(spark, sfDir, "documents")

    val corpus = Multimodal.withNearDupMediaHex(
      Multimodal.mediaHex(Multimodal.mediaCorpus(docs)))
    for (round <- 1 to 2) {
      println(s"--- pass $round ---")
      time("corpus hex (synthesis only)")(noop(corpus))
      time("sig32 fold")(noop(Multimodal.frameSignatures(corpus)))
      time("sig60 fold")(noop(Multimodal.frameSignaturesWide(corpus)))
      time("mm3 full (32-bit)")(noop(
        Multimodal.frameNearDupPairs(docs, bits = Multimodal.SigBits)))
      time("mm3x full (60-bit)")(noop(Multimodal.frameNearDupPairs(docs)))
      time("mm4 full (aHash)")(noop(Multimodal.aHashNearDupPairs(docs)))
    }
    spark.stop()
  }
}
