package graft.tools

import org.apache.spark.sql.SparkSession

import graft.text.TextAnalysis

/** T22 knob-cost probe (the n8x/PqKsub convention): the unigram
  * trainer's 64-seed/32-final/3-iteration vocabulary is the bounded
  * exhibit — this harness measures what the knobs COST, pinning the
  * "vocabulary grain ⇒ knobs are cheap" claim with numbers instead of
  * an argument. For each (seedMulti, emIters) cell it records trainer
  * wall and the FINAL kept multi-piece vocabulary, then reports churn
  * vs the shipping (64, 3) baseline: shared pieces, pieces only in one
  * setting, and whether the shared pieces keep their relative ranking.
  *
  * Usage: UniKnobs <sfOrSweepDir>  (e.g. target/sweep/x10). */
object UniKnobs {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // untimed warmup of the FULL trainer (not just the scan): the first
    // measured run otherwise absorbs Janino/JIT for the Viterbi fold
    // and reads 3-5x over steady state (observed 12.8 vs 4.2 s at x10)
    TextAnalysis.unigramVocab(docs, 3, 64)
    val cells = Seq((64, 3), (256, 3), (64, 5), (256, 5))
    val results = cells.map { case (seed, iters) =>
      val t0 = System.nanoTime()
      val vocab = TextAnalysis.unigramVocab(docs, iters, seed)
      val sec = (System.nanoTime() - t0) / 1e9
      val multis = vocab.filter(_._1.length > 1).map(_._1)
      System.err.println(
        f"[uniknobs] seed=$seed iters=$iters wall=$sec%.2f s " +
          f"keptMultis=${multis.size}")
      ((seed, iters), sec, multis)
    }
    val (_, baseSec, baseMultis) = results.head
    results.foreach { case ((seed, iters), sec, multis) =>
      val shared = multis.filter(baseMultis.contains)
      // relative-ranking stability among SHARED pieces: the shared
      // subsequence must appear in the same order as the baseline's
      val baseOrderOfShared = baseMultis.filter(shared.contains)
      val stable = shared == baseOrderOfShared
      println(
        s"""{"seed":$seed,"iters":$iters,"wall_sec":${f"$sec%.2f"},""" +
          s""""wall_vs_base":${f"${sec / baseSec}%.2f"},""" +
          s""""kept_multis":${multis.size},"shared_with_base":${shared.size},""" +
          s""""only_here":${multis.count(!baseMultis.contains(_))},""" +
          s""""only_base":${baseMultis.count(!multis.contains(_))},""" +
          s""""shared_rank_stable":$stable}""")
    }
    spark.stop()
  }
}
