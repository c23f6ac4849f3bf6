package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.EntityResolution

/** Round-11 measurement (verdict item 2): QUANTIFY er3's window-local
  * recall against er1's blocked ground truth — the tradeoff the
  * sorted-neighborhood operator ships with documented but (until now)
  * unmeasured, and the number that justifies the published fix (more
  * passes) against its cost (one extra rank+join per pass).
  *
  * Ground truth = er1 `entityMatchPairs` (blocked, edit distance ≤ 2).
  * For each (passes, window) cell: recall = |SNM pairs ∩ truth| /
  * |truth| (intersection by pair key — SNM may also find CROSS-block
  * pairs er1's blocking key excludes; those aren't counted against it
  * here, this is a recall-of-truth curve, not precision).
  *
  * Usage: ErRecall <dir-with-customer.parquet>. One JSON line per cell
  * → BASELINE.md.
  */
object ErRecall {
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
    val customers = spark.read.parquet(s"$dir/customer.parquet")
    // SPARK_GRAFT_ER_TIME_ONLY=1: skip the er1 ground truth (quadratic
    // in block size — the er2 wall; unaffordable on a fanned customer
    // table) and time the SNM pass ladder alone: the at-scale cost side
    // of the "more passes are cheap" claim whose recall side the
    // default mode measures at sf0.1.
    val timeOnly = sys.env.contains("SPARK_GRAFT_ER_TIME_ONLY")
    if (timeOnly) {
      for (passes <- Seq(2, 4); window <- Seq(5, 10); pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = EntityResolution.sortedNeighborhoodPairsKeys(
          customers, EntityResolution.snmKeys(passes), window).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"""{"passes": $passes, "window": $window, """ +
          f""""jvm_pass": $pass, "pairs": $n, "sec": $dt%.2f}""")
      }
      spark.stop(); return
    }
    val truth = EntityResolution.entityMatchPairs(customers)
      .select(col("custkey_a"), col("custkey_b"))
      .localCheckpoint(true)
    val nTruth = truth.count()
    // fail loud rather than emit "recall": NaN (invalid JSON) on a
    // fixture with no planted near-duplicates
    require(nTruth > 0L,
      s"no er1 ground-truth pairs in $dir — recall is undefined")
    // note: "sec" covers the SNM build + the truth semi-join + count —
    // the measured quantity is the recall CELL's cost, not the ladder
    // alone (SPARK_GRAFT_ER_TIME_ONLY isolates the ladder)
    for (passes <- 1 to 4; window <- Seq(2, 5, 10)) {
      val t0 = System.nanoTime()
      val snm = EntityResolution.sortedNeighborhoodPairsKeys(
        customers, EntityResolution.snmKeys(passes), window)
      val hit = snm.join(truth, Seq("custkey_a", "custkey_b"),
        "left_semi").count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"""{"passes": $passes, "window": $window, """ +
        f""""truth_pairs": $nTruth, "recalled": $hit, """ +
        f""""recall": ${hit.toDouble / nTruth}%.4f, "sec": $dt%.2f}""")
    }
    spark.stop()
  }
}
