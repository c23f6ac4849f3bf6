package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Scaling-curve harness for the dedup/CC/ANN tier: fan the sf0.1
  * `documents`/`embeddings` tables out ×N with deterministic, content-
  * DECORRELATED copies, then time the bucketed operators at each scale
  * with scheduler counters — turning the "this survives 100 TB" plan-shape
  * arguments into measured cost curves (BASELINE.md records the output).
  *
  * Decorrelation is the point of the generator: verbatim (or merely
  * appended-token) copies would make every original and its 9 clones
  * mutual near-duplicates, growing candidate PAIRS quadratically in the
  * fan-out — a measurement artifact no real ×10 corpus has (real growth
  * adds new documents at a constant dup RATE; the planted-twin convention
  * is applied by the queries themselves via `withNearDups`, exactly as at
  * sf0.1). So each copy k>0:
  *  - documents: permutes the doc's tokens by sorting on
  *    md5(token # doc_id # k) — same vocabulary, same length profile, same
  *    lang/source mix, but order-sensitive shingles share only
  *    coincidental 3-grams with the original (Jaccard ≈ background);
  *  - embeddings: adds a deterministic per-component offset in
  *    [-0.05, 0.05) so clones spread through cosine space instead of
  *    piling 10-deep into every LSH/IVF bucket.
  * Ids shift by k·(max+1): dense, and far below the 100000 twin offset
  * the dedup corpora add, so no planted-id collision up to ×20.
  *
  * Usage: ScaleSweep <srcSfDir> <workDir> <factors csv, e.g. 1,3,10>
  * (factor 1 runs on srcSfDir directly). Timing protocol matches Bench:
  * untimed warmup, per-query cache clear, counters snapshotted via
  * listener drain.
  */
object ScaleSweep {

  val SweepQueries: Seq[String] = Seq(
    "d1_exact_dedup", "d3_minhash_lsh", "d5_simhash_pairs",
    "d7_jaccard_dfcap", "d8_incremental_dedup", "d9_dup_clusters",
    "n2_ann_lsh", "n4_ann_ivf", "n5_ann_ivf_trained")

  private final class Counters extends SparkListener {
    val jobs = new AtomicLong
    val stages = new AtomicLong
    val tasks = new AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      jobs.incrementAndGet(); ()
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(s.stageInfo.numTasks.toLong); ()
    }
  }

  /** Deterministically permute a doc's tokens for copy `k`: sort by the
    * md5 of (token, doc_id, k). Same multiset, pseudo-random order. */
  private def permutedText(k: Int) = {
    val toks = TextFunctions.tokens(TextFunctions.norm(col("text")))
    array_join(
      transform(
        array_sort(transform(toks, t => struct(
          md5(concat(t, lit("#"), col("doc_id").cast("string"),
            lit("#"), lit(k.toString)).cast("binary")).as("h"),
          t.as("t")))),
        s => s.getField("t")),
      " ")
  }

  def scaleDocuments(docs: DataFrame, factor: Int): DataFrame = {
    val stride = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
    (0 until factor).map { k =>
      val text = if (k == 0) col("text") else permutedText(k)
      docs.select(
        (col("doc_id") + lit(k * stride)).as("doc_id"),
        text.as("text"), col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    }.reduce(_ unionByName _)
  }

  def scaleEmbeddings(emb: DataFrame, factor: Int): DataFrame = {
    val stride = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
    (0 until factor).map { k =>
      val vec =
        if (k == 0) col("embedding")
        else transform(col("embedding"), (x, i) =>
          (x + (pmod(col("vec_id") * 1315423911L + lit(k) * 2654435761L +
            i.cast("long") * 97L, lit(1000L)).cast("double") / 1000.0 - 0.5)
            * 0.1).cast("float"))
      emb.select((col("vec_id") + lit(k * stride)).as("vec_id"),
        vec.as("embedding"), col("label"))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, workDir, factorsCsv) = args
    val factors = factorsCsv.split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dirs = factors.map { f =>
      if (f == 1) f -> srcDir
      else {
        val out = s"$workDir/x$f"
        scaleDocuments(spark.read.parquet(s"$srcDir/documents.parquet"), f)
          .repartition(cpus.toInt)
          .write.mode("overwrite").parquet(s"$out/documents.parquet")
        scaleEmbeddings(spark.read.parquet(s"$srcDir/embeddings.parquet"), f)
          .repartition(cpus.toInt)
          .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
        f -> out
      }
    }

    val counters = new Counters
    spark.sparkContext.addSparkListener(counters)
    def snap(): (Long, Long, Long) = {
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      (counters.jobs.get(), counters.stages.get(), counters.tasks.get())
    }

    // one untimed warmup of the whole set at the smallest scale
    SweepQueries.foreach { q =>
      try graft.SparkEntry.queries(q)(spark, dirs.head._2).count()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }

    val rows = for ((f, dir) <- dirs; q <- SweepQueries) yield {
      val (j0, s0, t0) = snap()
      val start = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      val sec = (System.nanoTime() - start) / 1e9
      val (j1, s1, t1) = snap()
      spark.catalog.clearCache()
      (q, f, sec, n, j1 - j0, s1 - s0, t1 - t0)
    }

    println("| query | scale | sec | out_rows | jobs | stages | tasks |")
    println("| --- | --- | --- | --- | --- | --- | --- |")
    rows.foreach { case (q, f, sec, n, j, s, t) =>
      println(f"| $q | x$f | $sec%.2f | $n | $j | $s | $t |")
    }
    spark.stop()
  }
}
