package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TextFunctions._
import graft.io.Sources

/** Dev profiling harness: stage-level timings for the heavy near-dup
  * operators. Not part of the driver contract. */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Dedup.withNearDups(Sources.table(spark, sfDir, "documents"))
    time("docs.count")(docs.count())

    val sh = docs.select(col("doc_id"),
      explode(array_distinct(shingles(tokens(norm(col("text"))), 3))).as("sh"))
    time("shingles explode (no hash)")(sh.count())

    val shh = sh.select(col("doc_id"), charHash(col("sh")).as("h"))
    time("shingle charHash")(shh.count())

    val shc = shh.cache()
    time("shingle cache materialize")(shc.count())

    // permutation constants and band layout come from Dedup itself (one
    // counting discipline): if Dedup.perm/NumHashes/NumBands change,
    // these staged timings keep decomposing the real operator instead of
    // silently profiling a divergent copy
    val sig = time("minhash signatures build") {
      val mins = (0 until Dedup.NumHashes).map { i =>
        val (a, b) = Dedup.perm(i)
        min(pmod(col("h") * lit(a) + lit(b), lit(HashP))).as(s"mh_$i")
      }
      val s = shc.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*).cache()
      s.count(); s
    }

    val bandRows = Dedup.NumHashes / Dedup.NumBands
    val banded = sig.select(col("doc_id"),
      explode(array((0 until Dedup.NumBands).map { b =>
        struct(lit(b).as("band"), concat_ws("|",
          (0 until bandRows).map(r =>
            col(s"mh_${b * bandRows + r}").cast("string")): _*)
          .as("key"))
    }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    time("band candidates (pre-distinct)")(println("  cand=" + cand.count()))
    time("band candidates distinct")(println("  candD=" + cand.distinct().count()))

    time("full minhashLshPairs")(
      println("  pairs=" + Dedup.minhashLshPairs(
        Dedup.withNearDups(Sources.table(spark, sfDir, "documents"))).count()))

    time("full ngramJaccardPairs")(
      println("  pairs=" + Dedup.ngramJaccardPairs(
        Dedup.withNearDups(Sources.table(spark, sfDir, "documents"))).count()))

    spark.stop()
  }
}
