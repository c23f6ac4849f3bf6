package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Clustering

/** Z-order clustering (E56): the measured data-skipping evidence — after
  * a z-ordered write, EVERY file's min/max span is bounded on BOTH
  * dimensions, while a single-column sort leaves the other dimension
  * unclustered (full-range spans ⇒ no pruning). */
class ClusteringSpec extends SparkSpec {

  test("morton key interleaves bits (locality-preserving)") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L))
      .toDF("a", "b")
      .select(Clustering.mortonKey(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    assert(rows(0) === 0L)
    assert(rows(1) === 1L) // bit 0 of a → position 0
    assert(rows(2) === 2L) // bit 0 of b → position 1
    assert(rows(3) === 0xFFFFFFFFL) // all 32 bits set
  }

  test("z-ordered files bound min/max spans on BOTH columns; single-sort doesn't") {
    import spark.implicits._
    // two independent uniform dimensions — the worst case for any
    // single-column sort
    val n = 20000
    val df = (0 until n).map { i =>
      (((i * 2654435761L) % 100000L), ((i * 40503L + 7) % 100000L))
    }.toDF("x", "y")
    val files = 16

    val zDir = Files.createTempDirectory("graft-zorder").toString
    val sDir = Files.createTempDirectory("graft-xsort").toString
    Clustering.writeZOrdered(df, "x", "y", zDir, files)
    df.repartitionByRange(files, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(sDir)

    // per-FILE spans via the same min/max stats footer pruning would use
    def spans(dir: String): Seq[(Double, Double)] =
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).toSeq
        .map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min(col("x")), max(col("x")), min(col("y")), max(col("y")))
            .head()
          ((r.getLong(1) - r.getLong(0)) / 100000.0,
            (r.getLong(3) - r.getLong(2)) / 100000.0)
        }

    val z = spans(zDir)
    val s = spans(sDir)
    assert(z.size === files && s.size === files)
    // Pruning value is an AGGREGATE property (expected fraction of files
    // skipped per predicate), so the honest metric is the MEAN per-file
    // span: 16 files on a 2-d Morton curve ⇒ ≈ √(1/16) = 25 % per
    // dimension for quadrant-aligned files, with a few range-boundary
    // files legitimately wider (sampled range splits straddle curve
    // jumps). Single-sort leaves y at ~100 % in EVERY file.
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    val zMean = mean(z.map { case (a, b) => math.max(a, b) })
    assert(zMean <= 0.45,
      s"z-order must bound BOTH dims on average, mean worst-dim span $zMean")
    assert(mean(s.map(_._2)) >= 0.9,
      "x-sorted files must be unclustered on y, or this proves nothing")
    assert(s.map(_._1).max <= 0.2,
      "x-sorted files are tightly clustered on x (the one-dim baseline)")
  }

  test("mortonKeyN interleaves N dims at stride N; scaledBits clamps both ends") {
    import spark.implicits._
    val rows = Seq(
      (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L), (65535L, 65535L, 65535L))
      .toDF("a", "b", "c")
      .select(Clustering.mortonKeyN(Seq(col("a"), col("b"), col("c"))).as("z"))
      .collect().map(_.getLong(0))
    assert(rows(0) === 1L) // bit 0 of dim 0 → position 0
    assert(rows(1) === 2L) // bit 0 of dim 1 → position 1
    assert(rows(2) === 4L) // bit 0 of dim 2 → position 2
    assert(rows(3) === (1L << 48) - 1) // all 48 bits set
    // out-of-range values saturate at the boundary cell instead of
    // wrapping under the spread mask (stale-catalog-stats safety)
    val clamped = Seq(-50.0, 0.0, 100.0, 250.0).toDF("v")
      .select(Clustering.scaledBits(col("v"), 0.0, 100.0, 16).as("s"))
      .collect().map(_.getLong(0))
    assert(clamped(0) === 0L, "below-min must clamp to 0, not wrap negative")
    assert(clamped(1) === 0L)
    assert(clamped(2) === 65535L)
    assert(clamped(3) === 65535L, "above-max must saturate at the top cell")
  }

  test("3-column z-order bounds per-file spans on ALL THREE dims") {
    import spark.implicits._
    // three mutually independent uniform dimensions
    val n = 30000
    val df = (0 until n).map { i =>
      ((i * 2654435761L) % 100000L,
        (i * 40503L + 7) % 100000L,
        (i * 69621L + 13) % 100000L)
    }.toDF("x", "y", "z")
    val files = 16

    val zDir = Files.createTempDirectory("graft-zorder3").toString
    val sDir = Files.createTempDirectory("graft-xsort3").toString
    Clustering.writeZOrdered(df, Seq("x", "y", "z"), zDir, files)
    df.repartitionByRange(files, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(sDir)

    def spans(dir: String): Seq[(Double, Double, Double)] =
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).toSeq
        .map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min(col("x")), max(col("x")), min(col("y")), max(col("y")),
              min(col("z")), max(col("z")))
            .head()
          ((r.getLong(1) - r.getLong(0)) / 100000.0,
            (r.getLong(3) - r.getLong(2)) / 100000.0,
            (r.getLong(5) - r.getLong(4)) / 100000.0)
        }

    val z = spans(zDir)
    val s = spans(sDir)
    assert(z.size === files && s.size === files)
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    // 16 files over a 3-d curve ⇒ ideal per-dim span (1/16)^(1/3) ≈ 40 %,
    // with range-boundary files wider (splits straddle curve jumps); the
    // MEAN worst-dim span is the honest aggregate-pruning metric.
    val zMean = mean(z.map { case (a, b, c) => math.max(a, math.max(b, c)) })
    assert(zMean <= 0.7,
      s"3-dim z-order must bound ALL dims on average, mean worst-dim span $zMean")
    assert(mean(s.map(_._2)) >= 0.9 && mean(s.map(_._3)) >= 0.9,
      "x-sorted files must be unclustered on y and z, or this proves nothing")
  }
}
