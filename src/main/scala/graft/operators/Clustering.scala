package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** E56: multi-dimensional clustering (Z-order / Morton curve) for
  * data-skipping writes — the lakehouse layout trick Spark has no native
  * operator for.
  *
  * A table sorted on ONE column gives parquet files tight min/max ranges
  * on that column only: predicates on any other column scan every file.
  * Interleaving the bits of N (rank-normalized) columns into a Morton
  * key and range-sorting the write on that key bounds every file's span
  * on ALL N dimensions (≈ (1/files)^(1/N) of each range instead of 100 %
  * on the non-sort dimensions) — so min/max footer pruning works for
  * predicates on any clustered column, at the cost of none being
  * perfectly clustered.
  *
  * All bit-spreading is codegen'd integer arithmetic (shift/and/or), and
  * the write is `repartitionByRange(key)` + `sortWithinPartitions(key)`:
  * one range shuffle, files emerge naturally z-clustered. Per-dimension
  * resolution is 16 bits for 2–3 columns and 62/N bits beyond (the key
  * must stay in a positive 64-bit long); pruning granularity is FILES,
  * and even 2^15 cells per dimension is far below any realistic file
  * count. ClusteringSpec measures the actual per-file spans — the
  * evidence, not just the plan shape.
  */
object Clustering {

  /** Coordinate bits per dimension for an N-column key: 16 where that
    * fits a positive long (N ≤ 3), else 62/N (N=4 → 15 bits). */
  def bitsFor(n: Int): Int = {
    require(n >= 2, s"z-order needs at least 2 columns, got $n")
    math.min(16, 62 / n)
  }

  /** Spread the low 16 bits of `x` to the even bit positions of a 32-bit
    * value (magic-mask bit spread — the 2-dim fast path). */
  private def spread(x: Column): Column = {
    val v0 = x.bitwiseAND(lit(0xFFFFL))
    val v1 = (v0.bitwiseOR(shiftleft(v0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val v2 = (v1.bitwiseOR(shiftleft(v1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = (v2.bitwiseOR(shiftleft(v2, 2))).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton key interleaving two 16-bit scaled coordinates: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. Inputs must already be
    * scaled to [0, 65535] — see [[scaled16]]. */
  def mortonKey(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Morton key over N pre-scaled coordinates: bit i of dimension d lands
    * at position i·N + d, so the key orders by the interleaved digits of
    * all dimensions. N=2 routes through the magic-mask fast path; for
    * N ≥ 3 the spread is an explicit OR-of-shifted-bits chain — still
    * pure codegen'd integer arithmetic, just bitsFor(N)·N terms (≤ 64,
    * far below any Catalyst tree-size concern). Inputs must be scaled to
    * [0, 2^bitsFor(N)−1] — see [[scaledBits]]. */
  def mortonKeyN(coords: Seq[Column]): Column = {
    val n = coords.size
    if (n == 2) mortonKey(coords(0), coords(1))
    else {
      val bits = bitsFor(n)
      val terms = for {
        (c, d) <- coords.zipWithIndex
        i <- 0 until bits
      } yield shiftleft(c.bitwiseAND(lit(1L << i)), i * (n - 1) + d)
      terms.reduce(_.bitwiseOR(_))
    }
  }

  /** Scale a numeric column to an unsigned `bits`-bit coordinate using its
    * global min/max (two scalars the caller computes once — an agg over
    * footer-backed stats at scan time, not a data pass at 100 TB when the
    * catalog already knows the range). Clamped on BOTH ends: a value
    * outside [minV, maxV] (stale catalog stats, late-arriving outlier)
    * saturates at the boundary cell instead of wrapping under the spread
    * mask and scrambling that row's key. */
  def scaledBits(c: Column, minV: Double, maxV: Double, bits: Int): Column = {
    val cells = 1L << bits
    val span = math.max(maxV - minV, 1e-300)
    greatest(lit(0L),
      least(lit(cells - 1),
        floor((c.cast("double") - lit(minV)) / lit(span) * cells.toDouble)
          .cast("long")))
  }

  /** 16-bit convenience used by the 2-dim fast path. */
  def scaled16(c: Column, minV: Double, maxV: Double): Column =
    scaledBits(c, minV, maxV, 16)

  /** Write `df` z-ordered on N numeric columns with caller-supplied
    * column ranges (the production entry point: at 100 TB the ranges come
    * from the catalog / footer statistics, not a data pass): range-
    * partition by the Morton key into `numFiles` partitions, sort within
    * each, drop the key, write parquet. One shuffle; the emitted files
    * carry bounded min/max spans on ALL clustered columns. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int, ranges: Seq[(Double, Double)]): Unit = {
    require(cols.size == ranges.size,
      s"${cols.size} columns but ${ranges.size} ranges")
    val bits = bitsFor(cols.size)
    val key = mortonKeyN(cols.zip(ranges).map { case (c, (lo, hi)) =>
      scaledBits(col(c), lo, hi, bits)
    })
    df.withColumn("__zkey", key)
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Two-column entry point with explicit ranges (kept for source compat;
    * delegates to the N-column path, which routes N=2 through the
    * magic-mask spread). */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
      path: String, numFiles: Int,
      rangeA: (Double, Double), rangeB: (Double, Double)): Unit =
    writeZOrdered(df, Seq(colA, colB), path, numFiles, Seq(rangeA, rangeB))

  /** Convenience overload that measures the ranges itself. The input is
    * persisted around the two actions (stats + write) so an expensive
    * upstream plan evaluates once, not twice — callers who already know
    * the ranges should use the explicit overload and skip the stats pass
    * entirely. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int): Unit = {
    val dfP = df.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    try {
      val aggs = cols.flatMap(c =>
        Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
      val stats = dfP.agg(aggs.head, aggs.tail: _*).head()
      // an empty input (or an all-null clustered column) yields NULL
      // min/max — fail with the actual problem, not a getDouble NPE
      // buried inside the write job
      cols.zipWithIndex.foreach { case (c, i) =>
        require(!stats.isNullAt(2 * i) && !stats.isNullAt(2 * i + 1),
          s"writeZOrdered: no measurable range for column '$c' — input " +
            "is empty or the column is entirely null; pass explicit " +
            "ranges or filter first")
      }
      val ranges = cols.indices.map(i =>
        (stats.getDouble(2 * i), stats.getDouble(2 * i + 1)))
      writeZOrdered(dfP, cols, path, numFiles, ranges)
    } finally dfP.unpersist()
  }

  /** Two-column self-measuring overload (source compat). */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
      path: String, numFiles: Int): Unit =
    writeZOrdered(df, Seq(colA, colB), path, numFiles)
}
