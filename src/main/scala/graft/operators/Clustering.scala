package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** E56: multi-dimensional clustering (Z-order / Morton curve) for
  * data-skipping writes — the lakehouse layout trick Spark has no native
  * operator for.
  *
  * A table sorted on ONE column gives parquet files tight min/max ranges
  * on that column only: predicates on any other column scan every file.
  * Interleaving the bits of TWO (rank-normalized) columns into a Morton
  * key and range-sorting the write on that key bounds every file's span
  * on BOTH dimensions (≈ √(1/files) of each range instead of 100 % on
  * the second dimension) — so min/max footer pruning works for
  * predicates on either column, at the cost of neither being perfectly
  * clustered.
  *
  * All bit-spreading is codegen'd integer arithmetic (shift/and/or — the
  * classic magic-mask spread), and the write is
  * `repartitionByRange(key)` + `sortWithinPartitions(key)`: one range
  * shuffle, files emerge naturally z-clustered. The 16-bit per-dimension
  * resolution (32-bit key) is plenty: pruning granularity is FILES, and
  * 2^16 cells per dimension is far below any realistic file count.
  * ClusteringSpec measures the actual per-file spans both ways — the
  * evidence, not just the plan shape.
  */
object Clustering {

  /** Spread the low 16 bits of `x` to the even bit positions of a 32-bit
    * value (magic-mask bit spread). */
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

  /** Scale a numeric column to the 16-bit coordinate range using its
    * global min/max (two scalars the caller computes once — an agg over
    * footer-backed stats at scan time, not a data pass at 100 TB when
    * the catalog already knows the range). */
  def scaled16(c: Column, minV: Double, maxV: Double): Column = {
    val span = math.max(maxV - minV, 1e-300)
    least(lit(65535L),
      floor((c.cast("double") - lit(minV)) / lit(span) * 65536.0)
        .cast("long"))
  }

  /** Write `df` z-ordered on two numeric columns with caller-supplied
    * column ranges (the production entry point: at 100 TB the ranges come
    * from the catalog / footer statistics, not a data pass): range-
    * partition by the Morton key into `numFiles` partitions, sort within
    * each, drop the key, write parquet. One shuffle; the emitted files
    * carry bounded min/max spans on BOTH columns. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
      path: String, numFiles: Int,
      rangeA: (Double, Double), rangeB: (Double, Double)): Unit = {
    val key = mortonKey(
      scaled16(col(colA), rangeA._1, rangeA._2),
      scaled16(col(colB), rangeB._1, rangeB._2))
    df.withColumn("__zkey", key)
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Convenience overload that measures the ranges itself. The input is
    * persisted around the two actions (stats + write) so an expensive
    * upstream plan evaluates once, not twice — callers who already know
    * the ranges should use the explicit overload and skip the stats pass
    * entirely. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
      path: String, numFiles: Int): Unit = {
    val dfP = df.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    try {
      val stats = dfP.agg(
        min(col(colA)).cast("double"), max(col(colA)).cast("double"),
        min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
      writeZOrdered(dfP, colA, colB, path, numFiles,
        (stats.getDouble(0), stats.getDouble(1)),
        (stats.getDouble(2), stats.getDouble(3)))
    } finally dfP.unpersist()
  }
}
