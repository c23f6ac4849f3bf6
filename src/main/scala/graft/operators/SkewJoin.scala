package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins (SURVEY §4 / the 100-TB
  * checklist): when one join key carries a disproportionate share of the
  * left side's rows, a plain shuffle sends that key's entire volume to ONE
  * reducer. Salting splits the hot key's rows across `factor` sub-
  * partitions and replicates the (small-per-key) right side to meet them.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) solves the same problem at runtime by splitting oversized
  * partitions; explicit salting remains the tool when (a) the skew is in
  * the AGGREGATION key rather than partition sizes AQE can see, (b) the
  * join is broadcast-ineligible and a single key exceeds one executor's
  * memory, or (c) deterministic pre-partitioning is wanted across jobs.
  *
  * The salt is deterministic (hash of stable columns, not rand()) so
  * retried tasks produce identical output — rand() in a shuffle input is
  * a correctness bug under task retry.
  */
object SkewJoin {

  /** Inner equi-join `left ⋈ right ON left(key) = right(key)` with the
    * left side salted into `factor` buckets per key and the right side
    * replicated `factor` times. Result equals the plain join, row for row.
    *
    * @param saltCols stable left-side columns to derive the deterministic
    *                 salt from (defaults to the key itself plus all
    *                 columns — pass the row's natural id for best spread).
    */
  def saltedInner(left: DataFrame, right: DataFrame, key: String,
      factor: Int, saltCols: Seq[String] = Nil): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val saltSrc = if (saltCols.nonEmpty) saltCols else left.columns.toSeq
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(saltSrc.map(col): _*), lit(factor)))
    val replicatedRight = right
      .withColumn("__salt", explode(array((0 until factor).map(lit): _*)))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }
}
