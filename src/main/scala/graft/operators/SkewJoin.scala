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
    require(!left.columns.contains("__salt") &&
      !right.columns.contains("__salt"),
      "saltedInner: __salt is reserved (a pre-existing column would be " +
        "overwritten and dropped from the result)")
    // default salt source: every HASHABLE left column (hash() rejects
    // MapType — an unrelated map column must not break a join on a
    // perfectly hashable key); callers pass a natural id for best spread
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case st: org.apache.spark.sql.types.StructType =>
        st.fields.exists(f => hasMap(f.dataType))
      case _ => false
    }
    val saltSrc =
      if (saltCols.nonEmpty) saltCols
      else left.schema.fields.filterNot(f => hasMap(f.dataType))
        .map(_.name).toSeq
    require(saltSrc.nonEmpty,
      "saltedInner: no hashable columns to derive the salt from — pass " +
        "saltCols explicitly")
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(saltSrc.map(col): _*), lit(factor)))
    val replicatedRight = right
      .withColumn("__salt", explode(array((0 until factor).map(lit): _*)))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }
}
