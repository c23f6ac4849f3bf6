package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared within-order basket relations — ONE definition for the basket
  * family (the composition rule): mb1's association statistics and
  * rec1's item-item CF both derive from these, so a fix to the pair
  * enumeration lands in both (reference: the dedup family's shared LSH
  * banding helpers).
  *
  * Shape: baskets form in ONE fact-width shuffle (groupBy order →
  * sorted distinct-part array) and PERSIST — they feed several
  * consumers per query (pairs, item counts, totals), and the cache
  * lifetime follows the house contract (Verify/Bench clearCache after
  * each query). Canonical pairs explode WITHIN each basket array
  * (element i × every later element — the fact never meets itself in a
  * shuffle), bounded by basket size squared per order, linear in
  * orders. */
object Baskets {

  /** (l_orderkey, parts): the persisted basket relation — sorted
    * distinct part arrays, one row per order. */
  def baskets(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      .persist()

  /** (part_a, part_b) with part_a < part_b (the arrays are sorted):
    * one row per within-basket ordered pair occurrence. */
  def canonicalPairs(baskets: DataFrame): DataFrame =
    baskets.select(explode(flatten(transform(col("parts"),
        (x, i) => transform(
          slice(col("parts"), i + lit(2), size(col("parts"))),
          y => struct(x.as("part_a"), y.as("part_b")))))).as("pr"))
      .select(col("pr.part_a"), col("pr.part_b"))

  /** (p, c): per-item basket counts. */
  def itemCounts(baskets: DataFrame): DataFrame =
    baskets.select(explode(col("parts")).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("c"))
}
