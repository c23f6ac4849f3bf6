package graft.merge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed merge-upsert (reference SURVEY.md §2.7) — the most engine-like piece
  * of the reference: its DynamoDB writers (`scripts/helperfunction.py:53-208`)
  * read the existing item per key, take each new field if non-null else keep
  * the old, union the `data_sources` provenance list, and batch-write.
  * The three order-KPI source modes (`orders_only` / `order_items_only` /
  * `complete`) each set a *subset* of fields and must preserve the rest.
  *
  * Spark formulation: a full-outer join of updates vs target on the key,
  * projecting `coalesce(update.f, target.f)` per field and
  * `array_union` on provenance. Rows only in target pass through; rows only
  * in updates insert. This is exactly Delta `MERGE INTO ... whenMatched
  * updateExpr(coalesce...) whenNotMatched insertAll` — Delta jars are not on
  * this classpath, so the join form is the storage-free equivalent with the
  * same semantics and physical shape: ONE shuffle of both sides on the
  * key. (A full-outer equi-join can NOT be planned as a broadcast hash
  * join — preserving unmatched rows of both sides needs both sides
  * partitioned — so small updates don't remove the target shuffle here.
  * At 100 TB the shuffle-avoiding path is the partition-scoped store
  * merge `Pipeline.upsertStore` uses: only the touched date partitions
  * join, exactly as Delta prunes MERGE by partition predicate.)
  *
  * Null-field behavior is the subtle part: an update row with a NULL field
  * must NOT clobber the target's value (reference
  * `helperfunction.py:149-151,179-181`); `coalesce(u.f, t.f)` encodes that.
  * Merge is idempotent: applying the same update twice is a no-op
  * (property-tested in MergeSpec).
  */
object KpiMerge {

  /** Generic per-field-coalesce merge.
    *
    * @param target    current KPI table
    * @param updates   new KPI rows (null field = "leave existing value")
    * @param keys      join key columns (present in both)
    * @param fields    value columns to merge with coalesce(new, old)
    * @param provenanceCol optional array&lt;string&gt; column set-unioned
    *                  across both sides (reference `data_sources`,
    *                  `helperfunction.py:99-101,153-154,183-201`)
    */
  def merge(target: DataFrame, updates: DataFrame, keys: Seq[String],
      fields: Seq[String], provenanceCol: Option[String] = None): DataFrame = {
    val t = target.as("t")
    val u = updates.as("u")
    val joined = u.join(t, keys, "full_outer")
    val keyCols = keys.map(col)
    val fieldCols = fields.map(f =>
      coalesce(col(s"u.$f"), col(s"t.$f")).as(f))
    val provCols = provenanceCol.toSeq.map { p =>
      // array_union(NULL, x) is NULL, so coalesce each side to empty first;
      // sort for a canonical, order-independent provenance set.
      val empty = array().cast("array<string>")
      array_sort(array_union(
        coalesce(col(s"t.$p"), empty),
        coalesce(col(s"u.$p"), empty))).as(p)
    }
    joined.select(keyCols ++ fieldCols ++ provCols: _*)
  }

  /** Category-KPI merge: key (category, order_date), fields per
    * `scripts/helperfunction.py:84-97`. */
  def mergeCategoryKpi(target: DataFrame, updates: DataFrame): DataFrame =
    merge(target, updates, Seq("category", "order_date"),
      Seq("daily_revenue", "avg_order_value", "avg_return_rate"),
      Some("data_sources"))

  /** Order-KPI merge: key (order_date), fields per
    * `scripts/helperfunction.py:127-201`. A mode that doesn't set a field
    * simply carries NULL there and the old value survives. */
  def mergeOrderKpi(target: DataFrame, updates: DataFrame): DataFrame =
    merge(target, updates, Seq("order_date"),
      Seq("total_orders", "total_revenue", "total_items_sold",
        "return_rate", "unique_customers"),
      Some("data_sources"))
}
