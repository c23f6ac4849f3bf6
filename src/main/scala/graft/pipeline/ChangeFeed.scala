package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** E78: change data feed — the row-level diff between two keyed snapshots,
  * in Delta Lake CDF's exact vocabulary: `insert`, `delete`, and changed
  * rows as an `update_preimage` / `update_postimage` PAIR (consumers that
  * reverse aggregates need the preimage; consumers that re-apply state need
  * the postimage). Unchanged rows emit NOTHING — the feed's size is the
  * churn, not the table, which is the whole point of CDC at 100 TB:
  * downstream incremental jobs (the d8 dedup store, the t11 DF store, the
  * KPI upserts) consume deltas proportional to what changed.
  *
  * Composed with the store's epoch time travel ([[Pipeline.readAt]]) via
  * [[betweenEpochs]], this is the Delta `table_changes(...)` read path
  * rebuilt on the manifest store: any two committed epochs diff into a
  * consumable feed, after the fact, with no change-tracking work at write
  * time (the reference's lake stack gets this from Delta's CDF option;
  * here it falls out of manifests that already exist —
  * `docker/dockerfile.validation:32-35` is the Delta analogue).
  *
  * Scale shape: ONE full-outer equi-join on the key (both sides
  * hash-partitioned, AQE-splittable) + a narrow conditional explode —
  * identical machinery to the SCD2 merge (E77), which is no accident:
  * SCD2 is "apply the feed to a history table"; this op EMITS the feed.
  */
object ChangeFeed {

  /** Row-level changes turning `oldSnap` into `newSnap`. Both frames carry
    * `keys ++ tracked`; output appends `change_type`. Null-safe change
    * detection (`<=>`), like Scd2. */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
      tracked: Seq[String]): DataFrame = {
    val keyCond = keys.map(k => col(s"o.$k") === col(s"n.$k"))
      .reduce(_ && _)
    val changed = tracked.map(t => !(col(s"o.$t") <=> col(s"n.$t")))
      .reduce(_ || _)
    val oldOnly = keys.map(k => col(s"n.$k").isNull).reduce(_ && _)
    val newOnly = keys.map(k => col(s"o.$k").isNull).reduce(_ && _)
    def row(side: String, kind: String) =
      struct((keys ++ tracked).map(c => col(s"$side.$c").as(c)) :+
        lit(kind).as("change_type"): _*)
    oldSnap.alias("o").join(newSnap.alias("n"), keyCond, "full_outer")
      .select(explode(
        // unchanged rows fall through every branch to NULL, and
        // explode(NULL) emits zero rows — the no-op case costs nothing
        when(newOnly, array(row("n", "insert")))
          .when(oldOnly, array(row("o", "delete")))
          .when(changed, array(row("o", "update_preimage"),
            row("n", "update_postimage")))
        ).as("r"))
      .select(col("r.*"))
  }

  /** E174 (CDC2): INCREMENTAL AGGREGATE MAINTENANCE from a change feed
    * — the consumer that justifies carrying preimages at all: a grouped
    * aggregate (count + decimal sum per group) maintained EXACTLY from
    * the feed, O(churn) per refresh instead of O(table): inserts and
    * update_postimages contribute +1/+measure, deletes and
    * update_preimages contribute −1/−measure — so a row whose GROUP KEY
    * changed moves between groups correctly (the preimage subtracts
    * from the old group, the postimage adds to the new one; a
    * postimage-only feed cannot do this, which is why Delta CDF emits
    * pairs). Groups whose maintained count reaches zero drop out,
    * matching the direct aggregate exactly.
    *
    * The invariant IS the oracle (the strongest form a correctness gate
    * can take): maintain(agg(A), diff(A, B)) ≡ agg(B) — two genuinely
    * different decompositions of the same answer, compared bit-for-bit
    * by the driver. Exact arithmetic: counts are longs, measures sum in
    * DECIMAL(18,2) END TO END — the output keeps the decimal (callers
    * wanting a display double cast at THEIR boundary, as the cdc2 query
    * does), so chained refreshes maintain on exact state and
    * maintenance order cannot fork the result. (A review caught the
    * earlier form folding the output to double, which silently promoted
    * a CHAINED refresh's sums to float arithmetic.)
    *
    * Scale shape: one narrow signed projection of the feed (churn-
    * sized), one map-side-combined group aggregate over it, one keyed
    * full-outer against the base aggregate (group-grain — small). The
    * table itself is never touched: that is the entire point of CDC. */
  /** Base-state contract: `base` carries (`key`, `n_orders`, `n_vals`,
    * `sum_total` DECIMAL) — the aggregate state of the OLD snapshot,
    * where `n_vals` = count(measure), the NON-NULL measure count. The
    * auxiliary count is what makes NULL-measure semantics maintainable
    * (the classic AVG-maintenance requirement): `sum` over an all-NULL
    * group is NULL, and only the non-null count can tell "this group's
    * last real value was just deleted → NULL" apart from "sums cancel
    * → 0". Output carries the same four columns with `sum_total` still
    * DECIMAL(18,2), i.e. the output IS a valid `base` — chaining
    * refreshes is closed over this schema and stays bit-exact
    * (spec-pinned: a two-refresh chain equals the direct aggregate).
    * The output names are this operator's contract (the KPI
    * convention), not parameters. */
  def maintainAgg(base: DataFrame, feed: DataFrame, key: String,
      measure: String): DataFrame = {
    val money = org.apache.spark.sql.types.DecimalType(18, 2)
    val sign = when(col("change_type").isin("insert", "update_postimage"),
      1L).otherwise(-1L)
    val delta = feed
      .select(col(key), sign.as("sg"), col(measure).cast(money).as("m"))
      .groupBy(col(key))
      .agg(sum(col("sg")).as("d_n"),
        sum(when(col("m").isNotNull, col("sg")).otherwise(0L))
          .as("d_vals"),
        sum(col("sg") * col("m")).as("d_sum"))
    // the join must be NULL-SAFE on the group key (a NULL group is a
    // legal group — sum/count treat it as one; a plain equi-join would
    // split it into two output rows and break the invariant)
    val b = base.alias("b"); val d = delta.alias("d")
    b.join(d, col(s"b.$key") <=> col(s"d.$key"), "full_outer")
      .select(coalesce(col(s"b.$key"), col(s"d.$key")).as(key),
        (coalesce(col("b.n_orders"), lit(0L)) +
          coalesce(col("d.d_n"), lit(0L))).as("n_orders"),
        (coalesce(col("b.n_vals"), lit(0L)) +
          coalesce(col("d.d_vals"), lit(0L))).as("n_vals"),
        (coalesce(col("b.sum_total"), lit(0).cast(money)) +
          coalesce(col("d.d_sum"), lit(0).cast(money))).as("sum_dec"))
      .where(col("n_orders") > 0L)
      .select(col(key), col("n_orders"), col("n_vals"),
        // a group with rows but no non-null measures sums to NULL,
        // exactly like the direct aggregate; the decimal is KEPT (cast
        // back to the money precision from the widened sum type) so the
        // output is a legal next-refresh base
        when(col("n_vals") === 0L, lit(null).cast(money))
          .otherwise(col("sum_dec").cast(money)).as("sum_total"))
  }

  /** The CDF read path over the manifest store: diff two committed epochs
    * resolved through [[Pipeline.readAt]]. `schema` is the store schema
    * (as for readAt); all non-key columns are tracked. */
  def betweenEpochs(spark: SparkSession, path: String, epochA: Long,
      epochB: Long, schema: StructType, keys: Seq[String]): DataFrame = {
    val tracked = schema.map(_.name).filterNot(keys.contains)
    diff(Pipeline.readAt(spark, path, epochA, schema),
      Pipeline.readAt(spark, path, epochB, schema), keys, tracked)
  }
}
