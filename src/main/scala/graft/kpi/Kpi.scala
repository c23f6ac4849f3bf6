package graft.kpi

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** KPI stage (reference SURVEY.md §2.3 J1/J2, §2.4 A1-A5).
  *
  * Reference shape (`scripts/transformation.py:177-248`): a 3-way inner
  * equi-join orders ⋈ order_items ⋈ products feeding two aggregation
  * families (per-category and global), with three availability modes —
  * `complete`, `order_items_only`, `orders_only` — that null out the
  * unavailable KPI fields.
  *
  * Money semantics: the reference sums raw doubles, which is
  * order-nondeterministic. We sum `DECIMAL(18,2)` — exact, associative,
  * reproducible across any partitioning/AQE replan — then cast the final
  * sum to double at the output boundary (one deterministic conversion; the
  * averages likewise divide the exact decimal sum as a final IEEE op). At
  * 100 TB reproducibility of money aggregates is a correctness property,
  * not a style choice; exposing double keeps the public schema identical to
  * the reference's (which sums doubles end-to-end).
  *
  * Scale notes:
  *  - products is the small dimension → explicit `broadcast` hint (the
  *    reference left it to AQE; at a 1000-executor scale you don't want a
  *    sort-merge join against a dimension table ever).
  *  - both KPI families are computed from ONE cached/joined plan — the
  *    reference re-executed the full 3-way join once per family
  *    (`scripts/transformation.py:193,205`).
  *  - `countDistinct` is exact (Expand + 2-phase agg), matching the
  *    reference; `approx_count_distinct` is the documented relaxation when a
  *    5% error is acceptable at 100 TB.
  */
object Kpi {

  private val money = DecimalType(18, 2)

  /** J1: 3-way inner equi-join with the dimension broadcast. */
  def threeWayJoin(orders: DataFrame, items: DataFrame,
      products: DataFrame): DataFrame =
    orders.as("o")
      .join(items.as("oi"), col("o.order_id") === col("oi.order_id"))
      .join(broadcast(products.as("p")), col("oi.product_id") === col("p.id"))

  /** J2: items ⋈ products (order_items_only mode). */
  def itemsProductsJoin(items: DataFrame, products: DataFrame): DataFrame =
    items.as("oi")
      .join(broadcast(products.as("p")), col("oi.product_id") === col("p.id"))

  /** Ratio with an explicit zero-denominator guard: Spark 4 runs ANSI
    * mode by default, where x / 0 THROWS instead of returning null — an
    * empty input frame (the global aggs still emit one row) or a group
    * whose denominator column is entirely null would abort the whole KPI
    * job. NULL is the reference's own avg()-over-nothing answer; the
    * oracle twins mirror with NULLIF. One definition for every consumer
    * (this file + SparkEntry's m1 halves and compat arm). */
  private[graft] def ratio(num: Column, den: Column): Column =
    when(den === 0, lit(null).cast("double")).otherwise(num / den)

  /** A1/A5: per-category KPIs over a joined frame carrying `p.category`,
    * `oi.sale_price`, `oi.status`, `oi.id`
    * (reference `scripts/transformation.py:187-191`). */
  def categoryKpi(joined: DataFrame): DataFrame =
    joined.groupBy(col("p.category").as("category")).agg(
      sum(col("oi.sale_price").cast(money)).cast("double").as("daily_revenue"),
      // avg(sale_price) semantics (transformation.py:189): the denominator is
      // count(sale_price) — non-null values only — NOT count(id).
      ratio(sum(col("oi.sale_price").cast(money)).cast("double"),
        count(col("oi.sale_price"))).as("avg_order_value"),
      ratio(count(when(col("oi.status") === "returned", true)).cast("double"),
        count(col("oi.id"))).as("avg_return_rate"))

  /** A2: global order KPIs, complete mode
    * (reference `scripts/transformation.py:197-203`). */
  def orderKpiComplete(joined: DataFrame): DataFrame =
    joined.agg(
      countDistinct(col("o.order_id")).as("total_orders"),
      sum(col("oi.sale_price").cast(money)).cast("double").as("total_revenue"),
      count(col("oi.id")).as("total_items_sold"),
      ratio(count(when(col("oi.status") === "returned", true)).cast("double"),
        count(col("oi.id"))).as("return_rate"),
      countDistinct(col("o.user_id")).as("unique_customers"))

  /** A3: order_items_only mode — orders-table KPIs are typed nulls
    * (reference `scripts/transformation.py:225-231`). NB the reference
    * computes this over the items⋈products INNER join (`:212-213`), so items
    * whose product_id has no product match are excluded — pass
    * [[itemsProductsJoin]] output here (already carrying the `oi` alias),
    * not raw items. */
  def orderKpiItemsOnly(items: DataFrame): DataFrame =
    items.agg(
      lit(null).cast("long").as("total_orders"),
      sum(col("oi.sale_price").cast(money)).cast("double").as("total_revenue"),
      count(col("oi.id")).as("total_items_sold"),
      ratio(count(when(col("oi.status") === "returned", true)).cast("double"),
        count(col("oi.id"))).as("return_rate"),
      lit(null).cast("long").as("unique_customers"))

  /** A4: orders_only mode (reference `scripts/transformation.py:238-244`). */
  def orderKpiOrdersOnly(orders: DataFrame): DataFrame =
    orders.as("o").agg(
      countDistinct(col("o.order_id")).as("total_orders"),
      lit(null).cast("double").as("total_revenue"),
      lit(null).cast("long").as("total_items_sold"),
      lit(null).cast("double").as("return_rate"),
      countDistinct(col("o.user_id")).as("unique_customers"))

  /** Availability dispatch (reference `scripts/transformation.py:163-248`):
    * run whichever KPI families the present tables allow, computing both
    * families of the complete mode from ONE persisted join. Returns
    * (categoryKpi?, orderKpi?).
    *
    * Products is MANDATORY: the reference raises "Products Delta table is
    * required" before any availability branch (`transformation.py:163-166`),
    * even in orders-only mode — missing products fails loud, never silently
    * skips. In order_items_only mode both KPI families run over the
    * items⋈products inner join (`transformation.py:211-233`).
    */
  def computeKpis(orders: Option[DataFrame], items: Option[DataFrame],
      products: Option[DataFrame]): (Option[DataFrame], Option[DataFrame]) = {
    val p = products.getOrElse(throw new IllegalArgumentException(
      "Products table is required for KPI computation"))
    (orders, items) match {
      case (Some(o), Some(i)) =>
        val joined = threeWayJoin(o, i, p).persist()
        // outputs are SMALL (category-grain + one global row):
        // materialize them off the shared cached join, then release the
        // fact-scale cache — without this every processing date pinned
        // its full joined frame for the life of the session.
        // Cluster caveat: localCheckpoint truncates lineage and the
        // blocks live only on executors, so losing an executor AFTER this
        // point makes the frames unrecoverable (no recompute path), and
        // the checkpoint jobs run eagerly inside what reads as a
        // plan-building function. Acceptable for this driver-tool
        // deployment; a multi-tenant cluster service would collect these
        // bounded results to driver-local literals instead
        try (Some(categoryKpi(joined).localCheckpoint(true)),
          Some(orderKpiComplete(joined).localCheckpoint(true)))
        finally { joined.unpersist(); () }
      case (None, Some(i)) =>
        val joined = itemsProductsJoin(i, p).persist()
        try (Some(categoryKpi(joined).localCheckpoint(true)),
          Some(orderKpiItemsOnly(joined).localCheckpoint(true)))
        finally { joined.unpersist(); () }
      case (Some(o), None) =>
        (None, Some(orderKpiOrdersOnly(o)))
      case (None, None) => (None, None)
    }
  }
}
