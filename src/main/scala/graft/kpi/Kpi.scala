package graft.kpi

import org.apache.spark.sql.DataFrame
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
  * reproducible across any partitioning/AQE replan — and derive the averages
  * from the exact decimal sum with one final double division (deterministic
  * IEEE op). At 100 TB reproducibility of money aggregates is a correctness
  * property, not a style choice.
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

  /** A1/A5: per-category KPIs over a joined frame carrying `p.category`,
    * `oi.sale_price`, `oi.status`, `oi.id`
    * (reference `scripts/transformation.py:187-191`). */
  def categoryKpi(joined: DataFrame): DataFrame =
    joined.groupBy(col("p.category").as("category")).agg(
      sum(col("oi.sale_price").cast(money)).cast(money).as("daily_revenue"),
      (sum(col("oi.sale_price").cast(money)).cast("double") /
        count(col("oi.id"))).as("avg_order_value"),
      (count(when(col("oi.status") === "returned", true)).cast("double") /
        count(col("oi.id"))).as("avg_return_rate"))

  /** A2: global order KPIs, complete mode
    * (reference `scripts/transformation.py:197-203`). */
  def orderKpiComplete(joined: DataFrame): DataFrame =
    joined.agg(
      countDistinct(col("o.order_id")).as("total_orders"),
      sum(col("oi.sale_price").cast(money)).cast(money).as("total_revenue"),
      count(col("oi.id")).as("total_items_sold"),
      (count(when(col("oi.status") === "returned", true)).cast("double") /
        count(col("oi.id"))).as("return_rate"),
      countDistinct(col("o.user_id")).as("unique_customers"))

  /** A3: order_items_only mode — orders-table KPIs are typed nulls
    * (reference `scripts/transformation.py:225-231`). */
  def orderKpiItemsOnly(items: DataFrame): DataFrame =
    items.as("oi").agg(
      lit(null).cast("long").as("total_orders"),
      sum(col("oi.sale_price").cast(money)).cast(money).as("total_revenue"),
      count(col("oi.id")).as("total_items_sold"),
      (count(when(col("oi.status") === "returned", true)).cast("double") /
        count(col("oi.id"))).as("return_rate"),
      lit(null).cast("long").as("unique_customers"))

  /** A4: orders_only mode (reference `scripts/transformation.py:238-244`). */
  def orderKpiOrdersOnly(orders: DataFrame): DataFrame =
    orders.as("o").agg(
      countDistinct(col("o.order_id")).as("total_orders"),
      lit(null).cast(money).as("total_revenue"),
      lit(null).cast("long").as("total_items_sold"),
      lit(null).cast("double").as("return_rate"),
      countDistinct(col("o.user_id")).as("unique_customers"))

  /** Availability dispatch (reference `scripts/transformation.py:163-248`):
    * run whichever KPI families the present tables allow, computing both
    * families of the complete mode from ONE persisted join. Returns
    * (categoryKpi?, orderKpi?).
    */
  def computeKpis(orders: Option[DataFrame], items: Option[DataFrame],
      products: Option[DataFrame]): (Option[DataFrame], Option[DataFrame]) =
    (orders, items, products) match {
      case (Some(o), Some(i), Some(p)) =>
        val joined = threeWayJoin(o, i, p).persist()
        (Some(categoryKpi(joined)), Some(orderKpiComplete(joined)))
      case (None, Some(i), Some(p)) =>
        (Some(categoryKpi(itemsProductsJoin(i, p))), Some(orderKpiItemsOnly(i)))
      case (None, Some(i), None) =>
        (None, Some(orderKpiItemsOnly(i)))
      case (Some(o), None, _) =>
        (None, Some(orderKpiOrdersOnly(o)))
      case _ => (None, None)
    }
}
