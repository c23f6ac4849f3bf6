package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.merge.{KpiMerge, KpiSink}

/** S7/S8 foreachPartition sink ≡ plan-level merge: the same updates against
  * the same target state produce identical items either way. */
class KpiSinkSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("order_date", StringType),
    StructField("total_orders", LongType),
    StructField("total_revenue", DoubleType),
    StructField("data_sources", ArrayType(StringType))))

  private def df(rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  test("partition-wise KV upsert matches KpiMerge coalesce semantics") {
    val target = df(
      Row("d1", 10L, 100.0, Seq("order_items")),
      Row("d2", 5L, 50.0, Seq("orders")))
    val updates = df(
      Row("d1", 12L, null, Seq("orders")), // orders_only: preserves revenue
      Row("d3", 1L, 9.0, Seq("orders")),   // brand-new key
      Row("d4", 2L, null, Seq("orders")))  // new key with a NULL field:
                                           // merged value stays null

    // plan-level merge
    val planned = KpiMerge.merge(target, updates, Seq("order_date"),
      Seq("total_orders", "total_revenue"), Some("data_sources"))
      .collect()
      .map(r => Seq(r.getString(0)) -> Map(
        "total_orders" -> Option(r.get(1)).orNull,
        "total_revenue" -> Option(r.get(2)).orNull,
        "data_sources" -> r.getSeq[String](3).sorted))
      .toMap

    // foreachPartition sink: seed the store with the target, then upsert
    KpiSink.InMemory.clear("order_kpi")
    KpiSink.upsert(target, Seq("order_date"),
      Seq("total_orders", "total_revenue"), "data_sources",
      KpiSink.InMemory.Factory("order_kpi"))
    KpiSink.upsert(updates, Seq("order_date"),
      Seq("total_orders", "total_revenue"), "data_sources",
      KpiSink.InMemory.Factory("order_kpi"))
    val sunk = KpiSink.InMemory.snapshot("order_kpi")

    assert(sunk.keySet === planned.keySet)
    sunk.foreach { case (k, item) =>
      val p = planned(k)
      assert(item.get("total_orders").orNull === p("total_orders"), k)
      assert(item.get("total_revenue").orNull === p("total_revenue"), k)
      assert(item("data_sources") === p("data_sources"), k)
    }
    // null fields are DROPPED in the sink item, not stored as null: d4's
    // merged total_revenue is null on both sides of the equivalence
    // (coalesce(null, absent)), so the KV item must simply OMIT the key
    // (helperfunction.py:38-40's remove_null_values)
    assert(planned(Seq("d4"))("total_revenue") == null,
      "fixture must produce a null merged field")
    assert(!sunk(Seq("d4")).contains("total_revenue"),
      s"null field stored instead of dropped: ${sunk(Seq("d4"))}")
  }

  test("sink upsert is idempotent under row-level retry") {
    KpiSink.InMemory.clear("retry_kpi")
    val updates = df(Row("d9", 7L, 70.0, Seq("orders")))
    KpiSink.upsert(updates, Seq("order_date"),
      Seq("total_orders", "total_revenue"), "data_sources",
      KpiSink.InMemory.Factory("retry_kpi"))
    val once = KpiSink.InMemory.snapshot("retry_kpi")
    KpiSink.upsert(updates, Seq("order_date"),
      Seq("total_orders", "total_revenue"), "data_sources",
      KpiSink.InMemory.Factory("retry_kpi"))
    assert(KpiSink.InMemory.snapshot("retry_kpi") === once)
  }
}
