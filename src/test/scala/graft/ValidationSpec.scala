package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.validate.Validation

/** Validation-stage semantics (reference validation.py:83-118): fused
  * single-pass null check ≡ per-column jobs, anti-join RI ≡ collect+isin,
  * header set-difference, typed error precedence. */
class ValidationSpec extends SparkSpec {

  private def mk(schema: StructType, rows: Row*): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  private val itemsS = StructType(Seq(
    StructField("id", LongType), StructField("order_id", LongType),
    StructField("sale_price", DoubleType), StructField("note", StringType)))

  private val items = mk(itemsS,
    Row(1L, 10L, 5.0, "x"),
    Row(2L, null, Double.NaN, "7.5"),
    Row(3L, 11L, null, null),
    Row(4L, 12L, 8.0, "nan"))

  test("fused null check matches the per-column formulation") {
    val cols = Seq("id", "order_id", "sale_price", "note")
    val fused = Validation.nullCheck(items, cols).head()
    val perCol = Validation.nullCheckPerColumn(items, cols)
    cols.zipWithIndex.foreach { case (c, i) =>
      assert(fused.getLong(i) === perCol(c), s"column $c")
    }
    assert(perCol("id") === 0)
    assert(perCol("order_id") === 1)
    assert(perCol("sale_price") === 2) // NULL + NaN both count
    // string column: isnan(try_cast) — 'x' casts to NULL (not NaN), 'nan'
    // casts to NaN and counts, matching PySpark's implicit-cast behavior
    assert(perCol("note") === 2)
  }

  test("RI violations = distinct child keys with no parent (anti-join)") {
    val parents = mk(
      StructType(Seq(StructField("order_id", LongType))),
      Row(10L), Row(11L))
    val viol = Validation.riViolations(items, "order_id", parents, "order_id")
      .collect().map(_.getLong(0)).toSet
    assert(viol === Set(12L)) // null child key joins nothing → not a violation row w/ null? 12 dangles
  }

  test("validate returns NullValidationError before ReferentialError") {
    val orders = mk(
      StructType(Seq(StructField("order_id", LongType))), Row(10L))
    val err = Validation.validate(orders, items, None,
      Map("order_items" -> Seq("order_id")))
    assert(err.exists(_.errorType === "NULL_VALIDATION_ERROR"))
  }

  test("validate flags referential errors when nulls pass") {
    val orders = mk(
      StructType(Seq(StructField("order_id", LongType))), Row(10L), Row(11L))
    val err = Validation.validate(orders, items, None,
      Map("order_items" -> Seq("id")))
    assert(err.exists(_.errorType === "REFERENTIAL_ERROR"))
  }

  test("validate passes clean data") {
    val orders = mk(
      StructType(Seq(StructField("order_id", LongType))),
      Row(10L), Row(11L), Row(12L))
    val clean = items.filter("order_id IS NOT NULL")
    assert(Validation.validate(orders, clean, None,
      Map("order_items" -> Seq("id"))).isEmpty)
  }

  test("missingHeaders is required-minus-present") {
    assert(Validation.missingHeaders(
      Set("a", "b", "c"), Seq("a", "c", "d")) === Set("b"))
  }
}
