package graft

import org.apache.spark.sql.functions._

import graft.io.{RefShape, Sources}
import graft.operators.SkewJoin

/** Salted join ≡ plain join on real data, including a synthetically skewed
  * key distribution. */
class SkewJoinSpec extends SparkSpec {

  test("salted inner join equals the plain join on lineitem ⋈ part") {
    val items = RefShape.orderItems(spark, sf0001)
    val products = RefShape.products(spark, sf0001)
      .withColumnRenamed("id", "product_id")
    val plain = items.join(products, Seq("product_id"), "inner")
    val salted = SkewJoin.saltedInner(items, products, "product_id",
      factor = 8, saltCols = Seq("id"))
    assert(salted.count() === plain.count())
    // exact multiset equality on the join output
    val cols = plain.columns.sorted.map(col).toSeq
    assert(salted.select(cols: _*).exceptAll(plain.select(cols: _*)).isEmpty)
    assert(plain.select(cols: _*).exceptAll(salted.select(cols: _*)).isEmpty)
  }

  test("salting bounds sub-partition sizes on a skewed events slice") {
    // Skewed fixture from real testdata: ~90% of events collapse onto one
    // hot key — the shape AQE only fixes when it shows up as oversized
    // shuffle partitions; here we assert the salt itself restores balance.
    val factor = 16
    val ev = Sources.table(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"))
      .withColumn("k",
        when(pmod(col("event_id"), lit(10)) < 9, lit(1L))
          .otherwise(col("user_id") + lit(1000000L)))
    val dim = ev.select(col("k")).distinct()
      .withColumn("name", concat(lit("key_"), col("k")))
    val plain = ev.join(dim, Seq("k"), "inner")
    val salted = SkewJoin.saltedInner(ev, dim, "k", factor,
      saltCols = Seq("event_id"))
    assert(salted.count() === plain.count())

    // sub-partition evidence: the hot key's rows spread across all salt
    // buckets, and no bucket exceeds 2× the ideal share — i.e. the single
    // reducer that would have received the whole hot key now receives
    // ~1/factor of it
    val hot = ev.filter(col("k") === 1L).count()
    val sub = ev.filter(col("k") === 1L)
      .withColumn("__salt", pmod(hash(col("event_id")), lit(factor)))
      .groupBy(col("__salt")).count()
    assert(sub.count() === factor.toLong, "every salt bucket populated")
    val maxSub = sub.agg(max(col("count"))).head().getLong(0)
    assert(maxSub <= 2L * hot / factor,
      s"hot-key sub-partitions unbalanced: max $maxSub of $hot total")
    // and the salted plan's join key really is (k, __salt)
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), p.take(1500))
  }

  test("salted join handles a hot key (90% of rows on one key)") {
    import spark.implicits._
    val left = (1L to 1000L).map(i =>
      (if (i <= 900) 1L else i, i)).toDF("k", "row_id")
    val right = Seq((1L, "hot"), (950L, "cold")).toDF("k", "name")
    val plain = left.join(right, Seq("k"), "inner")
    val salted = SkewJoin.saltedInner(left, right, "k", factor = 16,
      saltCols = Seq("row_id"))
    assert(salted.count() === plain.count())
    assert(salted.count() === 901L)
    // the salt actually spreads the hot key across buckets
    val spread = left.withColumn("__salt",
      pmod(hash(col("row_id")), lit(16)))
      .filter(col("k") === 1L)
      .select(countDistinct(col("__salt"))).head().getLong(0)
    assert(spread > 8, s"hot key should spread over many salt buckets, got $spread")
  }
}
