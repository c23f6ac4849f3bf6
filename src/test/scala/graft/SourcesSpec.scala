package graft

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.io.Sources

/** Source/sink combinators (SURVEY §2.1): parquet-or-CSV fallback, union
  * fold, multi-path scan equivalence, partitioned write + pruning, scheme
  * rewrite. */
class SourcesSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft-io").toString

  test("normalizeScheme rewrites s3:// only") {
    assert(Sources.normalizeScheme("s3://b/k.csv") === "s3a://b/k.csv")
    assert(Sources.normalizeScheme("s3a://b/k.csv") === "s3a://b/k.csv")
    assert(Sources.normalizeScheme("/local/p.parquet") === "/local/p.parquet")
  }

  test("readParquetOrCsv falls back to headered CSV with declared schema") {
    val csv = s"$tmp/orders_part1.csv"
    Files.writeString(java.nio.file.Paths.get(csv),
      "order_id,amount\n1,10.5\n2,20.0\n")
    val schema = StructType(Seq(
      StructField("order_id", LongType), StructField("amount", DoubleType)))
    val df = Sources.readParquetOrCsv(spark, csv, Some(schema))
    assert(df.schema === schema)
    assert(df.count() === 2)
  }

  test("readAndUnion folds parts; empty list is None") {
    val p = s"$sf0001/lineitem.parquet"
    assert(Sources.readAndUnion(spark, Nil).isEmpty)
    val one = Sources.readAndUnion(spark, Seq(p)).get.count()
    val two = Sources.readAndUnion(spark, Seq(p, p)).get.count()
    assert(two === 2 * one)
    // scale path: single multi-path scan sees the same rows
    assert(Sources.readMultiPath(spark, Seq(p, p)).count() === two)
  }

  test("writePartitioned lays out dt partitions that prune") {
    val out = s"$tmp/validated"
    val df = Sources.table(spark, sf0001, "region")
    Sources.writePartitioned(df, out, "2024-06-01")
    assert(Files.exists(java.nio.file.Paths.get(s"$out/dt=2024-06-01")))
    val read = spark.read.parquet(out).filter("dt = '2024-06-01'")
    assert(read.count() === df.count())
    // a non-matching dt predicate prunes to zero files -> zero rows
    assert(spark.read.parquet(out).filter("dt = '1999-01-01'").count() === 0)
  }

  test("readTable returns None on a missing path") {
    assert(Sources.readTable(spark, s"$tmp/nope.parquet").isEmpty)
    assert(Sources.readTable(spark, s"$sf0001/region.parquet").nonEmpty)
  }

  test("compact rewrites a fragmented table to few files, data intact") {
    val out = s"$tmp/fragmented"
    val df = Sources.table(spark, sf0001, "lineitem")
    df.repartition(20).write.mode("overwrite").parquet(out)
    val before = df.collect().map(_.toString).sorted
    val (nBefore, nAfter) = Sources.compact(spark, out)
    assert(nBefore === 20)
    assert(nAfter < nBefore, s"expected fewer files, got $nAfter")
    val after = spark.read.parquet(out).collect().map(_.toString).sorted
    assert(after === before, "compaction must not change the data")
  }

  test("compactPartitioned compacts per partition, preserving layout") {
    val out = s"$tmp/part_store"
    val df = Sources.table(spark, sf0001, "region")
    // two fragmented hive partitions, as batch upserts would leave them
    // (partition value lives in the dir name only, like partitionBy writes)
    df.repartition(5).write.mode("overwrite")
      .parquet(s"$out/order_date=2024-06-01")
    df.repartition(5).write.mode("overwrite")
      .parquet(s"$out/order_date=2024-06-02")
    val results = Sources.compactPartitioned(spark, out)
    assert(results.keySet ===
      Set("order_date=2024-06-01", "order_date=2024-06-02"))
    results.values.foreach { case (b, a) => assert(b === 5 && a < b) }
    // hive layout preserved: partition pruning still works
    assert(Files.exists(java.nio.file.Paths.get(s"$out/order_date=2024-06-01")))
    val read = spark.read.parquet(out)
    assert(read.filter("order_date = '2024-06-02'").count() === df.count())
  }

  test("epochUs/epochSec normalize every events.ts physical type the " +
      "driver has shipped (fixture contract)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two instants, exact to the microsecond
    val us = Seq(1718000000123456L, 1718000003999999L)
    // (a) epoch-nanos int64 — the round-1..5 fixture shape
    val nanosDf = us.map(_ * 1000L).toDF("ts")
    // (b) parquet timestamp[us] isAdjustedToUTC=false → TIMESTAMP_NTZ —
    //     the round-6+ fixture shape (what broke 9 queries)
    val ntzDir = s"$tmp/ts_ntz"
    us.toDF("us").select(timestamp_micros(col("us"))
        .cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(ntzDir)
    val ntzDf = spark.read.parquet(ntzDir)
    assert(ntzDf.schema("ts").dataType === TimestampNTZType)
    // (c) instant timestamp (isAdjustedToUTC=true)
    val tzDf = us.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    for (df <- Seq(nanosDf, ntzDf, tzDf)) {
      val gotUs = df.select(Sources.epochUs(df, "ts")).as[Long]
        .collect().sorted.toSeq
      assert(gotUs === us, s"epochUs on ${df.schema("ts").dataType}")
      val gotSec = df.select(Sources.epochSec(df, "ts")).as[Long]
        .collect().sorted.toSeq
      assert(gotSec === us.map(_ / 1000000L),
        s"epochSec on ${df.schema("ts").dataType}")
    }
    // the REAL fixture loads through the same helper — whatever physical
    // type the driver ships next, this line is the canary
    val ev = Sources.table(spark, sf0001, "events")
    assert(ev.select(Sources.epochUs(ev)).as[Long].collect()
      .forall(v => v > 1L * 1000 * 1000 * 1000 * 1000000L),
      "events.ts must normalize to plausible epoch micros")
  }
}
