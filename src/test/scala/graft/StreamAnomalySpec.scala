package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.streaming.{AnomalyMonitor, BatchStore}

/** E126 streaming anomaly monitor: micro-batched state merges to the
  * one-shot batch stats bit-exactly, flags score against strictly-prior
  * state only, replayed batch ids are idempotent, and the streaming
  * entry drives the same body end to end. */
class StreamAnomalySpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Double)*) =
    rows.toDF("event_id", "event_type", "value")

  test("micro-batched stats merge to the one-shot batch stats exactly") {
    val store = Files.createTempDirectory("graft-anom-store").toString
    val alerts = Files.createTempDirectory("graft-anom-alerts").toString
    val events = Sources.table(spark, sf0001, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    // three disjoint micro-batches of the same events
    for ((m, id) <- Seq(0, 1, 2).zipWithIndex)
      AnomalyMonitor.processBatch(
        events.filter(pmod(col("event_id"), lit(3)) === m), id.toLong,
        store, alerts)
    val merged = AnomalyMonitor.mergedStats(
        BatchStore.read(spark, store).get)
      .orderBy("event_type").collect()
    val oneShot = AnomalyMonitor.statsOf(events)
      .orderBy("event_type").collect()
    assert(merged.toSeq === oneShot.toSeq,
      "long folds are associative: any batching lands on identical state")
  }

  test("flags score against strictly-prior state; replay is idempotent") {
    val store = Files.createTempDirectory("graft-anom-store2").toString
    val alerts = Files.createTempDirectory("graft-anom-alerts2").toString
    // batch 0: 40 calm observations (> MinHistory) of key 'm' with real
    // variance, calm enough that 100.0 is a wild outlier
    val calm = ev((1L to 40L).map(i =>
      (i, "m", 10.0 + (i % 5).toDouble)): _*)
    AnomalyMonitor.processBatch(calm, 0L, store, alerts)
    // batch 0 had no prior state: nothing may have flagged
    assert(spark.read.parquet(s"$alerts/batch=0").count() === 0L,
      "the first batch has no baseline and must not flag")
    // batch 1: one wild outlier + one calm value
    val b1 = ev((100L, "m", 100.0), (101L, "m", 11.0))
    AnomalyMonitor.processBatch(b1, 1L, store, alerts)
    val flagged = spark.read.parquet(s"$alerts/batch=1")
      .select("event_id").as[Long].collect().toSet
    assert(flagged === Set(100L), "only the outlier flags")
    // replay batch 1: alerts and store state unchanged, not doubled
    AnomalyMonitor.processBatch(b1, 1L, store, alerts)
    assert(spark.read.parquet(s"$alerts/batch=1")
      .select("event_id").as[Long].collect().toSet === Set(100L))
    val n = AnomalyMonitor.mergedStats(BatchStore.read(spark, store).get)
      .filter(col("event_type") === "m")
      .select("n").as[Long].head()
    assert(n === 42L, "replay must not double-count the increment")
  }

  test("insufficient history or zero variance never flags") {
    val store = Files.createTempDirectory("graft-anom-store3").toString
    val alerts = Files.createTempDirectory("graft-anom-alerts3").toString
    // 10 observations: below MinHistory
    AnomalyMonitor.processBatch(
      ev((1L to 10L).map(i => (i, "few", i.toDouble)): _*), 0L,
      store, alerts)
    // 40 CONSTANT observations: enough history, zero variance
    AnomalyMonitor.processBatch(
      ev((11L to 50L).map(i => (i, "const", 7.0)): _*), 1L, store, alerts)
    AnomalyMonitor.processBatch(
      ev((60L, "few", 1e6), (61L, "const", 1e6)), 2L, store, alerts)
    assert(spark.read.parquet(s"$alerts/batch=2").count() === 0L,
      "below-MinHistory and zero-variance keys must emit NULL z, not flags")
  }

  test("streaming entry drives the same per-batch body end to end") {
    val in = Files.createTempDirectory("graft-anom-in").toString
    val store = Files.createTempDirectory("graft-anom-store4").toString
    val alerts = Files.createTempDirectory("graft-anom-alerts4").toString
    val ckpt = Files.createTempDirectory("graft-anom-ckpt").toString
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, event_type STRING, value DOUBLE")
    ev((1L to 40L).map(i => (i, "m", 10.0 + (i % 5).toDouble)): _*)
      .coalesce(1).write.parquet(s"$in/f1")
    val q = AnomalyMonitor.start(
      spark.readStream.schema(schema).parquet(s"$in/*"),
      store, alerts, ckpt)
    try q.processAllAvailable() finally q.stop()
    // restart continues batch numbering; the outlier now meets history
    ev((100L, "m", 100.0)).coalesce(1).write.parquet(s"$in/f2")
    val q2 = AnomalyMonitor.start(
      spark.readStream.schema(schema).parquet(s"$in/*"),
      store, alerts, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val flagged = spark.read.parquet(s"$alerts/batch=*")
      .select("event_id").as[Long].collect().toSet
    assert(flagged === Set(100L))
    val n = AnomalyMonitor.mergedStats(BatchStore.read(spark, store).get)
      .select(sum(col("n"))).as[Long].head()
    assert(n === 41L)
  }
}
