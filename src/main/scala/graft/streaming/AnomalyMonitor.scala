package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** E126: STREAMING anomaly monitor — x11's trailing-window semantic
  * driven by Structured Streaming foreachBatch: a per-key statistics
  * store (count / sum / sum-of-squares in EXACT INTEGER CENTS — the x11
  * discipline: long folds are associative and split-invariant, so any
  * micro-batching of the same events merges to identical state) is
  * maintained incrementally, and each batch's events are z-scored
  * against the state accumulated STRICTLY BEFORE the batch — the event
  * under test never contaminates its own baseline (x11's current-row
  * exclusion, batch-grained), and a replayed batch id can never meet its
  * own first attempt's increment (the E114 replay discipline).
  *
  * Exactly-once via the shared [[BatchStore]] protocol: per-batch
  * overwrite + marker-last commit for BOTH the stats increment and the
  * alert output; the store view for batch N reads batches < N.
  *
  * Scale: the store is |keys| rows per batch and merges by three long
  * sums (the t11/v2 mergeable-state convention) — state never grows with
  * event volume, only with keys × batches, and a compaction pass (the
  * E27 shape) folds old increments without changing any answer. Flagging
  * is one broadcast-ready join of the batch against |keys| rows. */
object AnomalyMonitor {

  /** Observations a key needs before its z-scores are trusted. */
  val MinHistory = 30L

  /** Flag threshold: |z| above this is an anomaly. */
  val ZThreshold = 3.0

  /** Per-key exact integer stats of a frame — the store increment.
    * The ×100 quantization is row-wise on the double value (truncating
    * cast), so a non-2dp-representable double may land one cent off its
    * decimal reading — what matters is that the mapping is row-
    * deterministic and the folded state is exact integers, which makes
    * merging batching-invariant. */
  def statsOf(events: DataFrame): DataFrame =
    events.select(col("event_type"),
        (col("value") * lit(100.0)).cast("long").as("cents"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_c"),
        sum(col("cents") * col("cents")).as("sumsq_c"))

  /** Fold committed increments to current per-key state — three long
    * sums, associative, so any batch split of the same events lands on
    * identical state. */
  def mergedStats(increments: DataFrame): DataFrame =
    increments.groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("sum_c")).as("sum_c"),
        sum(col("sumsq_c")).as("sumsq_c"))

  /** z-score `events` against per-key `stats`; keys with insufficient
    * history (or zero variance) emit NULL z and never flag. */
  def flag(events: DataFrame, stats: DataFrame): DataFrame = {
    val nD = col("n").cast("double")
    val mean = col("sum_c").cast("double") / nD
    val varE = (col("sumsq_c").cast("double") -
      col("sum_c").cast("double") * col("sum_c").cast("double") / nD) /
      (nD - lit(1.0))
    val ready = stats.filter(col("n") >= MinHistory)
      .select(col("event_type"), mean.as("mean_c"), sqrt(varE).as("sd_c"))
    events.select(col("event_id"), col("event_type"), col("value"),
        (col("value") * lit(100.0)).cast("long").as("cents"))
      .join(ready, Seq("event_type"), "left")
      .withColumn("z", when(col("sd_c") > 0.0,
        (col("cents").cast("double") - col("mean_c")) / col("sd_c")))
      .select(col("event_id"), col("event_type"), col("value"), col("z"),
        (col("z").isNotNull && abs(col("z")) > ZThreshold)
          .as("is_anomaly"))
  }

  /** One micro-batch: flag against the PRIOR state, then commit this
    * batch's stats increment and its alerts, both per-batch idempotent.
    * Public so batch callers (and the spec's replay check) can drive it
    * without a streaming query. */
  def processBatch(batch: DataFrame, batchId: Long, storeDir: String,
      alertDir: String): Unit = {
    val spark = batch.sparkSession
    val stats = BatchStore.read(spark, storeDir, beforeBatch = Some(batchId))
      .map(mergedStats)
      .getOrElse(statsOf(batch).limit(0)) // no history yet: nothing flags
    val alerts = flag(batch, stats).filter(col("is_anomaly"))
    BatchStore.writeBatch(alerts, alertDir, batchId)
    BatchStore.writeBatch(statsOf(batch), storeDir, batchId)
  }

  /** Streaming entry: drive [[processBatch]] from an event stream.
    * `checkpointDir` is REQUIRED — without a durable checkpoint a
    * restarted query renumbers batches from 0 and the per-batch-id
    * idempotence contract breaks. */
  def start(events: DataFrame, storeDir: String, alertDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(100L)): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(b, id, storeDir, alertDir)
      }
      .trigger(trigger)
      .start()
}
