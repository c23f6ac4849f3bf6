package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** E157: streaming WINDOWED TOP-K — the streaming twin e6's scaladoc
  * promises ("window semantics identical to a readStream + window() +
  * rank sink"): per 1-day tumbling window, the [[TopK]] hottest
  * `props.k` keys by event count, maintained continuously as events
  * stream in.
  *
  * Why foreachBatch and not a single streaming rank query: a rank over
  * a streaming aggregation is two stateful operators with a sort
  * between them — outside Structured Streaming's supported append/update
  * shapes. The standard production form is exactly this split:
  *  - the STREAM maintains the additive state — per-batch
  *    (day, key, count) increments under the [[BatchStore]] protocol
  *    (per-batchId overwrite + marker-last commit, so a replayed batch
  *    id re-commits idempotently and a crashed partial is invisible);
  *  - the SERVE side ([[snapshot]]) folds the committed increments
  *    (counts are mergeable — a sum of per-batch counts IS the global
  *    count, exactly) and ranks top-k per day — byte-identical columns
  *    and semantics to the batch query e6, which StreamTopKSpec pins
  *    (memory-sink parity + restart continuation, the E16/E101
  *    convention).
  *
  * Scale: the streamed state is (day × active-key)-grain, never
  * event-grain — each increment is one map-side-combined aggregate of
  * the micro-batch; the snapshot reads the store grain (days × keys ×
  * batches), not the event history, and its rank is
  * WindowGroupLimit-bounded at k per day exactly as e6's plan pin.
  * A long-running deployment compacts the store by re-writing folded
  * counts as a single batch increment — composition of the same two
  * primitives, so not a separate operator.
  *
  * Day bucketing, key extraction, count arithmetic, and the
  * (n desc, k) tie-break are textually the SAME expressions as e6 —
  * exact integers end to end, so batch ≡ streaming is bitwise, not
  * approximate. Input follows the testdata shape: `ts` (timestamp or
  * epoch-nanos long, normalized by [[graft.io.Sources.epochUs]]),
  * `props` JSON. */
object StreamTopK {

  /** e6's k: the per-day leaderboard depth. */
  val TopK = 3

  /** One micro-batch's additive increment: exact (day_start_us, k,
    * n_events) counts — e6's aggregate body over the batch alone. */
  def batchCounts(events: DataFrame): DataFrame =
    events.select(
        timestamp_micros(graft.io.Sources.epochUs(events)).as("t"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(window(col("t"), "1 day"), col("k"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros(col("window.start")).as("day_start_us"),
        col("k"), col("n_events"))

  /** One micro-batch: aggregate → idempotent per-batch store commit. */
  def processBatch(batch: DataFrame, batchId: Long, storeDir: String): Unit =
    BatchStore.writeBatch(batchCounts(batch), storeDir, batchId)

  /** The serving view over the committed store: fold the per-batch
    * increments and rank — e6's exact output shape (day_start_us, k,
    * n_events, rank). Empty store → empty frame of that schema. */
  def snapshot(spark: SparkSession, storeDir: String,
      k: Int = TopK): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val counts = BatchStore.read(spark, storeDir) match {
      case Some(inc) => inc
        .groupBy(col("day_start_us"), col("k"))
        .agg(sum(col("n_events")).as("n_events"))
      case None => spark.range(0)
        .select(col("id").as("day_start_us"), col("id").as("k"),
          col("id").as("n_events"))
    }
    val w = W.partitionBy(col("day_start_us"))
      .orderBy(col("n_events").desc, col("k"))
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Streaming entry: drive [[processBatch]] from an event stream.
    * `checkpointDir` is REQUIRED — the per-batch-id idempotence
    * contract needs the engine to reuse batch ids across restarts,
    * which only a durable checkpoint guarantees (the StreamNearDedup
    * convention). */
  def start(events: DataFrame, storeDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(100L)): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(b, id, storeDir)
      }
      .trigger(trigger)
      .start()
}
