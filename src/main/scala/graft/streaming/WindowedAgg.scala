package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation — the idiomatic Structured Streaming
  * shape (`readStream → withWatermark → groupBy(window) → agg`) the
  * reference's debounce layer would become if moved from processing-time
  * Lambdas to event-time streams (SURVEY §2.9 T5: the watermark is the
  * idiomatic guard for late data).
  *
  * The same function body serves batch and streaming DataFrames — the
  * watermark is a no-op in batch, so batch output IS the streaming
  * query's complete result (tested for parity in StreamingAggSpec).
  */
object WindowedAgg {

  /** Tumbling event-time counts/sums per (window, event_type).
    * `events` needs `ts` (epoch-nanos long, per the testdata convention),
    * `event_type`, `value`. */
  def eventTypeWindows(events: DataFrame, windowLen: String,
      watermark: String): DataFrame =
    events
      .withColumn("event_ts", expr("ts DIV 1000000000").cast("timestamp"))
      .withWatermark("event_ts", watermark)
      .groupBy(window(col("event_ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))
}
