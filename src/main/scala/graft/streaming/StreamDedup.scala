package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** E53: streaming exact dedup — the streaming twin of D8's incremental
  * dedup ([[graft.dedup.Dedup.incrementalDedup]]): documents arrive as a
  * stream and duplicates (same content fingerprint) are dropped as they
  * arrive.
  *
  * The load-bearing choice is `dropDuplicatesWithinWatermark`, not plain
  * `dropDuplicates`: on a stream the latter keeps every fingerprint ever
  * seen — state O(stream history), the classic unbounded-state trap —
  * while the watermark variant evicts a fingerprint once the watermark
  * passes its event time + delay, bounding state to the dedup horizon.
  * That is the honest semantics of a streaming dedup anyway: exact within
  * the horizon, best-effort beyond it (a re-crawl months later is a new
  * observation — the BATCH path d8 with its accumulated fingerprint store
  * is the cross-horizon tier; the two compose, same as reference-style
  * lambda architectures).
  *
  * Unlike the windowed-agg bodies, `dropDuplicatesWithinWatermark` is
  * STREAMING-ONLY (Spark rejects it on batch frames), so the batch twin
  * is explicit: [[dedupDocBatch]] is the same fingerprint dedup without a
  * horizon — what a backfill over already-landed files runs.
  * StreamDedupSpec asserts the pairing plus the two horizon behaviors
  * (drop within, re-admit beyond). Input shape follows the testdata
  * convention: `doc_id`, `text`, `ts` (epoch-nanos long).
  */
object StreamDedup {

  private def withFp(docs: DataFrame): DataFrame =
    docs.withColumn("fp", docFp(col("text")))

  def dedupDocStream(docs: DataFrame, watermark: String): DataFrame =
    withFp(docs
        .withColumn("event_ts",
          timestamp_seconds(graft.io.Sources.epochSec(docs)))
        .withWatermark("event_ts", watermark))
      .dropDuplicatesWithinWatermark("fp")
      .select(col("doc_id"), col("fp"), col("text"))

  /** Batch twin: horizonless per-fingerprint dedup (the backfill path). */
  def dedupDocBatch(docs: DataFrame): DataFrame =
    withFp(docs).dropDuplicates("fp")
      .select(col("doc_id"), col("fp"), col("text"))
}
