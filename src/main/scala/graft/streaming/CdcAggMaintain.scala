package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.ChangeFeed

/** E175 (streaming form of cdc2): INCREMENTAL AGGREGATE MAINTENANCE via
  * foreachBatch — [[ChangeFeed.maintainAgg]] driven micro-batch by
  * micro-batch, closing the continuous CDC loop the family documents:
  * cdc1 ([[CdcApply]]) consumes the feed into the DIMENSION, this
  * consumes it into the KPI — the table itself is never re-read, each
  * refresh costs O(churn of the micro-batch).
  *
  * State model: like [[CdcApply]], the aggregate is a FULL state (a
  * group-grain snapshot — small by construction), not an increment:
  * each batch writes the complete post-maintenance aggregate to
  * `aggDir/batch=<id>` under the [[BatchStore]] committed-snapshot
  * protocol and readers take the LATEST committed snapshot. Exactly-once
  * falls out identically: batch N maintains on the latest snapshot
  * STRICTLY before N, so a replayed id re-applies onto its
  * predecessor's state and overwrites its own partial — never its own
  * first attempt — and the `_graft_committed` marker lands only after
  * the parquet does (crash-partial snapshots are invisible; the
  * marker/naming protocol is [[BatchStore.committedIds]], the ONE
  * listing all three snapshot readers share).
  *
  * Micro-batch semantics — when does chunked maintenance equal the
  * one-shot refresh? The signed fold commutes, so two chunkings are
  * exact by construction:
  *  - SNAPSHOT-CONSISTENT chunks (the CDF-source contract: micro-batch
  *    i is diff(S_i, S_{i+1}) down a monotone snapshot chain) — every
  *    intermediate state is the genuine aggregate of a real snapshot,
  *    so counts never go negative and the drop-empty-groups rule
  *    commutes with chunking (spec-pinned: a two-refresh chain lands on
  *    the direct aggregate of the final snapshot, bit for bit);
  *  - per-KEY-disjoint splits of one diff (the cdc1 contract: a key's
  *    change records arrive whole) — the intermediate state is the
  *    aggregate of the hybrid snapshot with split keys at B and the
  *    rest at A, equally legal (spec-pinned).
  *  What does NOT commute is splitting so a key's delete lands before
  *  its insert (a chunking no snapshot chain produces): the maintained
  *  count would pass through −1, which the empty-group drop clamps.
  *
  * The decimal discipline is maintainAgg's (review-hardened): the
  * snapshot carries `sum_total` as DECIMAL(18,2) end to end — the
  * parquet round-trip preserves the type, so every batch maintains on
  * exact state and replay order cannot fork the sums.
  *
  * Snapshot-per-batch is the exhibit's state protocol, not a 100-TB
  * claim (the CdcApply caveat, shared): at scale the aggregate lives in
  * a MERGE-capable table and the loop becomes `foreachBatch { MERGE }`;
  * the signed-fold maintenance logic is the part that carries — and at
  * group grain the snapshot is small whatever the corpus size. */
object CdcAggMaintain {

  /** One micro-batch: latest committed aggregate (or `base0` when none)
    * + this batch's feed rows → next committed aggregate snapshot. */
  def processBatch(feedBatch: DataFrame, batchId: Long, aggDir: String,
      base0: DataFrame, key: String, measure: String): Unit = {
    val spark = feedBatch.sparkSession
    val base = CdcApply
      .readLatest(spark, aggDir, beforeBatch = Some(batchId))
      .getOrElse(base0)
    BatchStore.writeBatch(
      ChangeFeed.maintainAgg(base, feedBatch, key, measure),
      aggDir, batchId)
  }

  /** Streaming entry: drive [[processBatch]] from a CDF row stream.
    * `checkpointDir` is REQUIRED — the per-batch-id replay contract
    * only holds when the engine reuses batch ids across restarts. */
  def start(feed: DataFrame, aggDir: String, base0: DataFrame,
      key: String, measure: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(100L)): StreamingQuery =
    feed.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(b, id, aggDir, base0, key, measure)
      }
      .trigger(trigger)
      .start()
}
