package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.Dedup

/** E114: streaming NEAR-dup dedup — the d15 incremental operator driven
  * by Structured Streaming: each micro-batch is deduplicated first
  * WITHIN itself (d3's banded pairs, keep the lowest id), then against
  * the accumulated signature store (d15 — the store contributes stored
  * signatures only, never re-reads text), and the survivors' signatures
  * become the store's next increment.
  *
  * Exactly-once contract WITHOUT a state store: both writes (survivor
  * docs and signature increment) land in per-`batchId` directories with
  * `overwrite` mode — Structured Streaming replays a failed batch under
  * the SAME id, so a crashed/retried batch overwrites its own partial
  * output instead of duplicating it (the same idempotence rationale as
  * the epoch-manifest store's per-partition swap). The signature store
  * is thus append-only at batch grain and a restart reconstructs it by
  * reading every committed `batch=*` directory.
  *
  * Scale: per-batch cost is the batch's own signature pass plus a band
  * join against store signatures (NumHashes longs per stored doc).
  * Unlike the exact E53 path (bounded watermark state inside the
  * streaming engine), near-dup state must span the whole corpus — which
  * is exactly why it lives in a parquet store the cluster can partition,
  * not in executor state-store memory. */
object StreamNearDedup {

  /** One micro-batch: within-batch dedup → store check → idempotent
    * per-batch writes. Public so batch callers (and the spec's replay
    * check) can drive it without a streaming query. */
  def processBatch(batch: DataFrame, batchId: Long, storeDir: String,
      outDir: String): Unit = {
    val docs = batch.select(col("doc_id"), col("text"))
    // within-batch: a doc near-duplicating a LOWER-id batch doc loses
    val losers = Dedup.minhashLshPairs(docs)
      .select(col("doc_b").as("doc_id")).distinct()
    val inBatch = docs.join(losers, Seq("doc_id"), "left_anti")
    // vs the accumulated store — STRICTLY batches before this one: a
    // replayed batch id would otherwise meet its own first attempt's
    // increment in the store and drop every one of its docs as a
    // "duplicate" of itself (and increments from batches ≥ this id can
    // only exist as crashed partials, never as committed history)
    val survivors = readStore(batch.sparkSession, storeDir,
        beforeBatch = Some(batchId)) match {
      case Some(store) =>
        val dups = Dedup.incrementalLshDedup(inBatch, store)
          .select(col("doc_id"))
        inBatch.join(dups, Seq("doc_id"), "left_anti")
      case None => inBatch
    }
    survivors.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    Dedup.minhashSigStore(survivors).write.mode("overwrite")
      .parquet(s"$storeDir/batch=$batchId")
  }

  /** The committed signature store: every batch increment (optionally
    * only those strictly before `beforeBatch` — the replay-safe view),
    * or None when empty. */
  def readStore(spark: SparkSession, storeDir: String,
      beforeBatch: Option[Long] = None): Option[DataFrame] = {
    val p = new HPath(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val dirs = fs.listStatus(p).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .filter(n => beforeBatch.forall(b =>
        n.stripPrefix("batch=").toLong < b))
      .map(n => s"$storeDir/$n")
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs.toIndexedSeq: _*))
  }

  /** Streaming entry: drive [[processBatch]] from a doc stream. */
  def start(docs: DataFrame, storeDir: String, outDir: String,
      trigger: Trigger = Trigger.ProcessingTime(100L)): StreamingQuery =
    docs.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(b, id, storeDir, outDir)
      }
      .trigger(trigger)
      .start()
}
