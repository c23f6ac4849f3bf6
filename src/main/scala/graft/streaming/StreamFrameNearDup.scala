package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.multimodal.Multimodal

/** E185: STREAMING perceptual frame near-dup — the mm3x operator's
  * incremental rung, closing the multimodal ladder the way E114 closes
  * the lexical one: a continuous media-ingest stream (doc_id, payload
  * hex — the binaryFile stand-in at the repo's hex grain) is
  * deduplicated per micro-batch, first WITHIN the batch (the banded
  * hamming-≤1 pairs at the [[Multimodal.SigBitsWide]] default width,
  * lowest id wins), then against the accumulated frame-SIGNATURE store
  * (stored media contribute 60-bit signatures only — payloads are never
  * re-read, let alone re-decoded: with a real codec the store check
  * costs zero decode), and the survivors' signatures become the store's
  * next increment.
  *
  * Exactly-once is the [[StreamNearDedup]]/[[BatchStore]] contract,
  * unchanged: per-batchId overwrite writes, store view for batch N
  * reads STRICTLY batches < N (a replayed id overwrites its own partial
  * and never meets its own first attempt's increment), `_graft_committed`
  * marker lands after the parquet, and [[start]] REQUIRES a checkpoint
  * so batch ids survive restarts.
  *
  * Media objects too short to hold one FULL frame carry no signature
  * and PASS THROUGH (they cannot be perceptual near-dups of anything —
  * the drop set is built from ids with matching frames, so frameless
  * objects never join it); they also add nothing to the store.
  *
  * Cost per micro-batch: ONE signature pass over the batch payloads
  * (persisted; the self-join, store check, and increment all reuse it);
  * the store side is signatures only. Scale: near-dup state must span
  * the corpus — a partitionable parquet store, not executor state-store
  * memory (the E114 argument, one tier down the ladder at frame grain). */
object StreamFrameNearDup {

  /** One micro-batch: within-batch near-dup → store check → idempotent
    * per-batch writes. Public so batch callers (and the spec's replay
    * check) can drive it without a streaming query. */
  def processBatch(batch: DataFrame, batchId: Long, storeDir: String,
      outDir: String, bits: Int = Multimodal.SigBitsWide,
      maxHamming: Int = Multimodal.Mm3MaxHamming,
      codec: Option[Multimodal.FrameCodec] = None): Unit = {
    val spark = batch.sparkSession
    val media = batch.select(col("doc_id"), col("ph"))
    // a codec fixes the signature width; the independent `bits` param
    // still drives bandSigs below — require the two agree, or wide
    // signatures get banded with narrow-width arithmetic and every
    // half-match is silently missed
    codec.foreach(c => require(bits == c.bits,
      s"bits=$bits disagrees with codec width ${c.bits}: banding derives " +
        "from `bits`, so pass bits = codec.bits"))
    // the batch's ONE signature pass — every consumer below reuses it.
    // A codec routes it through the FrameCodec mapPartitions seam (real
    // perceptual hash); everything downstream — bands, store protocol,
    // drop logic — is signature-source-agnostic (MultimodalSpec pins the
    // default codec bit-identical to the hex fold).
    val sigs = (codec match {
      case Some(c) => Multimodal.frameSignaturesVia(media, c)
      case None if bits == Multimodal.SigBits =>
        Multimodal.frameSignatures(media)
      case None => Multimodal.frameSignaturesWide(media)
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val banded = Multimodal.bandSigs(sigs, bits)
      // within-batch: an object near-duplicating a LOWER-id batch
      // object loses (any frame pair within the hamming threshold)
      val losers = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.doc_id") < col("y.doc_id"))
        .where(expr("bit_count(x.sig ^ y.sig)") <= maxHamming)
        .select(col("y.doc_id").as("doc_id")).distinct()
      // vs the accumulated store — STRICTLY batches before this one (a
      // replayed id would otherwise meet its own first attempt's
      // increment and drop every object as a near-dup of itself); the
      // store is always the keeper side, so no id ordering here
      val storeDups = BatchStore.read(spark, storeDir,
          beforeBatch = Some(batchId)) match {
        case Some(store) =>
          val sb = Multimodal.bandSigs(store, bits)
          banded.as("x").join(sb.as("y"),
              col("x.band") === col("y.band") &&
                col("x.key") === col("y.key"))
            .where(expr("bit_count(x.sig ^ y.sig)") <= maxHamming)
            .select(col("x.doc_id").as("doc_id")).distinct()
        case None => losers.limit(0)
      }
      val dropped = losers.unionByName(storeDups).distinct()
      // frameless objects hold no signature, join no drop set, PASS
      val survivors = media.join(dropped, Seq("doc_id"), "left_anti")
      val liveSigs = sigs.join(dropped, Seq("doc_id"), "left_anti")
      // per-batch overwrite + marker-last: the [[BatchStore]] protocol
      BatchStore.writeBatch(survivors, outDir, batchId)
      BatchStore.writeBatch(liveSigs, storeDir, batchId)
    } finally sigs.unpersist()
  }

  /** The COMMITTED signature store — the [[BatchStore]] read with the
    * replay-safe strictly-before view. */
  def readStore(spark: SparkSession, storeDir: String,
      beforeBatch: Option[Long] = None): Option[DataFrame] =
    BatchStore.read(spark, storeDir, beforeBatch)

  /** Streaming entry: drive [[processBatch]] from a media-hex stream.
    * `checkpointDir` is REQUIRED — without a durable checkpoint a
    * restarted query renumbers batches from 0 and the per-batch-id
    * idempotence contract breaks. `bits`/`maxHamming` thread through to
    * [[processBatch]] (same defaults), so the 32-bit exhibit width is
    * reachable from a stream without hand-rolling foreachBatch. */
  def start(media: DataFrame, storeDir: String, outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(100L),
      bits: Int = Multimodal.SigBitsWide,
      maxHamming: Int = Multimodal.Mm3MaxHamming,
      codec: Option[Multimodal.FrameCodec] = None): StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(b, id, storeDir, outDir, bits, maxHamming, codec)
      }
      .trigger(trigger)
      .start()
}
