package graft

import java.nio.file.Files

import graft.multimodal.Multimodal
import graft.streaming.StreamFrameNearDup

/** E185 streaming perceptual frame near-dup: within-batch losers drop
  * at the 60-bit width, a one-bit re-encode arriving in a LATER batch
  * drops against the signature store (payloads never re-read),
  * frameless objects pass through, and a replayed batch id overwrites
  * instead of duplicating (the exactly-once contract). */
class StreamFrameNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def media(rows: (Long, String)*) =
    rows.toDF("doc_id", "ph")

  // one-frame payloads (32 hex digits); twin = first digit + 8 mod 16,
  // exactly one wide-signature bit (the mm3 planted-twin arithmetic)
  private val zeros = "0" * 32
  private val zerosTwin = "8" + "0" * 31
  private val effs = "f" * 32
  private val effsTwin = "7" + "f" * 31
  private val fresh = "0f" * 16 // alternating — far from both in hamming

  test("frame near-dup state spans batches; within-batch losers drop; frameless objects pass") {
    val store = Files.createTempDirectory("graft-sfn-store").toString
    val out = Files.createTempDirectory("graft-sfn-out").toString
    // batch 0: object 3 is a one-bit re-encode of object 1 WITHIN the
    // batch — lower id survives; object 2 is distinct; object 6 is too
    // short for one full frame (no signature) and must PASS through
    StreamFrameNearDup.processBatch(
      media((1L, zeros), (2L, effs), (3L, zerosTwin), (6L, "ff")),
      0L, store, out)
    val out0 = spark.read.parquet(s"$out/batch=0")
      .select("doc_id").as[Long].collect().toSet
    assert(out0 === Set(1L, 2L, 6L),
      "in-batch near-dup loses to the lower id; frameless passes")
    // the store holds signatures for survivors' FULL frames only
    val stored0 = StreamFrameNearDup.readStore(spark, store).get
      .select("doc_id").as[Long].collect().toSet
    assert(stored0 === Set(1L, 2L),
      "frameless objects contribute no store signature")

    // batch 1: object 4 is a one-bit re-encode of STORED object 2 —
    // dropped without re-reading any payload; object 5 is fresh
    StreamFrameNearDup.processBatch(
      media((4L, effsTwin), (5L, fresh)), 1L, store, out)
    val out1 = spark.read.parquet(s"$out/batch=1")
      .select("doc_id").as[Long].collect().toSet
    assert(out1 === Set(5L), "store match must drop across batches")
    val stored = StreamFrameNearDup.readStore(spark, store).get
      .select("doc_id").as[Long].collect().toSet
    assert(stored === Set(1L, 2L, 5L))
  }

  test("the stored signatures ARE the batch query's wide signatures (no fork between rungs)") {
    val store = Files.createTempDirectory("graft-sfn-store2").toString
    val out = Files.createTempDirectory("graft-sfn-out2").toString
    val m = media((1L, zeros), (2L, effs))
    StreamFrameNearDup.processBatch(m, 0L, store, out)
    val stored = StreamFrameNearDup.readStore(spark, store).get
      .select("doc_id", "frame_no", "sig")
      .collect().map(_.toString).sorted.toSeq
    val direct = Multimodal.frameSignaturesWide(m)
      .collect().map(_.toString).sorted.toSeq
    assert(stored === direct,
      "store increments must be bit-identical to frameSignaturesWide")
  }

  test("a codec through the seam leaves the stream bit-identical (the default codec case)") {
    // the FrameCodec seam carries the streaming rung unchanged: running
    // the same two batches with the codec path must produce BYTE-level
    // equal decisions and store increments as the hex-fold default
    def drive(codec: Option[Multimodal.FrameCodec])
        : (Set[Long], Seq[String]) = {
      val store = Files.createTempDirectory("graft-sfn-codec").toString
      val out = Files.createTempDirectory("graft-sfn-codec-out").toString
      StreamFrameNearDup.processBatch(
        media((1L, zeros), (2L, effs), (3L, zerosTwin), (6L, "ff")),
        0L, store, out, codec = codec)
      StreamFrameNearDup.processBatch(
        media((4L, effsTwin), (5L, fresh)), 1L, store, out, codec = codec)
      val survivors = spark.read.parquet(out)
        .select("doc_id").as[Long].collect().toSet
      val stored = StreamFrameNearDup.readStore(spark, store).get
        .select("doc_id", "frame_no", "sig")
        .collect().map(_.toString).sorted.toSeq
      (survivors, stored)
    }
    assert(drive(Some(Multimodal.TopBitsFrameCodec)) === drive(None))
  }

  test("replaying a batch id overwrites its own output (exactly-once)") {
    val store = Files.createTempDirectory("graft-sfn-store3").toString
    val out = Files.createTempDirectory("graft-sfn-out3").toString
    val batch = media((1L, zeros), (2L, effs))
    StreamFrameNearDup.processBatch(batch, 0L, store, out)
    // the engine re-delivers the SAME batch id after a crash — the
    // second run must not meet its own first attempt's increment and
    // drop both objects as near-dups of themselves
    StreamFrameNearDup.processBatch(batch, 0L, store, out)
    assert(spark.read.parquet(s"$out/batch=0").count() === 2L,
      "replay must not self-dedup or duplicate")
    assert(StreamFrameNearDup.readStore(spark, store).get
      .select("doc_id").as[Long].collect().toSet === Set(1L, 2L))
    // and the replayed store still drives cross-batch dedup
    StreamFrameNearDup.processBatch(media((3L, zerosTwin)), 1L, store, out)
    assert(spark.read.parquet(s"$out/batch=1").count() === 0L)
  }

  test("streaming entry + checkpointed restart continue batch ids end to end") {
    val in = Files.createTempDirectory("graft-sfn-in").toString
    val store = Files.createTempDirectory("graft-sfn-store4").toString
    val out = Files.createTempDirectory("graft-sfn-out4").toString
    val ckpt = Files.createTempDirectory("graft-sfn-ckpt").toString
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, ph STRING")
    media((1L, zeros), (3L, zerosTwin)).coalesce(1)
      .write.parquet(s"$in/f1")
    def start() = StreamFrameNearDup.start(
      spark.readStream.schema(schema).parquet(s"$in/*"), store, out, ckpt)
    val q = start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(s"$out/batch=*")
        .select("doc_id").as[Long].collect().toSet === Set(1L))
    } finally q.stop()
    // RESTART on the same checkpoint: ids continue, the stored object
    // still catches its later re-encode, fresh content still lands
    media((4L, zerosTwin), (5L, fresh)).coalesce(1)
      .write.parquet(s"$in/f2")
    val q2 = start()
    try {
      q2.processAllAvailable()
      val stored = StreamFrameNearDup.readStore(spark, store).get
        .select("doc_id").as[Long].collect().toSet
      assert(stored === Set(1L, 5L),
        "restart must extend the store, not renumber over batch 0")
    } finally q2.stop()
  }
}
