package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.streaming.StreamTopK

/** E157 streaming windowed top-k: the serving snapshot over streamed
  * per-batch increments must equal the batch query e6 on the same
  * events — including across a stop/restart — and the per-batch store
  * must be replay-idempotent and crash-partial-safe. */
class StreamTopKSpec extends SparkSpec {

  private def e6(dir: String = sf0001): Set[Row] =
    SparkEntry.queries("e6_daily_top_keys")(spark, dir)
      .collect().toSet

  private def snap(store: String): Set[Row] =
    StreamTopK.snapshot(spark, store)
      .select(col("day_start_us"), col("k"), col("n_events"), col("rank"))
      .collect().toSet

  test("e157: streamed snapshot ≡ e6 batch, and a restart continues") {
    val in = Files.createTempDirectory("graft-topk-in").toString
    val store = Files.createTempDirectory("graft-topk-store").toString
    val ckpt = Files.createTempDirectory("graft-topk-ckpt").toString
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    val schema = events.schema
    // first tranche streams, then the query STOPS — a deploy boundary
    events.where(col("event_id") % 3 === 0).coalesce(1)
      .write.parquet(s"$in/f0")
    val q = StreamTopK.start(
      spark.readStream.schema(schema).parquet(s"$in/*"), store, ckpt)
    try q.processAllAvailable() finally q.stop()
    // the remaining tranches arrive while the query is down; the
    // restarted query must CONTINUE batch numbering from the checkpoint
    // (never renumber over committed increments) and converge to the
    // batch answer on the full event set
    events.where(col("event_id") % 3 === 1).coalesce(1)
      .write.parquet(s"$in/f1")
    events.where(col("event_id") % 3 === 2).coalesce(1)
      .write.parquet(s"$in/f2")
    val q2 = StreamTopK.start(
      spark.readStream.schema(schema).parquet(s"$in/*"), store, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(snap(store) === e6(),
      "streamed top-k must equal the batch query on the same events")
  }

  test("e157: replaying a batch id re-commits idempotently") {
    val store = Files.createTempDirectory("graft-topk-store2").toString
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    StreamTopK.processBatch(events, 0L, store)
    val once = snap(store)
    // the engine re-delivers the SAME id after a crash — state must not
    // double
    StreamTopK.processBatch(events, 0L, store)
    assert(snap(store) === once)
    assert(once === e6(), "one batch holding all events ≡ the batch query")
  }

  test("e157: a crashed-partial increment is invisible to the snapshot") {
    val store = Files.createTempDirectory("graft-topk-store3").toString
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    StreamTopK.processBatch(events, 0L, store)
    val committed = snap(store)
    // crash mid-write of batch 1: parquet lands, marker does not
    StreamTopK.batchCounts(events).write.parquet(s"$store/batch=1")
    assert(snap(store) === committed,
      "only marker-committed increments may count")
    // and the crashed id replays cleanly over its partial
    StreamTopK.processBatch(events, 1L, store)
    assert(StreamTopK.snapshot(spark, store).count() === committed.size.toLong)
  }

  test("e157: empty store serves an empty, correctly-shaped leaderboard") {
    val store = Files.createTempDirectory("graft-topk-store4").toString
    val s = StreamTopK.snapshot(spark, store)
    assert(s.columns.toSeq ===
      Seq("day_start_us", "k", "n_events", "rank"))
    assert(s.count() === 0L)
  }
}
