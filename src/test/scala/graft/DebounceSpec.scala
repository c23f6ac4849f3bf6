package graft

import graft.streaming.Debounce
import graft.streaming.Debounce.{Assigned, Event}

/** Anchored-window debounce semantics (SURVEY §2.9 T1): the window is
  * measured from the batch START, not the last event — the property that
  * separates it from a session window. */
class DebounceSpec extends SparkSpec {

  test("first event anchors; events inside start+window join the batch") {
    val out = Debounce.assign(Seq(0L, 30L, 89L, 90L), window = 90L)
    assert(out === Seq(Assigned(0, 0), Assigned(30, 0), Assigned(89, 0),
      Assigned(90, 0)))
  }

  test("event after start+window anchors a NEW batch (not session-extended)") {
    // a session window with gap 90 would chain 0→80→160 into one session;
    // the anchored window closes at 90, so 160 starts batch 2
    val out = Debounce.assign(Seq(0L, 80L, 160L, 170L, 260L), window = 90L)
    assert(out.map(_.batchStart) === Seq(0L, 0L, 160L, 160L, 260L))
  }

  test("ttl = batch_start + window invariant: every event within its batch") {
    val ts = Seq(3L, 5L, 100L, 101L, 150L, 400L, 480L, 481L)
    val out = Debounce.assign(ts, window = 90L)
    out.foreach { a =>
      assert(a.ts >= a.batchStart && a.ts <= a.batchStart + 90L)
    }
    // batch starts are themselves events
    assert(out.map(_.batchStart).distinct.forall(ts.contains))
  }

  test("anchored-window invariants hold for random event sequences") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(40, Gen.choose(0L, 2000L))
    (1 to 25).foreach { seed =>
      val ts = gen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
        .sorted
      val w = 50L + seed
      val out = Debounce.assign(ts, w)
      // every event lands in exactly one batch, inside its window
      assert(out.size === ts.size)
      out.foreach(a => assert(a.ts >= a.batchStart && a.ts <= a.batchStart + w))
      // each batch start is an event, and consecutive starts are > w apart
      val starts = out.map(_.batchStart).distinct
      assert(starts.forall(ts.contains))
      starts.sliding(2).foreach {
        case Seq(a, b) => assert(b - a > w, s"seed $seed: starts $a,$b w=$w")
        case _ =>
      }
      // batch assignment is monotone: later events never join earlier batches
      assert(out.map(_.batchStart) === out.map(_.batchStart).sorted)
    }
  }

  test("batchAssign groups per key and matches the pure recurrence") {
    import spark.implicits._
    val events = Seq(
      Event(1, 0), Event(1, 50), Event(1, 200),
      Event(2, 10), Event(2, 500)).toDS()
    val rows = Debounce.batchAssign(events, window = 90L)
      .collect().sortBy(r => (r.key, r.batchStart))
    assert(rows.map(r => (r.key, r.batchStart, r.nEvents)).toSeq === Seq(
      (1L, 0L, 2L), (1L, 200L, 1L), (2L, 10L, 1L), (2L, 500L, 1L)))
  }

  test("event-time streaming debounce equals the batch recurrence exactly") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val events = graft.io.Sources.table(spark, sf0001, "events")
    val expected = Debounce.batchAssignDf(events, windowSec = 3600L)
      .collect().map(_.toString).sorted

    // stage the real table (ts normalized to the epoch-NANOS long shape —
    // the staged stream below declares a BIGINT schema), then a far-future
    // sentinel event that drives the watermark past every real batch's
    // close
    val stage = java.nio.file.Files.createTempDirectory("graft-evt-debounce")
    val slim = events.select(col("user_id"),
      (graft.io.Sources.epochUs(events) * lit(1000L)).as("ts"))
    slim.coalesce(1).write.parquet(s"$stage/f1")
    val maxNanos = slim.agg(max(col("ts"))).head().getLong(0)
    val spark2 = spark; import spark2.implicits._
    Seq((999999999L, maxNanos + 10L * 3600 * 1000000000L))
      .toDF("user_id", "ts").write.parquet(s"$stage/f2")

    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "user_id BIGINT, ts BIGINT"))
      .option("maxFilesPerTrigger", 1) // f1 then f2: watermark advances between
      .parquet(s"$stage/*")
    val q = Debounce.streamingBatchesEventTime(
        Debounce.toEventT(stream), windowSec = 3600L,
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("evt_debounce_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(100L)).start()
    try {
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT * FROM evt_debounce_out WHERE key <> 999999999")
        .collect().map(_.toString).sorted
      assert(got.nonEmpty)
      assert(got.toSeq === expected.toSeq,
        s"event-time streaming (${got.length}) must equal batch " +
          s"(${expected.length}) bit for bit")
    } finally q.stop()
  }

  test("streaming flatMapGroupsWithState emits batches on window expiry") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // clock injection (T2): with a FIXED clock the state the stream builds
    // is fully deterministic — batchStart must be exactly the injected
    // anchor time, not "roughly wall-clock now". Only the timeout FIRING
    // rides Spark's processing-time clock (hence the poll below).
    val anchorMs = 5000L
    val q = Debounce.streamingBatches(mem.toDS(), windowMs = 800L,
        clock = () => anchorMs)
      .writeStream.format("memory").queryName("debounce_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(100L)).start()
    // NB: processAllAvailable cannot be used here — with processing-time
    // timeouts every trigger constructs a batch (shouldRunAnotherBatch is
    // always true), so the no-new-data signal never fires. Poll instead.
    try {
      mem.addData(Event(7, 1000L), Event(7, 1001L))
      val deadline = System.currentTimeMillis() + 30000L
      var rows = Array.empty[(Long, Long, Long, Long)]
      while (rows.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(250L)
        rows = spark.sql(
          "SELECT key, batchStart, nEvents, lastTs FROM debounce_out")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      }
      assert(rows.toSeq === Seq((7L, anchorMs, 2L, 1001L)),
        "window expiry must emit one deterministic batch row for the key")
    } finally q.stop()
  }

  test("streaming: data after expiry closes the old batch and anchors a new one (T5)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // a group with data in the trigger never gets hasTimedOut, so an
    // event arriving AFTER the window expired must still close the
    // standing batch inside the data path — merging across the expired
    // boundary would produce one fat batch instead of two (the bug this
    // test pins). The injectable clock jumps past the window between the
    // two events.
    @volatile var nowMs = 5000L
    val q = Debounce.streamingBatches(mem.toDS(), windowMs = 800L,
        clock = () => nowMs)
      .writeStream.format("memory").queryName("debounce_late_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(50L)).start()
    try {
      mem.addData(Event(7, 1000L)) // anchors batch at 5000
      // WAIT until the first event is actually consumed (progress shows
      // >= 1 input row) so the two events cannot land in one micro-batch
      // — a fixed sleep raced GC/load pauses and could anchor once
      val consumeDeadline = System.currentTimeMillis() + 30000L
      while (q.recentProgress.map(_.numInputRows).sum < 1 &&
          System.currentTimeMillis() < consumeDeadline)
        Thread.sleep(50L)
      assert(q.recentProgress.map(_.numInputRows).sum >= 1,
        "first event never consumed")
      // jump the clock past the expiry and deliver a late event: whether
      // it is processed before or after the processing-time timeout
      // fires, the result must be TWO single-event batches
      nowMs = 6000L
      mem.addData(Event(7, 2000L))
      val deadline = System.currentTimeMillis() + 30000L
      var rows = Array.empty[(Long, Long, Long, Long)]
      while (rows.length < 2 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250L)
        rows = spark.sql(
          "SELECT key, batchStart, nEvents, lastTs FROM debounce_late_out")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      }
      assert(rows.sorted.toSeq === Seq(
        (7L, 5000L, 1L, 1000L), (7L, 6000L, 1L, 2000L)),
        "late data must anchor a fresh batch, never merge across expiry")
    } finally q.stop()
  }
}
