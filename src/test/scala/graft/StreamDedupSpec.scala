package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamDedup

/** Streaming exact dedup (E53): duplicates are dropped within the
  * watermark horizon, state is evicted beyond it, and the batch run of
  * the same body matches plain per-fingerprint dedup. */
class StreamDedupSpec extends SparkSpec {

  private val schema = org.apache.spark.sql.types.StructType.fromDDL(
    "doc_id BIGINT, text STRING, ts BIGINT")

  test("stream dedups within the horizon and re-admits beyond it") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-sdedup-in").toString
    def addFile(name: String, rows: (Long, String, Long)*): Unit =
      rows.toSeq.map { case (id, t, sec) => (id, t, sec * 1000000000L) }
        .toDF("doc_id", "text", "ts").coalesce(1).write.parquet(s"$in/$name")

    val q = StreamDedup.dedupDocStream(
        spark.readStream.schema(schema).parquet(s"$in/*"), "10 seconds")
      .writeStream.format("memory").queryName("sdedup_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(100L)).start()
    try {
      def seen(): Set[Long] = spark.table("sdedup_out")
        .collect().map(_.getLong(0)).toSet

      // base well above epoch 0: a row AT the initial watermark (0) would
      // be discarded as late before dedup ever sees it
      val t0 = 100000L
      addFile("f1", (1L, "alpha beta", t0), (2L, "gamma delta", t0 + 1))
      q.processAllAvailable()
      assert(seen() === Set(1L, 2L))

      // a duplicate inside the horizon is dropped (watermark at this
      // batch lags doc 1's event time, its fingerprint state is alive)
      addFile("f2", (3L, "alpha beta", t0 + 5), (4L, "epsilon", t0 + 6))
      q.processAllAvailable()
      assert(seen() === Set(1L, 2L, 4L), "in-horizon duplicate must drop")

      // advance the watermark far past doc 1's expiry (t0 + 10s)...
      addFile("f3", (5L, "zeta eta", t0 + 500))
      q.processAllAvailable()
      // ...so a later re-observation is ADMITTED: state was evicted, the
      // horizon contract is exact-within, best-effort-beyond
      addFile("f4", (6L, "alpha beta", t0 + 1000))
      q.processAllAvailable()
      assert(seen() === Set(1L, 2L, 4L, 5L, 6L),
        "beyond the horizon the fingerprint must be re-admitted")
    } finally q.stop()
  }

  test("batch twin dedups per fingerprint without a horizon") {
    import spark.implicits._
    val batch = Seq(
      (1L, "alpha beta", 0L), (2L, "gamma", 1000000000L),
      (3L, "alpha  beta ", 2000000000L)) // same normalized fp as doc 1
      .toDF("doc_id", "text", "ts")
    val out = StreamDedup.dedupDocBatch(batch)
    assert(out.count() === 2L)
    assert(out.select("fp").distinct().count() === 2L)
    // and the streaming body is genuinely streaming-only — the batch twin
    // exists because Spark rejects dropDuplicatesWithinWatermark on batch
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      StreamDedup.dedupDocStream(batch, "10 seconds").count()
    }
    assert(e.getMessage.contains("dropDuplicatesWithinWatermark"))
  }
}
