package graft

import org.apache.spark.sql.streaming.Trigger

import graft.io.Sources
import graft.streaming.WindowedAgg

/** Streaming windowed aggregation: the same transform runs batch and
  * streaming, and a file-driven streaming query over the events table
  * produces exactly the batch result (complete mode, no late data). */
class StreamingAggSpec extends SparkSpec {

  test("streaming windowed agg over the events table matches batch") {
    val dir = s"$sf0001/events.parquet"
    val batchOut = WindowedAgg.eventTypeWindows(
      Sources.table(spark, sf0001, "events"), "1 hour", "2 hours")
      .collect().map(_.toString).sorted

    // the file stream source requires a DIRECTORY; stage the table file
    val stage = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(dir),
      stage.resolve("events.parquet"))
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(stage.toString)
    val q = WindowedAgg.eventTypeWindows(stream, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("winagg_out")
      .outputMode("complete")
      .trigger(Trigger.ProcessingTime(100L)).start()
    try {
      q.processAllAvailable()
      val streamOut = spark.sql("SELECT * FROM winagg_out")
        .collect().map(_.toString).sorted
      assert(streamOut.nonEmpty)
      assert(streamOut.toSeq === batchOut.toSeq)
    } finally q.stop()
  }
}
