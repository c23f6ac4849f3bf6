package graft

import java.nio.file.{Files, Path}

import graft.runner.BatchRunner
import graft.runner.BatchRunner.{BatchChunk, LogAlerter}
import graft.runner.Runner.{Done, FailedStatus, Pending}

/** Full orchestration capstone: chunks drain FIFO single-flight through
  * validate → transform; failures alert and mark failed; later batches
  * merge into the same KPI store. */
class BatchRunnerSpec extends SparkSpec {

  private val ordersHeader =
    "order_id,user_id,status,created_at,returned_at,shipped_at,delivered_at,num_of_item"
  private val itemsHeader =
    "id,order_id,user_id,product_id,status,created_at,shipped_at,delivered_at,returned_at,sale_price"
  private val productsHeader =
    "id,sku,cost,category,name,brand,retail_price,department"

  private def write(d: Path, name: String, lines: String*): String = {
    val f = d.resolve(name)
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("status store: torn/garbage records degrade to re-run; failed rehydrates with its error") {
    val d = Files.createTempDirectory("graft-status")
    val control = d.resolve("control")
    val statusDir = d.resolve("status")
    Files.createDirectories(control)
    Files.createDirectories(statusDir)

    // a batch that FAILS validation (null order_id) — its failure record,
    // with a multi-line error message, must round-trip the status store
    val bad = BatchRunner.toChunk("bad1", 100L, Seq(
      write(d, "orders_part9.csv", ordersHeader,
        ",13,complete,2024-06-03 09:00:00,,,,1"),
      write(d, "order_items_part9.csv", itemsHeader,
        "104,4,13,7,complete,2024-06-03 09:00:00,,,,10.0"),
      write(d, "products9.csv", productsHeader,
        "7,SKU7,10.0,toys,Car,BrandA,25.0,kids")))
    val files = bad.ordersPaths ++ bad.itemsPaths ++ bad.productsPath.toSeq
    Files.writeString(control.resolve("chunk_bad1.json"),
      s"""{"batch_id": "bad1", "created_at": 100, """ +
        s""""files": [${files.map("\"" + _ + "\"").mkString(", ")}]}""")

    // adversarial statusDir content a crash can leave behind: a torn
    // JSON doc (invalid bytes, no closing quote), a stray SUBDIRECTORY
    // named like a record, and a pending (non-terminal) doc — none may
    // crash the restart, all must mean "re-run"
    Files.write(statusDir.resolve("torn.json"),
      Array[Byte]('{', '"', 'b', 0x80.toByte, 0xfe.toByte))
    Files.createDirectories(statusDir.resolve("subdir.json"))
    Files.writeString(statusDir.resolve("pending.json"),
      """{"batch_id": "bad1", "status": "pending", "error": null}""")

    val runA = BatchRunner.streamChunks(spark, control.toString,
      s"$d/work", now = "t0", statusDir = Some(statusDir.toString))
    try {
      runA.query.processAllAvailable()
      assert(runA.processed() === Seq("bad1"),
        "garbage + non-terminal records must rehydrate nothing")
      val c = runA.chunks().find(_.batchId == "bad1").get
      assert(c.status === FailedStatus)
      assert(c.error.exists(_.contains("NULL_VALIDATION_ERROR")))
    } finally runA.query.stop()
    // the failure record on disk is valid JSON even though Spark error
    // messages carry newlines/quotes
    val doc = Files.readString(statusDir.resolve("bad1.json"))
    assert(!doc.contains("\n"), s"unescaped newline in status doc: $doc")

    // restart: the failed batch rehydrates as FAILED with its persisted
    // error (no silent auto-retry), so nothing re-runs
    val runB = BatchRunner.streamChunks(spark, control.toString,
      s"$d/work", now = "t0", statusDir = Some(statusDir.toString))
    try {
      runB.query.processAllAvailable()
      assert(runB.processed() === Seq.empty,
        "terminal failed status must rehydrate and skip the re-run")
      val c = runB.chunks().find(_.batchId == "bad1").get
      assert(c.status === FailedStatus)
      assert(c.error.exists(_.contains("NULL_VALIDATION_ERROR")),
        s"persisted error must rehydrate, got ${c.error}")
    } finally runB.query.stop()
  }

  test("chunks drain FIFO; KPI store accumulates across batches; bad batch alerts") {
    val d = Files.createTempDirectory("graft-runner")
    LogAlerter.clear()

    // batch 1 (day 1): two orders, two items
    val b1 = BatchRunner.toChunk("b1", 100L, Seq(
      write(d, "orders_part1.csv", ordersHeader,
        "1,10,complete,2024-06-01 10:00:00,,,,1",
        "2,11,complete,2024-06-01 11:00:00,,,,1"),
      write(d, "order_items_part1.csv", itemsHeader,
        "101,1,10,7,complete,2024-06-01 10:00:00,,,,25.0",
        "102,2,11,7,returned,2024-06-01 11:00:00,,,,75.0"),
      write(d, "products.csv", productsHeader,
        "7,SKU7,10.0,toys,Car,BrandA,25.0,kids")))
    assert(b1.ordersPaths.size === 1 && b1.itemsPaths.size === 1 &&
      b1.productsPath.nonEmpty)

    // batch 2 (day 2): arrives later
    val b2 = BatchRunner.toChunk("b2", 200L, Seq(
      write(d, "orders_part2.csv", ordersHeader,
        "3,12,complete,2024-06-02 09:00:00,,,,1"),
      write(d, "order_items_part2.csv", itemsHeader,
        "103,3,12,7,complete,2024-06-02 09:00:00,,,,40.0"),
      b1.productsPath.get))

    // batch 3: null order_id → must fail validation and alert
    val b3 = BatchRunner.toChunk("b3", 300L, Seq(
      write(d, "orders_part3.csv", ordersHeader,
        ",13,complete,2024-06-03 09:00:00,,,,1"),
      write(d, "order_items_part3.csv", itemsHeader,
        "104,4,13,7,complete,2024-06-03 09:00:00,,,,10.0"),
      b1.productsPath.get))

    val chunks = Seq(b3, b1, b2) // scrambled: FIFO must pick b1 first
    val done = BatchRunner.drain(spark, chunks, s"$d/work", now = "t0")

    assert(done.find(_.batchId == "b1").get.status === Done,
      done.find(_.batchId == "b1").get.error)
    assert(done.find(_.batchId == "b2").get.status === Done)
    assert(done.find(_.batchId == "b3").get.status === FailedStatus)
    assert(LogAlerter.alerts.exists(_._1.contains("b3")))
    assert(done.find(_.batchId == "b3").get.error.get
      .contains("NULL_VALIDATION_ERROR"))

    // the store holds one order-KPI row per processed date
    val ord = spark.read.parquet(s"$d/work/store/order_kpi")
    assert(ord.count() === 2)
    val day1 = ord.filter("order_date = '2024-06-01'").head()
    assert(day1.getAs[Long]("total_orders") === 2L)
    assert(day1.getAs[Double]("total_revenue") === 100.0)
    val day2 = ord.filter("order_date = '2024-06-02'").head()
    assert(day2.getAs[Double]("total_revenue") === 40.0)
  }

  test("chunk without products validates but fails transform (fail-loud)") {
    val d = Files.createTempDirectory("graft-runner-np")
    LogAlerter.clear()
    val chunk = BatchRunner.toChunk("np1", 10L, Seq(
      write(d, "orders_part1.csv", ordersHeader,
        "1,10,complete,2024-06-01 10:00:00,,,,1"),
      write(d, "order_items_part1.csv", itemsHeader,
        "101,1,10,7,complete,2024-06-01 10:00:00,,,,25.0")))
    assert(chunk.productsPath.isEmpty)
    BatchRunner.drain(spark, Seq(chunk), s"$d/work", now = "t0")
    // validation passes (products optional there, validation.py:110-116);
    // the transform's mandatory-products contract fails the chunk
    assert(chunk.status === FailedStatus)
    assert(chunk.error.exists(_.contains("Products")))
    assert(LogAlerter.alerts.exists(_._1.contains("np1")))
  }

  test("T3 stream: control-table file stream dispatches chunks FIFO") {
    val d = Files.createTempDirectory("graft-stream")
    LogAlerter.clear()
    val o1 = write(d, "orders_part1.csv", ordersHeader,
      "1,10,complete,2024-06-01 10:00:00,,,,1")
    val i1 = write(d, "order_items_part1.csv", itemsHeader,
      "101,1,10,7,complete,2024-06-01 10:00:00,,,,25.0")
    val o2 = write(d, "orders_part2.csv", ordersHeader,
      "3,12,complete,2024-06-02 09:00:00,,,,1")
    val i2 = write(d, "order_items_part2.csv", itemsHeader,
      "103,3,12,7,complete,2024-06-02 09:00:00,,,,40.0")
    val p = write(d, "products.csv", productsHeader,
      "7,SKU7,10.0,toys,Car,BrandA,25.0,kids")

    val control = d.resolve("control")
    Files.createDirectories(control)
    def doc(id: String, createdAt: Long, files: Seq[String]): String =
      s"""{"batch_id": "$id", "created_at": $createdAt, "files": [${
        files.map("\"" + _ + "\"").mkString(", ")}]}"""
    // written out of FIFO order: the later batch's control doc lands first
    Files.writeString(control.resolve("chunk_s2.json"),
      doc("s2", 200L, Seq(o2, i2, p)))
    Files.writeString(control.resolve("chunk_s1.json"),
      doc("s1", 100L, Seq(o1, i1, p)))

    val h = BatchRunner.streamChunks(spark, control.toString, s"$d/work",
      now = "t0")
    try {
      h.query.processAllAvailable()
      // FIFO by created_at regardless of arrival order, single-flight
      assert(h.processed() === Seq("s1", "s2"))
      assert(h.chunks().forall(_.status == Done),
        h.chunks().map(c => (c.batchId, c.status, c.error)))
      // both batches merged into one store
      val ord = spark.read.parquet(s"$d/work/store/order_kpi")
      assert(ord.count() === 2)
      // a late-arriving control doc is picked up by a later micro-batch
      val o3 = write(d, "orders_part3.csv", ordersHeader,
        "4,14,complete,2024-06-03 08:00:00,,,,1")
      val i3 = write(d, "order_items_part3.csv", itemsHeader,
        "105,4,14,7,complete,2024-06-03 08:00:00,,,,15.0")
      Files.writeString(control.resolve("chunk_s3.json"),
        doc("s3", 300L, Seq(o3, i3, p)))
      h.query.processAllAvailable()
      assert(h.processed() === Seq("s1", "s2", "s3"))
      assert(spark.read.parquet(s"$d/work/store/order_kpi").count() === 3)
    } finally h.query.stop()
  }

  test("latest_products fixed group: a products file joins the current batch regardless of arrival date") {
    import graft.runner.BatchRunner.Arrival
    val win = 300L

    // products arrived THREE DAYS before the order files, far outside any
    // debounce window — the reference routes it to the fixed
    // `latest_products` group, so it must still ride along
    assert(BatchRunner.groupKey("s3://in/products.csv", "2024-06-04")
      === "latest_products")
    assert(BatchRunner.groupKey("s3://in/orders_part1.csv", "2024-06-04")
      === "2024-06-04")

    val arrivals = Seq(
      Arrival("in/products.csv", 1000L, "2024-06-01"),
      Arrival("in/orders_part1.csv", 260000L, "2024-06-04"),
      Arrival("in/order_items_part1.csv", 260100L, "2024-06-04"))
    val chunks = BatchRunner.assembleChunks(arrivals, win)
    assert(chunks.size === 1)
    assert(chunks.head.ordersPaths === Seq("in/orders_part1.csv"))
    assert(chunks.head.productsPath === Some("in/products.csv"),
      "products must attach from the fixed group, not its own date batch")

    // products must NOT anchor or split a date batch: the same arrivals
    // with products arriving BETWEEN the two date files still yield one
    // chunk anchored at the first ORDER file's timestamp
    val interleaved = Seq(
      Arrival("in/orders_part1.csv", 260000L, "2024-06-04"),
      Arrival("in/products.csv", 260050L, "2024-06-04"),
      Arrival("in/order_items_part1.csv", 260100L, "2024-06-04"))
    val c2 = BatchRunner.assembleChunks(interleaved, win)
    assert(c2.size === 1 && c2.head.createdAt === 260000L)

    // two products files: the LATEST wins (the group key is a single
    // fixed slot, last writer visible — reference `latest_products`)
    val twoProducts = arrivals :+ Arrival("in2/products.csv", 2000L, "2024-06-02")
    val c3 = BatchRunner.assembleChunks(twoProducts, win)
    assert(c3.head.productsPath === Some("in2/products.csv"))

    // date files outside the window split into separate chunks, each
    // getting the standing products file
    val twoBatches = Seq(
      Arrival("in/products.csv", 1000L, "2024-06-01"),
      Arrival("in/orders_part1.csv", 260000L, "2024-06-04"),
      Arrival("in/orders_part2.csv", 260000L + win + 1, "2024-06-04"))
    val c4 = BatchRunner.assembleChunks(twoBatches, win)
    assert(c4.size === 2)
    assert(c4.forall(_.productsPath === Some("in/products.csv")))

    // replay parity: a products file that arrived AFTER a chunk's window
    // closed must not leak backward into it — the live run processed that
    // chunk with no products file standing, and a later chunk picks the
    // new arrival up
    val lateProducts = Seq(
      Arrival("in/orders_part1.csv", 100L, "2024-06-04"),
      Arrival("in/products.csv", 100L + win + 50, "2024-06-01"),
      Arrival("in/orders_part2.csv", 100L + win + 200, "2024-06-04"))
    val c5 = BatchRunner.assembleChunks(lateProducts, win)
    assert(c5.size === 2)
    assert(c5.head.productsPath === None,
      "a products arrival after the window closed must not join the chunk")
    assert(c5.last.productsPath === Some("in/products.csv"))
  }

  test("capstone: debounce → chunk stream → crash/restart → exactly-once store → enrichment") {
    // The full reference loop (Step Function semantics) as ONE run:
    // E14 file-arrival debounce assembles batch chunks, T3 streams them
    // through the single-flight validate → transform into the epoch
    // store, the runner CRASHES (in-memory queue lost), a restart
    // re-delivers the whole control table (at-least-once), and the
    // keyed idempotent merge keeps the store EXACTLY-ONCE; the E101
    // enrichment tail then decorates an event stream with a dimension
    // derived from the pipeline's own validated output. Every stage is
    // spec-verified alone — this pins the COMPOSITION.
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.streaming.Trigger
    import graft.runner.BatchRunner.Arrival
    import graft.streaming.Enrich
    val d = Files.createTempDirectory("graft-capstone")
    LogAlerter.clear()

    val p = write(d, "products.csv", productsHeader,
      "7,SKU7,10.0,toys,Car,BrandA,25.0,kids")
    val o1 = write(d, "orders_part1.csv", ordersHeader,
      "1,10,complete,2024-06-01 10:00:00,,,,1")
    val i1 = write(d, "order_items_part1.csv", itemsHeader,
      "101,1,10,7,complete,2024-06-01 10:00:00,,,,25.0")
    val o2a = write(d, "orders_part2.csv", ordersHeader,
      "3,12,complete,2024-06-02 09:00:00,,,,1")
    val o2b = write(d, "orders_part4.csv", ordersHeader,
      "4,13,complete,2024-06-02 09:30:00,,,,1")
    val i2 = write(d, "order_items_part2.csv", itemsHeader,
      "103,3,12,7,complete,2024-06-02 09:00:00,,,,40.0",
      "104,4,13,7,returned,2024-06-02 09:30:00,,,,60.0")
    val o3 = write(d, "orders_part3.csv", ordersHeader,
      "5,14,complete,2024-06-03 08:00:00,,,,1")
    val i3 = write(d, "order_items_part3.csv", itemsHeader,
      "105,5,14,7,complete,2024-06-03 08:00:00,,,,15.0")

    // ---- stage 1: debounce (E14) — day-2's split order parts land in
    // ONE chunk; products rides the fixed latest_products group
    val win = 300L
    val preChunks = BatchRunner.assembleChunks(Seq(
      Arrival(p, 50L, "2024-06-01"),
      Arrival(o1, 100L, "2024-06-01"), Arrival(i1, 130L, "2024-06-01"),
      Arrival(o2a, 200L, "2024-06-02"), Arrival(o2b, 250L, "2024-06-02"),
      Arrival(i2, 280L, "2024-06-02")), win)
    assert(preChunks.size === 2)
    assert(preChunks.last.ordersPaths.toSet === Set(o2a, o2b),
      "debounce must fold both day-2 order parts into one batch")
    assert(preChunks.forall(_.productsPath === Some(p)))

    // ---- stage 2: chunk control stream (T3) over the assembled chunks
    val control = d.resolve("control")
    Files.createDirectories(control)
    def doc(c: BatchChunk): String = {
      // the control source is LINE-delimited JSON — one doc, one line
      val files = c.ordersPaths ++ c.itemsPaths ++ c.productsPath.toSeq
      s"""{"batch_id": "${c.batchId}", "created_at": ${c.createdAt}, """ +
        s""""files": [${files.map("\"" + _ + "\"").mkString(", ")}]}"""
    }
    preChunks.foreach(c => Files.writeString(
      control.resolve(s"chunk_${c.batchId}.json"), doc(c)))

    val runA = BatchRunner.streamChunks(spark, control.toString,
      s"$d/work", now = "t0")
    try runA.query.processAllAvailable() finally runA.query.stop()
    // CRASH: the runner process dies here — its in-memory queue and
    // processed list are gone; only the store and the control table
    // survive on disk
    val store = s"$d/work/store/order_kpi"
    val snapA = spark.read.parquet(store)
      .collect().map(_.toString).sorted.toSeq
    assert(snapA.size === 2, "two committed daily rows before the crash")

    // a batch arrives DURING the downtime
    val chunk3 = BatchRunner.assembleChunks(Seq(
      Arrival(p, 50L, "2024-06-01"),
      Arrival(o3, 400000L, "2024-06-03"),
      Arrival(i3, 400030L, "2024-06-03")), win)
    assert(chunk3.size === 1)
    Files.writeString(control.resolve(s"chunk_${chunk3.head.batchId}.json"),
      doc(chunk3.head))

    // ---- stage 3: RESTART — a fresh process re-reads the WHOLE control
    // table (at-least-once redelivery); the epoch store's keyed coalescing
    // merge is what turns that into exactly-once state
    val runB = BatchRunner.streamChunks(spark, control.toString,
      s"$d/work", now = "t0")
    try {
      runB.query.processAllAvailable()
      val ids = (preChunks ++ chunk3).map(_.batchId)
      assert(runB.processed().toSet === ids.toSet,
        "restart must re-run the redelivered batches AND the new one")
      assert(runB.chunks().forall(_.status == Done),
        runB.chunks().map(c => (c.batchId, c.status, c.error)))
      val after = spark.read.parquet(store)
        .collect().map(_.toString).sorted.toSeq
      assert(after.size === 3, "downtime batch merged on restart")
      assert(after.filterNot(_.contains("2024-06-03")) === snapA,
        "redelivered batches must not change committed state (exactly-once)")
    } finally runB.query.stop()

    // ---- stage 3b: the durable status store (DynamoDB metadata-table
    // analogue) — a THIRD run with statusDir seeded from a drained run
    // rehydrates terminal statuses and re-runs NOTHING, while a batch
    // arriving after the restart still processes; failed batches stay
    // failed (no silent auto-retry)
    val statusDir = d.resolve("status").toString
    val runC = BatchRunner.streamChunks(spark, control.toString,
      s"$d/work", now = "t0", statusDir = Some(statusDir))
    try runC.query.processAllAvailable() finally runC.query.stop()
    assert(runC.processed().size === 3,
      "no status records yet: run C re-runs all three (idempotent)")
    val o4 = write(d, "orders_part5.csv", ordersHeader,
      "6,15,complete,2024-06-04 08:00:00,,,,1")
    val i4 = write(d, "order_items_part5.csv", itemsHeader,
      "106,6,15,7,complete,2024-06-04 08:00:00,,,,12.0")
    val chunk4 = BatchRunner.assembleChunks(Seq(
      Arrival(p, 50L, "2024-06-01"),
      Arrival(o4, 500000L, "2024-06-04"),
      Arrival(i4, 500030L, "2024-06-04")), win)
    Files.writeString(control.resolve(s"chunk_${chunk4.head.batchId}.json"),
      doc(chunk4.head))
    val runD = BatchRunner.streamChunks(spark, control.toString,
      s"$d/work", now = "t0", statusDir = Some(statusDir))
    try {
      runD.query.processAllAvailable()
      assert(runD.processed() === Seq(chunk4.head.batchId),
        "status-store restart must skip every completed batch")
      assert(spark.read.parquet(store).count() === 4)
    } finally runD.query.stop()

    // ---- stage 4: enrichment tail (E101) — the dimension is DERIVED
    // from the pipeline's own validated output (known buyers), streaming
    // events decorated, unknown keys flagged not dropped
    val buyers = preChunks.map(c =>
        spark.read.parquet(s"$d/work/validated/${c.batchId}/orders")
          .select(col("user_id")))
      .reduce(_ unionByName _).distinct()
      .select(col("user_id").cast("long").as("c_custkey"))
      .withColumn("c_mktsegment", lit("BUYER"))
    val evDir = d.resolve("events")
    import spark.implicits._
    Seq((1L, 10L, "view", 1.0), (2L, 12L, "cart", 2.0),
        (3L, 99L, "view", 3.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .write.parquet(evDir.toString)
    val evSchema = spark.read.parquet(evDir.toString).schema
    val q = Enrich.enrichEvents(
        spark.readStream.schema(evSchema).parquet(evDir.toString), buyers)
      .writeStream.format("memory").queryName("capstone_enrich")
      .outputMode("append").trigger(Trigger.ProcessingTime(100L)).start()
    try {
      q.processAllAvailable()
      val out = spark.sql("SELECT * FROM capstone_enrich").collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[String]("segment"), r.getAs[Boolean]("is_known"))).toMap
      assert(out(10L) === (("BUYER", true)))
      assert(out(12L) === (("BUYER", true)))
      assert(out(99L) === ((null, false)),
        "unknown keys are flagged, never silently dropped")
    } finally q.stop()
  }

  test("single-flight: no pick while a chunk is processing") {
    val busy = BatchChunk("x", 1L, Nil, Nil, None,
      status = graft.runner.Runner.Processing)
    val waiting = BatchChunk("y", 2L, Nil, Nil, None, status = Pending)
    assert(BatchRunner.tick(spark, Seq(busy, waiting), "/tmp/nope", "t")
      .isEmpty)
  }
}
