package graft.runner

import org.apache.spark.sql.SparkSession

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import graft.pipeline.Pipeline
import graft.runner.Runner._

/** The reference's orchestration loop (SURVEY §3 steps 1–8) as one
  * driver-side runner: file arrivals → debounce into batch chunks →
  * single-flight FIFO dispatch → validate job → transform job → status
  * lifecycle, with retry and failure alerting. Replaces five Lambdas, a
  * DynamoDB stream, and a Step Function with ~100 lines around the pure
  * stages — the engine work stays in `Pipeline`/`Kpi`/`Validation`.
  */
object BatchRunner {

  /** S11: pluggable alert sink (reference SNS publisher,
    * `lambda/s3_validation.py:160-177`). */
  trait Alerter { def alert(subject: String, message: String): Unit }
  object LogAlerter extends Alerter {
    private val buf = mutable.ArrayBuffer.empty[(String, String)]
    def alert(subject: String, message: String): Unit =
      synchronized { buf += ((subject, message)) }
    def alerts: Seq[(String, String)] = synchronized(buf.toSeq)
    def clear(): Unit = synchronized(buf.clear())
  }

  final case class BatchChunk(batchId: String, createdAt: Long,
      ordersPaths: Seq[String], itemsPaths: Seq[String],
      productsPath: Option[String], var status: Status = Pending,
      var error: Option[String] = None)

  /** Group debounced file arrivals into batch chunks (T2: the TTL-expiry
    * chunk creator). Files are routed by filename (F5); unroutable files
    * are quarantined conceptually by the caller at ingest time. */
  def toChunk(batchId: String, createdAt: Long, files: Seq[String])
      : BatchChunk = {
    // duplicates dropped up front: the control source is at-least-once,
    // and a path listed twice would be unioned with itself — silently
    // doubling every KPI aggregate downstream. Null entries (a torn
    // control doc's files array can carry them in PERMISSIVE mode) are
    // dropped too — parseFilename(null) would NPE the stream
    val routed = files.filter(_ != null).distinct
      .flatMap(f => parseFilename(f).map(_._1 -> f))
    BatchChunk(batchId, createdAt,
      ordersPaths = routed.collect { case ("orders", f) => f },
      itemsPaths = routed.collect { case ("order_items", f) => f },
      productsPath = routed.collectFirst { case ("products", f) => f })
  }

  /** A registered file arrival: path + arrival time + arrival date (the
    * reference's DynamoDB file-metadata row, s3_validation.py:82-94). */
  final case class Arrival(path: String, arrivalTs: Long, arrivalDate: String)

  /** T5 `latest_products` routing (reference `lambda/s3_validation.py:74-79`):
    * the debounce group key for an arrival. Products files route to the
    * FIXED `latest_products` group — they never debounce with (or anchor)
    * a date batch; everything else groups by arrival date. */
  def groupKey(path: String, arrivalDate: String): String =
    parseFilename(path) match {
      case Some(("products", _)) => "latest_products"
      case _ => arrivalDate
    }

  /** Assemble batch chunks from keyed arrivals, reference-faithfully:
    * orders/items arrivals debounce per DATE group under the anchored
    * window ([[graft.streaming.Debounce.assign]] — first arrival anchors,
    * window from the anchor); products arrivals sit in the fixed
    * `latest_products` group, and every assembled chunk picks up the
    * latest products file STANDING WHEN ITS DEBOUNCE WINDOW CLOSED
    * (`arrivalTs <= batchStart + windowSec`) — a products file joins the
    * current batch regardless of which date it arrived in, but never
    * leaks BACKWARD into a batch whose window had already closed before
    * it arrived, so replaying historical arrivals reproduces what the
    * live run processed (each batch saw the products file of its own
    * processing instant, reference `lambda/s3_validation.py:74-79`). */
  def assembleChunks(arrivals: Seq[Arrival], windowSec: Long)
      : Seq[BatchChunk] = {
    val (products, dated) = arrivals.partition(a =>
      groupKey(a.path, a.arrivalDate) == "latest_products")
    val productsSorted = products.sortBy(a => (a.arrivalTs, a.path))
    dated.groupBy(_.arrivalDate).toSeq.sortBy(_._1).flatMap {
      case (date, as) =>
        val sorted = as.sortBy(a => (a.arrivalTs, a.path))
        val assigned =
          graft.streaming.Debounce.assign(sorted.map(_.arrivalTs), windowSec)
        sorted.zip(assigned).groupBy(_._2.batchStart).toSeq.sortBy(_._1)
          .map { case (start, group) =>
            // dated groups can never carry a products file (groupKey
            // routes every products arrival to `latest_products`), so
            // the standing-products backfill applies unconditionally
            toChunk(s"$date-$start", start, group.map(_._1.path))
              .copy(productsPath = productsSorted
                .filter(_.arrivalTs <= start + windowSec)
                .lastOption.map(_.path))
          }
    }
  }

  /** One controller tick (T4): if nothing is processing, pick the FIFO-
    * earliest pending chunk and run it through validate → transform with
    * the Step Function's retry policy (T7). Returns the chunk it ran. */
  def tick(spark: SparkSession, chunks: Seq[BatchChunk], workDir: String,
      now: String, alerter: Alerter = LogAlerter,
      retries: Int = 3, retryIntervalMs: Long = 10L): Option[BatchChunk] = {
    val asRunner = chunks.map(c => Chunk(c.batchId, c.createdAt, c.status))
    Runner.nextChunk(asRunner).map { picked =>
      val chunk = chunks.find(_.batchId == picked.batchId).get
      chunk.status = transition(chunk.status, Processing)
        .getOrElse(chunk.status)
      val result = Runner.withRetry(retries, retryIntervalMs) { () =>
        val res = Pipeline.validateJob(spark, chunk.ordersPaths,
          chunk.itemsPaths, chunk.productsPath,
          s"$workDir/validated/${chunk.batchId}",
          s"$workDir/results/${chunk.batchId}.json")
        if (res.status != "success")
          // a failed validation VERDICT is deterministic — re-running the
          // null/RI jobs cannot change it, so it must not burn the retry
          // budget (retries are for transient faults)
          throw new Runner.NonRetryableFailure(
            s"${res.errorType.getOrElse("UNKNOWN")}: " +
              res.message.getOrElse(""))
        // inter-stage handoff: the validation result's processing_date
        // feeds the transform (stepfunction.json:158-173)
        Pipeline.transformJob(spark,
          s"$workDir/validated/${chunk.batchId}",
          res.processingDate.get, s"$workDir/store", now)
        res
      }
      result match {
        case scala.util.Success(_) =>
          chunk.status = transition(chunk.status, Done).getOrElse(chunk.status)
        case scala.util.Failure(e) =>
          chunk.status =
            transition(chunk.status, FailedStatus).getOrElse(chunk.status)
          chunk.error = Some(e.getMessage)
          alerter.alert(s"batch ${chunk.batchId} failed", e.getMessage)
      }
      chunk
    }
  }

  /** Drain the queue: tick until no pending chunks remain (single-flight —
    * strictly one chunk in flight at a time, FIFO by createdAt). */
  def drain(spark: SparkSession, chunks: Seq[BatchChunk], workDir: String,
      now: String, alerter: Alerter = LogAlerter): Seq[BatchChunk] = {
    while (tick(spark, chunks, workDir, now, alerter).nonEmpty) ()
    chunks
  }

  /** Handle on a running [[streamChunks]] query: live views of the chunk
    * queue and the order batches were dispatched in. */
  final case class ChunkStream(query: org.apache.spark.sql.streaming.StreamingQuery,
      chunks: () => Seq[BatchChunk], processed: () => Seq[String])

  // ---- durable batch-status store (the DynamoDB metadata-table analogue,
  // reference readme.md:25-53 / confirm_status.py): one JSON doc per batch
  // recording its TERMINAL status. Without it a restart must re-run every
  // redelivered batch and lean on the store merge's idempotence — correct,
  // but recovery cost grows with history; with it, completed batches are
  // rehydrated and skipped, so recovery cost is O(unfinished). Only
  // terminal states persist: a crash mid-processing leaves no (or a
  // pending) record and the batch re-runs — the idempotent merge makes
  // the re-run exactly-once, same as the reference's retry path. Failed
  // batches rehydrate as FAILED (no silent auto-retry on restart; the
  // reference's lifecycle re-queues them explicitly, T6). Driver-side
  // control metadata, same altitude as the control docs themselves.

  /** Full JSON string escaping (quotes, backslash, control chars) — a
    * failed batch's error message routinely carries newlines (Spark
    * exception + plan dump) and must still produce a valid JSON doc. */
  private def jsonStr(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case ch if ch < ' ' => f"\\u${ch.toInt}%04x"
      case ch => ch.toString
    }.mkString("\"", "", "\"")

  private def writeStatus(dir: String, c: BatchChunk): Unit = {
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    val err = c.error.map(jsonStr).getOrElse("null")
    java.nio.file.Files.writeString(p.resolve(s"${c.batchId}.json"),
      s"""{"batch_id": ${jsonStr(c.batchId)}, "status": "${c.status.name}", """ +
        s""""error": $err}""")
    ()
  }

  private val JsonEsc = """\\u([0-9a-fA-F]{4})|\\(.)""".r
  private def unescape(s: String): String = JsonEsc.replaceAllIn(s, m =>
    scala.util.matching.Regex.quoteReplacement(
      if (m.group(1) != null) Integer.parseInt(m.group(1), 16).toChar.toString
      else m.group(2) match {
        case "n" => "\n"; case "r" => "\r"; case "t" => "\t"; case c => c
      }))

  private def readStatuses(dir: String): Map[String, (Status, Option[String])] = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) Map.empty
    else {
      val files = java.nio.file.Files.list(p)
      // every per-file read/parse failure degrades to "non-terminal":
      // a torn write, stray subdirectory, or non-UTF-8 byte must mean
      // "re-run this batch" (idempotent), never a restart crash loop —
      // this store exists FOR crash recovery
      try files.iterator().asScala
        .filter(_.toString.endsWith(".json"))
        .flatMap { f =>
          scala.util.Try {
            val txt = java.nio.file.Files.readString(f)
            val field = (n: String) =>
              ("\"" + n + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
                .findFirstMatchIn(txt).map(m => unescape(m.group(1)))
            (field("batch_id"), field("status"), field("error"))
          }.toOption.flatMap {
            case (Some(i), Some("done"), _) => Some(i -> (Done: Status, None))
            case (Some(i), Some("failed"), e) =>
              Some(i -> (FailedStatus: Status, e))
            case _ => None // non-terminal or torn record: re-run (idempotent)
          }
        }.toMap
      finally files.close()
    }
  }

  /** T3 as a Structured Stream: the control table is a file-source stream
    * of chunk rows (`{"batch_id":…, "created_at":…, "files":[…]}` JSON docs
    * — the DynamoDB-Streams analogue, reference `lambda/lab6-ttl.py:44-112`),
    * and each micro-batch folds newly arrived chunks into the queue, then
    * drains it via [[tick]] — FIFO, single-flight, same retry/alerting.
    *
    * The per-batch `collect()` is control METADATA (a handful of chunk
    * descriptors), not data — the same altitude as the reference's Lambda
    * event payloads; the heavy lifting stays inside the validate/transform
    * jobs the tick dispatches.
    *
    * `statusDir` (optional) enables the durable batch-status store (see
    * above): terminal statuses persist per batch and rehydrate on
    * restart, so recovery re-runs only unfinished work instead of the
    * whole redelivered history. Without it, restart correctness still
    * holds via redelivery + the store merge's idempotence (the capstone
    * spec pins both paths). */
  def streamChunks(spark: SparkSession, controlDir: String, workDir: String,
      now: String, alerter: Alerter = LogAlerter,
      statusDir: Option[String] = None): ChunkStream = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("batch_id", StringType),
      StructField("created_at", LongType),
      StructField("files", ArrayType(StringType))))
    val queue = mutable.ArrayBuffer.empty[BatchChunk]
    val processed = mutable.ArrayBuffer.empty[String]
    // rehydrate terminal statuses ONCE at start: a redelivered chunk whose
    // batch already finished enqueues Done/Failed and is never re-run
    val terminal = statusDir.map(readStatuses).getOrElse(Map.empty)
    val query = spark.readStream.schema(schema).json(controlDir)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        // a torn/malformed control doc parses to an all-null row under
        // the json source's PERMISSIVE default — it must be SKIPPED, not
        // NPE the foreachBatch (which would kill the stream and, since a
        // restart re-reads the same file, crash-loop). Skipped docs
        // surface on restart redelivery once the producer finishes the
        // write (producers publish control docs atomically; a corrupt
        // one is inert). Same hardening discipline as readStatuses.
        val fresh = df.collect().toSeq.filter { r =>
          !r.isNullAt(r.fieldIndex("batch_id")) &&
            !r.isNullAt(r.fieldIndex("created_at")) &&
            !r.isNullAt(r.fieldIndex("files"))
        }.map { r =>
          val c = toChunk(r.getAs[String]("batch_id"),
            r.getAs[Long]("created_at"),
            r.getSeq[String](r.fieldIndex("files")))
          terminal.get(c.batchId).foreach { case (st, err) =>
            c.status = st
            c.error = err
          }
          c
        }
        // idempotent enqueue: the control source is at-least-once (stream
        // retries, re-delivered docs), and a duplicate batch_id would
        // otherwise sit Pending forever — tick resolves chunks by id, so
        // the duplicate could never transition and the drain loop below
        // would spin re-running the same batch
        queue.synchronized {
          val known = queue.map(_.batchId).toSet
          queue ++= fresh.filterNot(c => known.contains(c.batchId))
            .distinctBy(_.batchId)
        }
        var ran = tick(spark, queue.toSeq, workDir, now, alerter)
        while (ran.nonEmpty) {
          processed.synchronized { processed += ran.get.batchId }
          statusDir.foreach(writeStatus(_, ran.get))
          ran = tick(spark, queue.toSeq, workDir, now, alerter)
        }
      }
      .start()
    ChunkStream(query,
      () => queue.synchronized(queue.toSeq),
      () => processed.synchronized(processed.toSeq))
  }
}
