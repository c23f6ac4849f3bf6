package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.io.Sources
import graft.kpi.Kpi
import graft.merge.KpiMerge
import graft.schema.Schemas
import graft.validate.Validation

/** E60: optimistic-concurrency conflict on the epoch-manifest store — a
  * concurrent writer committed between this writer's snapshot read and its
  * commit (or published the same manifest epoch first). The batch that
  * sees it has NOT modified the store (clean abort) unless the message
  * says otherwise; re-running merges against the new snapshot. The Delta
  * `ConcurrentModificationException` analogue. */
class StoreConflictException(msg: String)
  extends IllegalStateException(msg)

/** A live concurrent writer holds the store's commit lease — this batch
  * aborted CLEAN before touching the store (temp dir removed). Retry
  * after the holder commits; the retry re-merges against the new
  * snapshot via the normal CAS path. Subtype of
  * [[StoreConflictException]] so one catch-and-retry loop handles both
  * the optimistic (epoch moved) and pessimistic (lease held) abort. */
final class StoreLeaseHeldException(msg: String)
  extends StoreConflictException(msg)

/** The reference's two job entry points as library functions
  * (SURVEY.md §3): `Ingest → Validate → Conform` ≙
  * `scripts/validation.py main()` and `Kpi → Merge` ≙
  * `scripts/transformation.py compute_and_store_kpis()` — pure
  * `DataFrame → DataFrame` stages inside, driver-side control flow here.
  * A user of the reference runs the same two steps with the same inputs,
  * outputs, result docs, and error taxonomy — minus the AWS glue.
  */
object Pipeline {

  final case class ValidateResult(status: String, processingDate: Option[String],
      errorType: Option[String], message: Option[String])

  /** Validation job (reference `scripts/validation.py:145-219`):
    * union multi-part inputs, null gate, RI gate, extract processing date,
    * write validated tables partitioned by `dt`, emit the result doc.
    *
    * One agg job per table for nulls + one anti-join per FK — the fused
    * formulation (§2.4 A6), not the reference's job-per-column loop.
    */
  def validateJob(spark: SparkSession,
      ordersPaths: Seq[String], itemsPaths: Seq[String],
      productsPath: Option[String], outBase: String,
      resultPath: String, anyFirstRowDate: Boolean = false,
      allStringsCompat: Boolean = false): ValidateResult = {

    // §1.2 compat: the reference reads headered, schema-less CSV — every
    // column a string. The validation gates (try_cast null/NaN parity, RI
    // anti-joins on string keys, substring date extraction) are written to
    // behave identically on the stringly-typed frames, so the same error
    // taxonomy comes out of either mode (PipelineSpec pins this verbatim).
    def schemaFor(s: StructType): StructType =
      if (allStringsCompat) Schemas.allStrings(s) else s

    def emit(r: ValidateResult): ValidateResult = {
      Sources.writeResultJson(resultPath,
        Map("status" -> r.status) ++
          r.processingDate.map("processing_date" -> _) ++
          r.errorType.map("error_type" -> _) ++
          r.message.map("message" -> _))
      r
    }

    try {
      val orders = Sources.readAndUnion(spark,
        ordersPaths.map(Sources.normalizeScheme), Some(schemaFor(Schemas.orders)))
      val items = Sources.readAndUnion(spark,
        itemsPaths.map(Sources.normalizeScheme),
        Some(schemaFor(Schemas.orderItems)))
      val products = productsPath.map(p =>
        Sources.readParquetOrCsv(spark, Sources.normalizeScheme(p),
          Some(schemaFor(Schemas.products))))

      (orders, items) match {
        case (Some(o), Some(i)) =>
          Validation.validate(o, i, products, Schemas.requiredNonNull) match {
            case Some(err) =>
              emit(ValidateResult("failed", None, Some(err.errorType),
                Some(err.message)))
            case None =>
              // W1: the processing date. Default is the DETERMINISTIC
              // min(created_at)[:10]; `anyFirstRowDate` preserves the
              // reference's `first()["created_at"][:10]` behavior
              // (validation.py:191) — whichever row the scan yields first,
              // nondeterministic under parallel reads — as a compat flag.
              val dt =
                if (anyFirstRowDate)
                  o.select(substring(col("created_at"), 1, 10))
                    .head().getString(0)
                else
                  o.agg(substring(min(col("created_at")), 1, 10))
                    .head().getString(0)
              Sources.writePartitioned(o, s"$outBase/orders", dt)
              Sources.writePartitioned(i, s"$outBase/order_items", dt)
              products.foreach(p =>
                Sources.writeUnpartitioned(p, s"$outBase/products"))
              emit(ValidateResult("success", Some(dt), None, None))
          }
        case _ =>
          emit(ValidateResult("failed", None, Some("UNKNOWN"),
            Some("orders and order_items inputs are required")))
      }
    } catch {
      case e: Exception =>
        emit(ValidateResult("failed", None, Some("UNKNOWN"),
          Some(Option(e.getMessage).getOrElse(e.getClass.getName))))
    }
  }

  /** S9: read the KPI store table, or an empty frame with the right schema
    * when absent (first run) — the `create_table_if_not_exists` analogue.
    * The explicit schema also pins the partition column's type (partition
    * dirs would otherwise infer `order_date=2024-06-01` as DATE, not
    * STRING).
    *
    * Manifest-aware snapshot read: when the store carries a commit
    * manifest ([[upsertStore]] writes one per batch), only
    * manifest-listed partitions are visible, and while a swap of the
    * manifest's epoch is in flight (`.bak/_epoch` == manifest epoch) the
    * pre-swap `.bak` copy of each swapped partition is read instead of
    * the half-replaced store dir. A reader that RESOLVES the store at any
    * instant — including concurrently with a crashed multi-date swap —
    * therefore sees exactly the last COMMITTED batch: partially-swapped
    * dates come from `.bak`, not-yet-committed new dates are invisible.
    * Stores without a manifest (validated tables, pre-manifest stores)
    * read raw, as before.
    *
    * Concurrency contract vs a LIVE writer (writers themselves are
    * serialized by the single-flight runner, T4): resolution re-reads the
    * manifest after planning and retries if the epoch moved, so the
    * returned plan is always pinned to ONE committed snapshot; and because
    * a committing writer defers `.bak` deletion to the START of the next
    * batch ([[upsertStore]] step 4), the snapshot's `.bak` copies outlive
    * the commit that supersedes them — a reader mid-scan never has its
    * files deleted by the commit itself. The residual race is a scan still
    * MATERIALIZING when the *next* batch starts swapping the same
    * partitions; renamed-away files then fail the scan loudly
    * (FileNotFoundException — never a torn row mix). There is no
    * automatic retry at that level: the error propagates to whoever ran
    * the action, and calling readOrInit again resolves the new committed
    * snapshot cleanly. */
  def readOrInit(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(Sources.normalizeScheme(path)),
      spark.sparkContext.hadoopConfiguration)
    var attempts = 0
    while (true) {
      val before = latestManifest(fs, path)
      val resolved = resolveSnapshot(spark, fs, path, schema, before)
      // re-validate: a live writer may have committed between the manifest
      // read and the listing/`.bak` probes inside resolveSnapshot; equal
      // epochs on both sides pin the whole plan to one snapshot
      if (latestManifest(fs, path).map(_.epoch) == before.map(_.epoch))
        return resolved
      attempts += 1
      if (attempts >= 5)
        throw new IllegalStateException(
          s"store $path: manifest epoch kept moving across $attempts " +
            "resolution attempts — writer is committing faster than a " +
            "reader can plan")
    }
    sys.error("unreachable")
  }

  private def resolveSnapshot(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      schema: StructType,
      manifest: Option[StoreManifest]): DataFrame = {
    val raw = rawReadOrInit(spark, path, schema)
    manifest match {
      case None => raw
      case Some(m) =>
        val partCol = m.partCol
        val committed =
          if (m.partitions.isEmpty) raw.limit(0)
          else raw.where(col(partCol).isin(m.partitions: _*))
        // .bak copies are authoritative ONLY for an in-flight swap over
        // THIS manifest's snapshot; a stale .bak (epoch older than the
        // manifest — the post-commit, pre-cleanup window) is ignored.
        val bakParts =
          if (bakEpoch(fs, path).contains(m.epoch))
            listPartitionDirs(fs, path + ".bak", partCol)
              .filter(m.partitions.toSet)
          else Nil
        if (bakParts.isEmpty) committed
        else {
          val dataSchema = StructType(schema.filterNot(_.name == partCol))
          val live = committed.where(!col(partCol).isin(bakParts: _*))
          val fromBak = bakParts.map { pv =>
            spark.read.schema(dataSchema)
              .parquet(s"$path.bak/$partCol=$pv")
              .withColumn(partCol, lit(pv))
              .select(schema.fieldNames.map(col): _*)
          }
          fromBak.foldLeft(live)(_ unionByName _)
        }
    }
  }

  private def rawReadOrInit(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    // ONLY a genuinely absent store (first run) may fall back to the
    // empty frame. A blanket Try here once swallowed transient FS errors
    // (S3 throttle, listing hiccup) as "empty store" — the merge would
    // then run against nothing and the partition swap would silently and
    // durably DELETE every pre-existing row of the touched dates whose
    // key wasn't in that batch. Existence is checked explicitly; any
    // other failure propagates and aborts the batch (the safe outcome).
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(Sources.normalizeScheme(path)),
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(Sources.normalizeScheme(path))))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(path)
  }

  /** E59: store TIME TRAVEL — read the store exactly as it was at
    * committed `epoch` (the Delta `VERSION AS OF` analogue over the epoch
    * manifests). Historical manifests persist for [[ManifestsToKeep]]
    * epochs behind the current one; the partition content each commit
    * replaced is archived under `<store>.hist/<epoch>/` (see
    * [[restoreBackups]]) instead of deleted.
    *
    * Resolution, per partition of the target manifest: pick the SMALLEST
    * archived version with stamp h ≥ epoch — `.hist/<h>` (or a pending
    * `.bak` at its stamp, the not-yet-archived newest case) holds that
    * partition's content AS OF epoch h, and no h' with epoch ≤ h' < h
    * existing means the partition was untouched between the two, so the
    * content at h IS the content at `epoch`. No archived version ⇒ the
    * partition was never rewritten after `epoch` and the live dir is
    * exact. A partition that can't be resolved anywhere (expired by
    * [[retentionSweep]] and GC'd) FAILS LOUD — time travel never silently
    * returns a partial snapshot.
    *
    * Listing cost is manifest partitions × archived epochs (driver-side
    * metadata, same altitude as the touched-dates collect); the data read
    * is one scan of exactly the snapshot's dirs. */
  def readAt(spark: SparkSession, path: String, epoch: Long,
      schema: StructType): DataFrame = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(Sources.normalizeScheme(path)),
      spark.sparkContext.hadoopConfiguration)
    val m = manifestAt(fs, path, epoch).getOrElse(
      throw new IllegalStateException(
        s"store $path: no manifest for epoch $epoch — it is outside the " +
          s"$manifestsToKeep-epoch time-travel window or was never " +
          "committed"))
    val partCol = m.partCol
    if (m.partitions.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val dataSchema = StructType(schema.filterNot(_.name == partCol))
    val histRoot = new HPath(path + ".hist")
    val histEpochs =
      if (!fs.exists(histRoot)) Nil
      else fs.listStatus(histRoot).toSeq
        .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
    // version roots with stamp ≥ target, smallest stamp first
    val candidates = (histEpochs.map(h => h -> s"$path.hist/$h") ++
      bakEpoch(fs, path).map(e => e -> s"$path.bak"))
      .filter(_._1 >= epoch).sortBy(_._1)
    val resolved = m.partitions.map { pv =>
      pv -> candidates.collectFirst {
        case (_, root) if fs.exists(new HPath(root, s"$partCol=$pv")) =>
          s"$root/$partCol=$pv"
      }
    }
    val missing = resolved.collect {
      case (pv, None) if !fs.exists(new HPath(path, s"$partCol=$pv")) => pv
    }
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"store $path: epoch $epoch is no longer reconstructable — " +
          s"partition(s) ${missing.mkString(", ")} expired by retention")
    val livePv = resolved.collect { case (pv, None) => pv }
    val live =
      if (livePv.isEmpty) Nil
      else Seq(spark.read.schema(schema).parquet(path)
        .where(col(partCol).isin(livePv: _*)))
    val versioned = resolved.collect { case (pv, Some(dir)) =>
      spark.read.schema(dataSchema).parquet(dir)
        .withColumn(partCol, lit(pv))
        .select(schema.fieldNames.map(col): _*)
    }
    (live ++ versioned).reduce(_ unionByName _)
  }

  private def catSchema = StructType.fromDDL(
    "category STRING, order_date STRING, daily_revenue DOUBLE, " +
      "avg_order_value DOUBLE, avg_return_rate DOUBLE, " +
      "data_sources ARRAY<STRING>, last_updated STRING")
  private def ordSchema = StructType.fromDDL(
    "order_date STRING, total_orders BIGINT, total_revenue DOUBLE, " +
      "total_items_sold BIGINT, return_rate DOUBLE, unique_customers BIGINT, " +
      "data_sources ARRAY<STRING>, last_updated STRING")

  /** Transformation job (reference `scripts/transformation.py:121-260`):
    * read validated tables, availability-branch the KPI families, and
    * merge-upsert into the parquet KPI store (the DynamoDB analogue).
    *
    * `now` is injected for deterministic `last_updated` stamps. Reads prune
    * to the processing date's partition (`dt = processingDate`) — the
    * scale-correct tightening of the reference's full-base-path read,
    * SURVEY §4 row 2.
    */
  def transformJob(spark: SparkSession, validatedBase: String,
      processingDate: String, storeBase: String, now: String,
      pruneToDate: Boolean = true): (Long, Long) = {

    def readValidated(name: String): Option[DataFrame] =
      Sources.readTable(spark, s"$validatedBase/$name")
        .map(df => if (pruneToDate && df.columns.contains("dt"))
          df.where(col("dt") === processingDate) else df)

    val orders = readValidated("orders")
    val items = readValidated("order_items")
    val products = Sources.readTable(spark, s"$validatedBase/products")

    val sources: Seq[String] =
      (if (orders.nonEmpty) Seq("orders") else Nil) ++
        (if (items.nonEmpty) Seq("order_items") else Nil)

    val (catKpi, ordKpi) = Kpi.computeKpis(orders, items, products)

    // last_updated rides through the merge as a regular coalesced field:
    // updated rows get `now`, untouched target rows keep their old stamp
    // (reference helperfunction.py:73-78,121-125)
    val catRows = catKpi.map { k =>
      val updates = k
        .withColumn("order_date", lit(processingDate))
        .withColumn("data_sources", typedLit(sources))
        .withColumn("last_updated", lit(now))
        .select(catSchema.fieldNames.map(col): _*)
      upsertStore(spark, s"$storeBase/category_kpi", catSchema, updates,
        Seq("category", "order_date"),
        Seq("daily_revenue", "avg_order_value", "avg_return_rate",
          "last_updated"))
    }.getOrElse(0L)

    val ordRows = ordKpi.map { k =>
      val updates = k
        .withColumn("order_date", lit(processingDate))
        .withColumn("data_sources", typedLit(sources))
        .withColumn("last_updated", lit(now))
        .select(ordSchema.fieldNames.map(col): _*)
      upsertStore(spark, s"$storeBase/order_kpi", ordSchema, updates,
        Seq("order_date"),
        Seq("total_orders", "total_revenue", "total_items_sold",
          "return_rate", "unique_customers", "last_updated"))
    }.getOrElse(0L)

    (catRows, ordRows)
  }

  /** Incremental store merge — the Delta-`MERGE INTO` analogue without
    * Delta jars. The store is PARTITIONED by `order_date`; a batch's
    * updates name a handful of dates (normally one), so the merge:
    *
    *  1. reads ONLY the touched partitions of the store (partition-pruned),
    *  2. full-outer merges them with the updates ([[KpiMerge.merge]]),
    *  3. writes the merged partitions to a sibling temp dir,
    *  4. swaps just those partition directories into the store.
    *
    * Untouched partitions are never read, rewritten, or moved — per-batch
    * I/O is O(touched dates), not O(store), which is what keeps a daily
    * merge viable against 100 TB of KPI history (the previous full-store
    * rewrite was O(store) per batch). The swap is the manual form of
    * dynamic partition overwrite; done via rename so a crash mid-swap
    * leaves a recoverable `.bak`, never a deleted store (the
    * delete-then-rename form had a window where the store was gone).
    *
    * Each batch COMMITS by publishing a `_manifest.<epoch>` file after all
    * swaps (see the commit-protocol comment below) — the transaction-log
    * analogue that gives manifest-aware readers ([[readOrInit]]) snapshot
    * isolation across the multi-date swap window; a reader resolving the
    * store mid-swap or after a crash sees the previous committed batch in
    * full, never date A new + date B old.
    *
    * The touched-dates collect is bounded by dates-per-batch (not data
    * size) — same centroid-shipping rationale as IVF's seed collect.
    *
    * @return total rows in the store after the merge (result-doc metadata;
    *         a parquet count touches footers only)
    */
  private[graft] def upsertStore(spark: SparkSession, path: String,
      schema: StructType, updates: DataFrame, keys: Seq[String],
      fields: Seq[String], partCol: String = "order_date",
      expectedEpoch: Option[Long] = None,
      leaseTtlMs: Long = DefaultLeaseTtlMs): Long = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}

    val fsPre = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(Sources.normalizeScheme(path)),
      spark.sparkContext.hadoopConfiguration)
    // a crashed forgetKeys leaves a durable tombstone ([[forgetKeys]]'s
    // crash contract); finish that erasure BEFORE this batch merges.
    // The recovery sweep inside runs UNDER the commit lease
    // ([[recoverUnderLease]]) — a live holder's in-flight swap must turn
    // this batch away clean here, not be "recovered" out from under it.
    completePendingForget(spark, path, schema, partCol)

    // Optimistic concurrency (the Delta conflict-detection analogue over
    // the epoch manifest): the merge below is read-modify-write against
    // ONE manifest epoch, so a commit by anyone else between our plan and
    // our commit would silently lose their update. Pin the base epoch here
    // (or take the caller's — the CAS form an orchestrator uses: "commit
    // only if the store is still at the epoch I read"), and re-check it at
    // every mutation boundary; a moved epoch aborts CLEAN (temp dir only,
    // store untouched) with [[StoreConflictException]], and the retry
    // re-merges against the new snapshot. The commit section itself is
    // EXCLUSIVE under the `_lease` put-if-absent arbiter (see the commit
    // lease block below): racing swaps past the entry check can no longer
    // interleave, a live holder turns the second writer away clean
    // ([[StoreLeaseHeldException]]), a crashed holder is taken over by
    // epoch/TTL fencing, and the write-once manifest publish remains the
    // final backstop beneath all of it.
    val planEpoch = latestManifest(fsPre, path).map(_.epoch).getOrElse(0L)
    val baseEpoch = expectedEpoch.getOrElse(planEpoch)
    def conflictCheck(stage: String): Unit = {
      val now = latestManifest(fsPre, path).map(_.epoch).getOrElse(0L)
      if (now != baseEpoch)
        throw new StoreConflictException(
          s"store $path: manifest epoch moved $baseEpoch -> $now ($stage)" +
            " — a concurrent writer committed; this batch merged against a" +
            " stale snapshot and was aborted cleanly. Re-run to merge" +
            " against the new snapshot.")
    }
    conflictCheck("before planning")

    // `updates` is evaluated twice (touched-dates collect + merge write);
    // persist so the upstream KPI aggregation runs once per store
    val updatesP = updates.persist()
    val dates = updatesP.select(col(partCol)).distinct()
      .collect().map(_.getString(0)).sorted
    val target = readOrInit(spark, path, schema)
      .where(col(partCol).isin(dates: _*))
    val merged = KpiMerge.merge(target, updatesP, keys, fields,
      Some("data_sources")).select(schema.fieldNames.map(col): _*)

    // PER-WRITER staging dir (round-9 review): a shared `.tmp` let a
    // second writer clobber the live lease holder's staged commit data
    // before it even attempted the lease. Unique names make staging
    // race-free; crashed writers' orphans are GC'd under the lease below.
    val tmp = stagingDir(path)
    val fs = FileSystem.get(new java.net.URI(Sources.normalizeScheme(path)),
      spark.sparkContext.hadoopConfiguration)
    // the merge plan reads the store partitions being replaced, so write
    // to the temp dir first (finishes the read), then swap directories
    try merged.write.mode("overwrite").partitionBy(partCol).parquet(tmp)
    catch { case e: Throwable => updatesP.unpersist(); throw e }
    // commit-section entry: last clean-abort point (nothing in the store
    // has been touched yet — only the temp dir exists). The lease makes
    // the section EXCLUSIVE (two writers passing the epoch check together
    // can no longer interleave their dir swaps); the epoch re-check under
    // the lease then closes the plan→commit CAS window with no writer
    // racing it.
    val lease =
      try acquireStoreLease(fs, path, baseEpoch, leaseTtlMs)
      catch { case e: Throwable =>
        fs.delete(new HPath(tmp), true)
        updatesP.unpersist()
        throw e
      }
    try conflictCheck("at commit")
    catch { case e: Throwable =>
      fs.delete(new HPath(tmp), true)
      updatesP.unpersist()
      releaseStoreLease(fs, path, lease)
      throw e
    }

    // Commit protocol (reader isolation — see readOrInit's scaladoc):
    //  1. stamp `.bak/_epoch` with the CURRENT manifest epoch, so readers
    //     know the backups about to appear belong to an in-flight swap
    //     over that snapshot (and not to an already-committed one),
    //  2. swap the touched partition dirs (old copies land in `.bak`),
    //  3. COMMIT: atomically publish `_manifest.<epoch+1>` listing every
    //     committed partition — the single instant the batch becomes
    //     visible; readers before it resolve `.bak`, readers after it see
    //     the new dirs and ignore the now-stale `.bak`,
    //  4. clean up old manifests. `.bak` deletion is DEFERRED to the
    //     start of the NEXT batch (restoreBackups sweeps a stale one):
    //     deleting it here would yank files out from under a live reader
    //     that resolved the pre-commit snapshot and is still scanning its
    //     bak-preferred plan. The stale `.bak` (epoch < new manifest) is
    //     ignored by every later reader.
    // A crash at any point leaves either epoch N fully readable (steps
    // 1–2: bak-preferred; uncommitted new dates unlisted) or epoch N+1
    // fully readable (steps 3–4), never a torn mix.
    // the cached updates must not outlive ANY exit from the commit
    // section — in particular the write-once publish throwing
    // StoreConflictException (the documented catch-and-retry path would
    // otherwise strand one cached relation per conflict)
    try {
      // orphan staging dirs from crashed writers (unique-named): GC'd
      // here UNDER the lease, and only past the TTL, so no live writer's
      // in-progress staging is ever yanked (a writer that stages longer
      // than the TTL loses its swap to renameOrFail and aborts clean —
      // the same bound every other liveness decision uses)
      sweepOrphanStaging(fs, path, exclude = tmp, ttlMs = leaseTtlMs)
      val curManifest = latestManifest(fs, path)
      // pinned by conflictCheck("at commit") just above
      val curEpoch = baseEpoch
      // bootstrap a pre-manifest store's partition list from its dirs
      val baseParts = curManifest.map(_.partitions)
        .getOrElse(listPartitionDirs(fs, path, partCol))
      // post-merge store size in O(touched), not O(store): the previous
      // total rides the manifest (#rows; one full-count fallback on a
      // legacy/swept manifest), the touched partitions are counted
      // pre-swap, and the replacement rows come from the written temp
      // dir's footers — the result is carried forward on the new
      // manifest, so per-batch cost never grows with store age
      val prevTotal = curManifest.flatMap(_.rows)
        .getOrElse(readOrInit(spark, path, schema).count())
      val prevTouched = target.count()
      val tmpRows = spark.read.schema(schema).parquet(tmp).count()
      val newTotal = prevTotal - prevTouched + tmpRows
      writeBakEpoch(fs, path, curEpoch)
      dates.foreach { dt =>
        swapDir(fs, new HPath(s"$tmp/$partCol=$dt"),
          new HPath(s"$path/$partCol=$dt"),
          // backups live OUTSIDE the store dir — a `order_date=X.bak` dir
          // inside it would be picked up by partition discovery
          new HPath(s"$path.bak/$partCol=$dt"))
      }
      fs.delete(new HPath(tmp), true)
      // fencing check: a takeover (stale-lease break by a writer that
      // judged us dead) must stop us HERE — publishing after being
      // fenced out could overwrite the successor's commit
      verifyStoreLease(fs, path, lease)
      writeManifest(fs, path, curEpoch + 1, partCol,
        (baseParts ++ dates).distinct.sorted, rows = Some(newTotal))
      dropOldManifests(fs, path, current = curEpoch + 1)
      // no `.bak` delete here — see step 4 of the commit protocol above
      newTotal
    } finally {
      updatesP.unpersist()
      releaseStoreLease(fs, path, lease)
    }
  }

  /** E100: keyed HARD DELETE over the store — the "right to be
    * forgotten" operator a lake under GDPR/CCPA needs: remove every row
    * matching `keyValues` from the CURRENT snapshot via the same
    * epoch-commit protocol as the batch merge (touched partitions
    * rewritten by left-anti join, emptied partitions retired from the
    * manifest, one atomic manifest publish), and then COMPLETE the
    * erasure in the version store: `.hist/<epoch>` archived partition
    * copies (the readAt time-travel data) are rewritten dropping the
    * keys, and this batch's own `.bak` copies are deleted immediately —
    * erasure semantics deliberately trump the deferred-`.bak`
    * reader-isolation window for the touched partitions, the same trade
    * Delta makes when VACUUM removes files a straggling reader might
    * still reference.
    *
    * The pass is IDEMPOTENT and crash-restartable: the history purge
    * runs unconditionally (not gated on current-snapshot hits), so a
    * rerun after a crash between the snapshot commit and the history
    * rewrite finishes the job; time travel to pre-delete epochs still
    * works and returns the forgotten keys' partitions WITHOUT their rows.
    *
    * Crash contract (what makes the rerun guaranteed rather than hoped
    * for): before any mutation the keys are recorded durably as a
    * TOMBSTONE — a parquet directory at `<store>.forget.pending` — and
    * the tombstone is cleared only after the history purge completes.
    * While it is outstanding, (a) [[restoreBackups]] DELETES orphan
    * `.bak` copies instead of archiving them to `.hist` (they are the
    * crashed forget's own pre-delete copies and carry the forgotten
    * rows — erasure outranks the time-travel archive, the same trade
    * this operator already makes for its own `.bak` cleanup), and
    * (b) [[upsertStore]] and a fresh `forgetKeys` call complete the
    * pending erasure at entry (same key columns are unioned in; a
    * different key set is finished as its own pass first), so a routine
    * batch after a crash can never silently retain the keys.
    *
    * The `.hist` rewrite itself swaps rename-aside: old dir →
    * `_<dir>.fk.old`, rewritten `_<dir>.fk.tmp` → live name, then the
    * old copy is dropped — a readable copy of the archived partition
    * exists on disk at every instant, and the purge's recovery preamble
    * finishes (or rolls back) any half-done swap a crash left behind.
    *
    * @return (manifest epoch after the call, rows deleted from the
    *         current snapshot)
    */
  def forgetKeys(spark: SparkSession, path: String, schema: StructType,
      keyValues: DataFrame, keys: Seq[String],
      partCol: String = "order_date"): (Long, Long) = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    require(!keys.contains(partCol),
      s"forget keys must be data columns, not the partition column $partCol")
    val fs = FileSystem.get(new java.net.URI(Sources.normalizeScheme(path)),
      spark.sparkContext.hadoopConfiguration)
    // finish a tombstone publish a crash left half-swapped BEFORE looking
    // at the pending dir, so the read below always sees a complete record;
    // the whole recovery sweep (swap promote + backup restore) runs under
    // the commit lease — a live writer's in-flight swap is NOT a crash
    recoverUnderLease(fs, path)
    // outstanding tombstone from a crashed prior forget: same key columns
    // fold into this pass (erasure is idempotent); a different key set is
    // completed as its own pass first, clearing its tombstone
    val pendingDir = new HPath(path + ".forget.pending")
    val requested = keyValues.select(keys.map(col): _*)
    val kvIn =
      if (!fs.exists(pendingDir)) requested
      else {
        val pend = spark.read.parquet(pendingDir.toString)
        if (pend.columns.toSet == keys.toSet)
          requested.unionByName(pend.select(keys.map(col): _*))
        else {
          forgetKeys(spark, path, schema, pend, pend.columns.toSeq, partCol)
          requested
        }
      }
    val baseEpoch = latestManifest(fs, path).map(_.epoch).getOrElse(0L)
    def conflictCheck(stage: String): Unit = {
      val now = latestManifest(fs, path).map(_.epoch).getOrElse(0L)
      if (now != baseEpoch)
        throw new StoreConflictException(
          s"store $path: manifest epoch moved $baseEpoch -> $now ($stage)" +
            " — a concurrent writer committed during the delete; re-run" +
            " against the new snapshot.")
    }
    // durable tombstone BEFORE any mutation: published by RENAME-ASIDE
    // swap (never delete-then-rename — a crash between those two would
    // lose a still-pending prior erasure), so a complete tombstone exists
    // on disk at every instant and a torn write can never masquerade as a
    // valid record. Size is request-grain (the distinct keys of one
    // delete request), not data-grain — a bounded write by construction.
    val pendingTmp = new HPath(path + ".forget.pending.inprogress")
    val pendingOld = new HPath(path + ".forget.pending.old")
    fs.delete(pendingTmp, true)
    kvIn.distinct().coalesce(1).write.parquet(pendingTmp.toString)
    // completeness marker of OUR OWN, created only after the write
    // returns: the committer's `_SUCCESS` depends on
    // mapreduce.fileoutputcommitter.marksuccessfuljobs, which object-store
    // configs commonly disable — without this marker a fully-written
    // tombstone would be treated as torn by [[resolvePendingSwap]] there
    fs.create(new HPath(pendingTmp, "_graft_committed"), true).close()
    if (fs.exists(pendingDir)) { // superseded: its keys are folded in
      fs.delete(pendingOld, true)
      renameOrFail(fs, pendingDir, pendingOld)
    }
    renameOrFail(fs, pendingTmp, pendingDir)
    fs.delete(pendingOld, true)
    // the published tombstone is the authoritative key set: re-reading it
    // (instead of keeping the in-memory union plan alive) means a cache
    // eviction can never recompute through the superseded pending dir
    val kv = spark.read.parquet(pendingDir.toString).persist()
    try {
      val snapshot = readOrInit(spark, path, schema)
      val touched = snapshot.join(kv, keys, "left_semi")
      val deleted = touched.count()
      var epoch = baseEpoch
      if (deleted > 0L) {
        val dates = touched.select(col(partCol)).distinct()
          .collect().map(_.getString(0)).sorted.toSeq
        val remaining = snapshot.where(col(partCol).isin(dates: _*))
          .join(kv, keys, "left_anti")
          .select(schema.fieldNames.map(col): _*)
        val tmp = stagingDir(path) // per-writer, as in upsertStore
        remaining.write.mode("overwrite").partitionBy(partCol).parquet(tmp)
        // a fully-emptied partition writes no dir — it is RETIRED from
        // the manifest rather than swapped
        val present = listPartitionDirs(fs, tmp, partCol)
        val emptied = dates.diff(present)
        // same commit-section discipline as the batch merge: lease first
        // (exclusive section), epoch re-check under it, fencing check
        // before the publish
        val lease =
          try acquireStoreLease(fs, path, baseEpoch)
          catch { case e: Throwable =>
            fs.delete(new HPath(tmp), true)
            throw e
          }
        try {
          conflictCheck("at commit")
          sweepOrphanStaging(fs, path, exclude = tmp,
            ttlMs = DefaultLeaseTtlMs)
          val baseParts = latestManifest(fs, path).map(_.partitions)
            .getOrElse(listPartitionDirs(fs, path, partCol))
          writeBakEpoch(fs, path, baseEpoch)
          present.foreach { dt =>
            swapDir(fs, new HPath(s"$tmp/$partCol=$dt"),
              new HPath(s"$path/$partCol=$dt"),
              new HPath(s"$path.bak/$partCol=$dt"))
          }
          emptied.foreach { dt =>
            val dst = new HPath(s"$path/$partCol=$dt")
            val bak = new HPath(s"$path.bak/$partCol=$dt")
            if (fs.exists(bak)) fs.delete(bak, true)
            if (fs.exists(dst)) {
              if (!fs.exists(bak.getParent)) fs.mkdirs(bak.getParent)
              renameOrFail(fs, dst, bak)
            }
          }
          fs.delete(new HPath(tmp), true)
          // post-delete row count in O(1) off the prior manifest's tally.
          // Fallback (legacy/swept manifest): readOrInit here still serves
          // the PRE-delete snapshot — the manifest hasn't moved and the
          // bak-preferred read resolves the swapped partitions' backups —
          // so its count IS the previous total
          val prevTotal = latestManifest(fs, path).flatMap(_.rows)
            .getOrElse(readOrInit(spark, path, schema).count())
          verifyStoreLease(fs, path, lease)
          writeManifest(fs, path, baseEpoch + 1, partCol,
            (baseParts.diff(emptied) ++ present).distinct.sorted,
            rows = Some(prevTotal - deleted))
          dropOldManifests(fs, path, current = baseEpoch + 1)
          // erasure > deferred isolation: this batch's .bak copies carry
          // the forgotten rows — delete them NOW instead of leaving them
          // for the next batch's archive sweep (which would re-introduce
          // the rows into .hist)
          dates.foreach { dt =>
            fs.delete(new HPath(s"$path.bak/$partCol=$dt"), true)
          }
          epoch = baseEpoch + 1
        } finally releaseStoreLease(fs, path, lease)
      }
      // history purge — unconditional, so a crashed/partial prior run is
      // finished by a rerun. Archived dirs carry the data columns only
      // (the partition value is the dir name), so read with the explicit
      // data schema and rewrite in place when the keys appear.
      val dataSchema = StructType(schema.filterNot(_.name == partCol))
      val histRoot = new HPath(path + ".hist")
      val FkOld = """_(.+)\.fk\.old""".r
      val FkTmp = """_(.+)\.fk\.tmp""".r
      if (fs.exists(histRoot)) {
        for (ep <- fs.listStatus(histRoot).toSeq if ep.isDirectory) {
          // recovery preamble: finish (or roll back) any half-done swap a
          // crashed purge left, so the main pass below always starts from
          // a live archived dir. Invariant the sequence maintains: at
          // every instant at least one of {live dir, .fk.old copy,
          // completed .fk.tmp rewrite} exists for each archived partition.
          fs.listStatus(ep.getPath).toSeq.foreach { st =>
            st.getPath.getName match {
              case FkOld(orig) =>
                val live = new HPath(ep.getPath, orig)
                val tmp = new HPath(ep.getPath, s"_$orig.fk.tmp")
                if (fs.exists(live)) fs.delete(st.getPath, true)
                else if (fs.exists(tmp)) { // crash between the two renames
                  renameOrFail(fs, tmp, live)
                  fs.delete(st.getPath, true)
                } else renameOrFail(fs, st.getPath, live)
              case _ => ()
            }
          }
          // a .fk.tmp whose live dir survived is a pre-swap leftover
          fs.listStatus(ep.getPath).toSeq.foreach { st =>
            st.getPath.getName match {
              case FkTmp(orig) if fs.exists(new HPath(ep.getPath, orig)) =>
                fs.delete(st.getPath, true)
              case _ => ()
            }
          }
          for (pd <- fs.listStatus(ep.getPath).toSeq
               if pd.isDirectory && pd.getPath.getName.startsWith(partCol + "=")) {
            val dir = pd.getPath.toString
            val h = spark.read.schema(dataSchema).parquet(dir)
            if (h.join(kv, keys, "left_semi").limit(1).count() > 0) {
              val htmp = new HPath(ep.getPath, s"_${pd.getPath.getName}.fk.tmp")
              fs.delete(htmp, true)
              spark.read.schema(dataSchema).parquet(dir)
                .join(kv, keys, "left_anti")
                .coalesce(1)
                .write.parquet(htmp.toString)
              // rename-aside swap (never delete-then-rename): a readable
              // copy of the archive exists at every instant, and the
              // preamble above finishes this swap if we crash inside it
              val hOld = new HPath(ep.getPath, s"_${pd.getPath.getName}.fk.old")
              fs.delete(hOld, true)
              renameOrFail(fs, pd.getPath, hOld)
              renameOrFail(fs, htmp, pd.getPath)
              fs.delete(hOld, true)
            }
          }
        }
      }
      // erasure complete (snapshot + every archived version): retire the
      // tombstone — until this instant a crash re-enters the purge path
      fs.delete(pendingDir, true)
      (epoch, deleted)
    } finally { kv.unpersist(); () }
  }

  /** Finish a crashed [[forgetKeys]] whose tombstone is still outstanding
    * — the recovery entry point routine batches call before touching the
    * store, so erasure completes without anyone re-issuing the request.
    * No-op when no tombstone exists. */
  private[graft] def completePendingForget(spark: SparkSession, path: String,
      schema: StructType, partCol: String = "order_date"): Unit = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val fs = FileSystem.get(new java.net.URI(Sources.normalizeScheme(path)),
      spark.sparkContext.hadoopConfiguration)
    recoverUnderLease(fs, path)
    val pending = new HPath(path + ".forget.pending")
    if (fs.exists(pending)) {
      val pend = spark.read.parquet(pending.toString)
      forgetKeys(spark, path, schema, pend, pend.columns.toSeq, partCol)
      ()
    }
  }

  /** Recovery preamble for the tombstone's own rename-aside publish (the
    * same discipline the `.hist` purge swap uses): whichever of
    * {published tombstone, rename-aside `.old` copy, completed
    * `.inprogress` write} a crash left behind, promote exactly one back
    * to the published name so a complete tombstone is never lost.
    * Precedence: a published tombstone is authoritative (stale side files
    * are dropped); else a COMPLETE in-progress write is published (it was
    * finished before the swap began and is a superset of the `.old`
    * copy); else the `.old` copy is restored; a torn in-progress write
    * alone is deleted. Completeness = OUR `_graft_committed` marker
    * (written by [[forgetKeys]] after the tombstone write returns — the
    * committer's `_SUCCESS` is config-dependent and commonly disabled on
    * object stores; it is honored as a legacy fallback only). */
  private def resolvePendingSwap(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val pending = new HPath(path + ".forget.pending")
    val old = new HPath(path + ".forget.pending.old")
    val tmp = new HPath(path + ".forget.pending.inprogress")
    if (fs.exists(pending)) {
      fs.delete(old, true)
      fs.delete(tmp, true)
    } else if (fs.exists(new HPath(tmp, "_graft_committed")) ||
        fs.exists(new HPath(tmp, "_SUCCESS"))) {
      renameOrFail(fs, tmp, pending)
      fs.delete(old, true)
    } else if (fs.exists(old)) {
      fs.delete(tmp, true)
      renameOrFail(fs, old, pending)
    } else fs.delete(tmp, true)
    ()
  }

  /** E57: manifest-aware retention sweep — expire store partitions whose
    * value sorts below `keepFrom` (dates: "keep the last N days"). The
    * VACUUM every incremental store eventually needs: without it a daily
    * merge accumulates partitions forever and per-store listing cost
    * grows without bound.
    *
    * Ordering is the whole operator: (1) recover any crashed swap
    * (restoreBackups — retention must never roll back OVER a half-swap),
    * (2) COMMIT the shrunken partition list as a new manifest epoch —
    * from this instant the expired dates are invisible to every
    * manifest-aware reader, (3) garbage-collect dirs that were ALREADY
    * unlisted before this commit (earlier sweeps' expirations, crash
    * orphans). The just-expired dirs deliberately survive THIS sweep:
    * deleting them in the same invocation that commits would yank files
    * out from under a reader still materializing a plan pinned to the
    * previous epoch — the same live-reader window the batch swap closes
    * by deferring `.bak` deletion, closed here the same way. The next
    * sweep (or any later one) finds them unlisted and removes them.
    *
    * The manifest is authoritative for the partition column; a caller-
    * supplied `partCol` that disagrees fails loud rather than silently
    * comparing cutoffs against the wrong column's values.
    *
    * @return the partition values expired from the manifest
    */
  def retentionSweep(spark: SparkSession, path: String,
      keepFrom: String, partCol: String = "order_date"): Seq[String] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(Sources.normalizeScheme(path)),
      spark.sparkContext.hadoopConfiguration)
    recoverUnderLease(fs, path)
    latestManifest(fs, path) match {
      case None => Nil // pre-manifest store: nothing committed to expire
      case Some(m) =>
        require(m.partCol == partCol,
          s"store $path is partitioned by ${m.partCol}, not $partCol — " +
            "retention cutoffs would compare against the wrong column")
        // the whole mutating section (manifest bump + unlisted-dir GC)
        // runs under the commit lease: an UNLISTED dir is otherwise
        // indistinguishable from a live writer's freshly swapped
        // new-date partition whose manifest hasn't published yet —
        // unguarded GC would delete it out from under the commit (the
        // round-9 recovery-sweep finding, retention flavor). A live
        // writer turns retention away clean; retry after it commits.
        val lease = acquireStoreLease(fs, path, m.epoch)
        try {
          // epoch re-check under the lease (the upsertStore CAS
          // convention): if the manifest moved between the read and the
          // acquire, our lease was born epoch-stale — breakable mid-
          // sweep — so abort clean and let the caller retry
          val cur = latestManifest(fs, path).getOrElse(m)
          if (cur.epoch != m.epoch)
            throw new StoreConflictException(
              s"store $path: manifest epoch moved ${m.epoch} -> " +
                s"${cur.epoch} before the retention sweep's lease — " +
                "aborted cleanly; retry against the new snapshot.")
          val (keep, drop) = cur.partitions.partition(_ >= keepFrom)
          if (drop.nonEmpty) {
            // rows deliberately absent: the expired partitions' counts
            // are not worth a scan of data being thrown away — the next
            // merge pays one full-count fallback and re-establishes the
            // tally
            writeManifest(fs, path, cur.epoch + 1, cur.partCol,
              keep.sorted)
            dropOldManifests(fs, path, current = cur.epoch + 1)
          }
          // GC only what the PRE-sweep manifest already didn't list —
          // the dirs this sweep just expired stay until the next one
          // (deferred deletion, see scaladoc); under the lease these can
          // only be crash debris, never a live writer's swap
          val preListed = cur.partitions.toSet
          listPartitionDirs(fs, path, cur.partCol)
            .filterNot(preListed)
            .foreach(pv =>
              fs.delete(new HPath(path, s"${cur.partCol}=$pv"), true))
          drop
        } finally releaseStoreLease(fs, path, lease)
    }
  }

  /** E27 under the store protocol: partition compaction of the KPI
    * store AS THE LEASE HOLDER. `Sources.compactPartitioned` swaps live
    * partition directories, so running it beside a committing writer
    * could interleave with that writer's own dir swap — the same race
    * family the leased recovery sweep and retention sweep close. The
    * manifest is untouched (same rows, fewer files ⇒ the epoch does not
    * move), so the epoch re-check under the lease only guards the
    * born-stale window. Run it in a read-quiet window like any file-
    * level compaction: a reader mid-scan of a compacted partition can
    * lose files (the store's manifest isolation is partition-grain, not
    * file-grain — the Delta-versioned-file-names trade we did not take). */
  def compactStore(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Map[String, (Int, Int)] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(Sources.normalizeScheme(path)),
      spark.sparkContext.hadoopConfiguration)
    recoverUnderLease(fs, path)
    val epoch = latestManifest(fs, path).map(_.epoch).getOrElse(0L)
    val lease = acquireStoreLease(fs, path, epoch)
    try {
      val now = latestManifest(fs, path).map(_.epoch).getOrElse(0L)
      if (now != epoch)
        throw new StoreConflictException(
          s"store $path: manifest epoch moved $epoch -> $now before the " +
            "compaction lease — aborted cleanly; retry.")
      Sources.compactPartitioned(spark, path, targetBytes)
    } finally releaseStoreLease(fs, path, lease)
  }

  // ---- commit lease -----------------------------------------------------
  //
  // The put-if-absent arbiter over the commit SECTION (E60's last
  // residual): optimistic epoch CAS catches a writer that committed
  // before this batch entered its commit section, and the write-once
  // manifest publish arbitrates the very end — but two writers passing
  // the entry check together would still interleave their partition-dir
  // swaps (reconciled later, yet torn until then). The lease closes that
  // window: `_lease` inside the store dir, created with the FileSystem's
  // create-no-overwrite primitive (atomic on HDFS; the same primitive a
  // Delta LogStore builds its commits on), carrying a monotonic fencing
  // token + owner id + the holder's base epoch.
  //
  // Liveness without a heartbeat: a crashed holder's lease is TAKEN OVER
  // when it is provably finished (its recorded epoch is older than the
  // current manifest — the commit published, only the release was lost)
  // or presumed dead (file age beyond the TTL). Takeover bumps the
  // fencing token; the previous holder, if actually alive, fails its
  // pre-publish [[verifyStoreLease]] and aborts WITHOUT publishing — its
  // half-swapped dirs are exactly the crash shape [[restoreBackups]]
  // already reconciles. Clock caveat: the TTL compares the driver clock
  // with the store FileSystem's mtime — keep it generous (default 10
  // min) relative to plausible skew.

  private[graft] final case class StoreLease(token: Long, owner: String,
      epoch: Long)

  private val LeaseName = "_lease"
  private[graft] val DefaultLeaseTtlMs = 600000L
  private val MaxLeaseAttempts = 5

  private def leasePath(path: String) =
    new org.apache.hadoop.fs.Path(path, LeaseName)

  /** None = file absent OR unreadable/torn (caller distinguishes via
    * exists). Format: one line, `token owner epoch`. */
  private def parseLease(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[StoreLease] =
    try {
      val in = fs.open(p)
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      raw.trim.split("\\s+") match {
        case Array(t, o, e) => Some(StoreLease(t.toLong, o, e.toLong))
        case _ => None
      }
    } catch { case _: Exception => None }

  /** Acquire the store's commit lease or abort clean. A held lease is
    * honored (StoreLeaseHeldException) unless stale: epoch-fenced (its
    * holder's commit already published — the manifest moved past the
    * lease's recorded epoch) or TTL-expired (holder presumed crashed
    * mid-commit). Stale leases are broken and re-acquired with a BUMPED
    * fencing token; racing breakers are re-arbitrated by
    * create-no-overwrite on the next attempt. */
  private[graft] def acquireStoreLease(fs: org.apache.hadoop.fs.FileSystem,
      path: String, baseEpoch: Long,
      ttlMs: Long = DefaultLeaseTtlMs): StoreLease = {
    val p = leasePath(path)
    val owner = java.util.UUID.randomUUID().toString
    var fence = 1L
    var attempt = 0
    while (attempt < MaxLeaseAttempts) {
      attempt += 1
      if (!fs.exists(p)) {
        val mine = StoreLease(fence, owner, baseEpoch)
        val created =
          try {
            val out = fs.create(p, false)
            try out.write(s"${mine.token} ${mine.owner} ${mine.epoch}"
              .getBytes("UTF-8"))
            finally out.close()
            true
          } catch { case _: java.io.IOException => false } // lost the race
        // re-read after create: on stores whose create-no-overwrite is a
        // non-atomic exists+create (local fs), the read-back is the
        // arbiter — exactly one writer's content survives
        if (created && parseLease(fs, p).contains(mine)) return mine
      } else {
        val existing = parseLease(fs, p)
        val age = try
          System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime
        catch { case _: java.io.IOException => 0L } // vanished: retry loop
        val curEpoch = latestManifest(fs, path).map(_.epoch).getOrElse(0L)
        val stale = existing match {
          case Some(l) => l.epoch < curEpoch || age > ttlMs
          case None => age > ttlMs // torn lease: only time can condemn it
        }
        if (!stale)
          throw new StoreLeaseHeldException(
            s"store $path: commit lease held by " +
              s"${existing.map(_.owner).getOrElse("<torn lease>")} " +
              s"(age ${age}ms, ttl ${ttlMs}ms) — a concurrent writer is " +
              "in its commit section; this batch aborted cleanly before " +
              "touching the store. Retry after the holder commits.")
        fence = math.max(fence, existing.map(_.token + 1).getOrElse(1L))
        // break the stale lease by RENAME-claim, not delete: rename moves
        // that specific file atomically, so of N racing breakers exactly
        // one wins and the losers' claims fail — a bare delete could land
        // on the FRESH lease another breaker just created (round-9
        // review). The graveyard file is then deleted by the claimant.
        val grave = new org.apache.hadoop.fs.Path(
          p.getParent, s"${p.getName}.broken.$fence." +
            java.util.UUID.randomUUID().toString.take(8))
        val claimed = try fs.rename(p, grave)
        catch { case _: java.io.IOException => false }
        if (claimed) fs.delete(grave, false)
        // claimed or not, loop: either we re-create, or we re-judge the
        // winner's fresh lease (not stale → clean LeaseHeld abort)
      }
    }
    throw new StoreLeaseHeldException(
      s"store $path: could not acquire the commit lease after " +
        s"$MaxLeaseAttempts attempts — writers are churning it; retry.")
  }

  /** Fencing check, called immediately before the manifest publish: the
    * lease on disk must still be OURS (same owner AND token). A takeover
    * (stale-lease break) replaces it — this writer then aborts without
    * publishing, leaving only the crash shape the new holder's
    * [[restoreBackups]] reconciles. */
  private[graft] def verifyStoreLease(fs: org.apache.hadoop.fs.FileSystem,
      path: String, lease: StoreLease): Unit = {
    val cur = parseLease(fs, leasePath(path))
    if (!cur.contains(lease))
      throw new StoreConflictException(
        s"store $path: commit lease lost before publish (now held by " +
          s"${cur.map(l => s"${l.owner} token=${l.token}").getOrElse("nobody")}," +
          s" ours was token=${lease.token}) — a takeover fenced this " +
          "writer out; aborting without publishing. The new holder's " +
          "backup restore reconciles the swapped partition dirs.")
  }

  /** Release = delete, but only while the lease is still ours — never
    * yank a successor's lease after being fenced out. Best-effort: a
    * failed delete leaves a lease that is epoch-stale the moment our
    * manifest publish landed, so the next writer breaks it for free. */
  private[graft] def releaseStoreLease(fs: org.apache.hadoop.fs.FileSystem,
      path: String, lease: StoreLease): Unit =
    try {
      // Post-publish our lease is epoch-stale: a successor may break it
      // LEGITIMATELY at any instant, so a parse-then-delete here could
      // remove the successor's fresh lease (round-9 review). Skip the
      // delete on that path — the next writer's epoch-stale break claims
      // it atomically (rename) for free. On the abort path (epoch
      // unchanged) our lease is younger than the TTL by construction, so
      // no breaker can race the matched delete.
      val curEpoch = latestManifest(fs, path).map(_.epoch).getOrElse(0L)
      if (lease.epoch >= curEpoch &&
          parseLease(fs, leasePath(path)).contains(lease))
        fs.delete(leasePath(path), false)
      ()
    } catch { case _: java.io.IOException => () }

  /** Per-writer staging directory — unique-named so concurrent writers
    * can never clobber each other's staged commit data (the shared
    * `.tmp` did exactly that before the lease was even attempted).
    * Crashed writers' orphans are swept by [[sweepOrphanStaging]]. */
  private def stagingDir(path: String): String =
    path + ".tmp." + java.util.UUID.randomUUID().toString.take(8)

  /** GC crashed writers' staging dirs (`<store>.tmp*` siblings,
    * including the legacy shared `.tmp` name). Runs ONLY under the
    * commit lease, and only deletes dirs idle past the TTL — a live
    * writer refreshes nothing mid-stage, so the TTL is the same bound
    * every liveness decision here uses; a writer staging longer than the
    * TTL fails its swap (renameOrFail) and aborts clean. */
  private def sweepOrphanStaging(fs: org.apache.hadoop.fs.FileSystem,
      path: String, exclude: String, ttlMs: Long): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val store = new HPath(path)
    val parent = store.getParent
    if (parent == null) return
    val prefix = store.getName + ".tmp"
    val now = System.currentTimeMillis()
    try fs.listStatus(parent).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith(prefix) && st.getPath.toString != exclude &&
          now - st.getModificationTime > ttlMs)
        fs.delete(st.getPath, true)
    } catch { case _: java.io.IOException => () } // GC is best-effort
    // graveyard files a crashed lease-breaker left between its
    // rename-claim and delete: garbage from the instant of the rename
    // (nothing ever reads a broken lease), deletable by anyone
    try fs.listStatus(store).foreach { st =>
      if (st.getPath.getName.startsWith(LeaseName + ".broken."))
        fs.delete(st.getPath, false)
    } catch { case _: java.io.IOException => () }
  }

  /** Crash-recovery sweep under the commit lease. The unguarded form
    * treated a LIVE holder's in-flight swap (bak-epoch == manifest
    * epoch) as a crash and rolled its partitions back mid-commit
    * (round-9 review); now recovery only proceeds as the lease holder,
    * and a live writer turns the caller away clean
    * ([[StoreLeaseHeldException]]) BEFORE any mutation. The lease is
    * only taken when there is evidence of interrupted work, so the
    * common no-crash path stays two `exists` probes. */
  private[graft] def recoverUnderLease(fs: org.apache.hadoop.fs.FileSystem,
      path: String, ttlMs: Long = DefaultLeaseTtlMs): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val evidence = fs.exists(new HPath(path + ".bak")) ||
      fs.exists(new HPath(path + ".forget.pending.old")) ||
      fs.exists(new HPath(path + ".forget.pending.inprogress"))
    if (!evidence) return
    val recEpoch = latestManifest(fs, path).map(_.epoch).getOrElse(0L)
    val l = acquireStoreLease(fs, path, recEpoch, ttlMs)
    try {
      resolvePendingSwap(fs, path)
      restoreBackups(fs, path)
    } finally releaseStoreLease(fs, path, l)
  }

  // ---- commit manifest --------------------------------------------------
  //
  // `_manifest.<epoch>` inside the store dir (underscore-prefixed files are
  // invisible to Spark's partition discovery, like `_SUCCESS`). Content:
  // line 1 = the partition column name, remaining lines = committed
  // partition values, one per line. The epoch lives in the filename so
  // readers pick the max without parsing, and publication is a
  // write-to-`.inprogress` + rename — atomic on a correct FileSystem.

  /** `rows` = committed row count of the snapshot (None on legacy
    * manifests and after a retention sweep, whose expired rows are not
    * re-counted): lets the per-batch merge report the post-merge store
    * size in O(touched) instead of re-scanning the whole store. */
  private[graft] final case class StoreManifest(epoch: Long, partCol: String,
      partitions: Seq[String], rows: Option[Long] = None)

  private val ManifestName = """_manifest\.(\d+)""".r

  /** How many committed epochs stay readable through [[readAt]]: manifests
    * (and the `.hist` partition versions that back them) older than this
    * window behind the current epoch are pruned at each commit. The Delta
    * analogue is `delta.logRetentionDuration` — a small constant, because
    * every retained epoch holds a full copy of each partition it
    * replaced. Overridable for tests (and ops) via the
    * `graft.store.manifestsToKeep` system property. */
  private[graft] def manifestsToKeep: Long =
    sys.props.get("graft.store.manifestsToKeep").map(_.toLong).getOrElse(16L)

  private def readManifestFile(fs: org.apache.hadoop.fs.FileSystem,
      epoch: Long, p: org.apache.hadoop.fs.Path): StoreManifest = {
    val in = fs.open(p)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    val meta = lines.tail.filter(_.startsWith("#"))
    val rows = meta.collectFirst { case l if l.startsWith("#rows=") =>
      l.stripPrefix("#rows=").trim.toLong }
    StoreManifest(epoch, lines.head,
      lines.tail.filter(l => l.nonEmpty && !l.startsWith("#")), rows)
  }

  private[graft] def latestManifest(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Option[StoreManifest] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val root = new HPath(path)
    if (!fs.exists(root)) return None
    val candidates = fs.listStatus(root).flatMap(s => s.getPath.getName match {
      case ManifestName(e) => Some(e.toLong -> s.getPath)
      case _ => None
    })
    candidates.sortBy(-_._1).headOption.map { case (epoch, p) =>
      readManifestFile(fs, epoch, p)
    }
  }

  private[graft] def manifestAt(fs: org.apache.hadoop.fs.FileSystem,
      path: String, epoch: Long): Option[StoreManifest] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val p = new HPath(path, s"_manifest.$epoch")
    if (!fs.exists(p)) None else Some(readManifestFile(fs, epoch, p))
  }

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem, path: String,
      epoch: Long, partCol: String, partitions: Seq[String],
      rows: Option[Long] = None): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val tmp = new HPath(path, s"_manifest.$epoch.inprogress")
    fs.delete(tmp, false) // leftover from a crash mid-publish
    val out = fs.create(tmp, true)
    // `#`-prefixed metadata lines are ignored by THIS repo's partition
    // parser; manifests WITHOUT the line stay readable (legacy manifests
    // parse with rows = None). Note the compatibility is forward-only:
    // a parser predating the '#' filter would read the line as a
    // partition value — acceptable because the manifest format and its
    // only readers live in this repo and version together
    val body = partCol +: (rows.map(r => s"#rows=$r").toSeq ++ partitions)
    try out.write(body.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // a manifest epoch is write-once: an existing file means a concurrent
    // writer already published this epoch — the final arbiter of the
    // commit race (on stores whose rename is atomic-no-overwrite, HDFS
    // style, the rename itself backstops the pre-check)
    val dst = new HPath(path, s"_manifest.$epoch")
    if (fs.exists(dst)) {
      fs.delete(tmp, false)
      throw new StoreConflictException(
        s"store $path: manifest epoch $epoch was already published by a " +
          "concurrent writer during this commit section — swapped " +
          "partition dirs may disagree with the winning manifest; the " +
          "next writer's backup restore reconciles, but run writers " +
          "single-flight (T4) or under a storage lease to avoid this " +
          "window entirely.")
    }
    renameOrFail(fs, tmp, dst)
  }

  /** Prune manifests (and the `.hist` versions that back them) outside the
    * [[ManifestsToKeep]] window behind `current`. A `.hist/<h>` dir is
    * reachable only through [[readAt]] of some kept epoch T ≤ h, so once
    * the oldest kept manifest passes h the version is garbage. */
  private def dropOldManifests(fs: org.apache.hadoop.fs.FileSystem,
      path: String, current: Long): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val oldestKept = current - manifestsToKeep + 1
    // prune ONLY below the retention window. An epoch ABOVE `current` can
    // only be a concurrent writer's newer committed manifest — deleting it
    // would erase their commit record while their swapped dirs stay live,
    // exactly the lost-update the write-once publish (E60) arbitrates
    // against; never touch it.
    fs.listStatus(new HPath(path)).foreach(s => s.getPath.getName match {
      case ManifestName(e) if e.toLong < oldestKept =>
        fs.delete(s.getPath, false)
      case _ => ()
    })
    val histRoot = new HPath(path + ".hist")
    if (fs.exists(histRoot))
      fs.listStatus(histRoot).foreach { s =>
        scala.util.Try(s.getPath.getName.toLong).toOption
          .filter(_ < oldestKept)
          .foreach(_ => fs.delete(s.getPath, true))
      }
  }

  /** The manifest epoch the in-flight swap's backups were taken AGAINST —
    * readers prefer `.bak` only while this matches the latest manifest.
    * Fails LOUD on an unparseable stamp: the two recovery regimes make
    * opposite decisions (roll back vs archive), so guessing a regime on
    * a torn file could delete the only copy of pre-batch data. The
    * atomic publish in [[writeBakEpoch]] means a torn `_epoch` can only
    * predate that fix or indicate FS corruption — both operator
    * territory. */
  private[graft] def bakEpoch(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Option[Long] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val p = new HPath(path + ".bak", "_epoch")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val raw =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      Some(raw.toLongOption.getOrElse(throw new java.io.IOException(
        s"store $path: unparseable .bak/_epoch stamp '$raw' — recovery " +
          "cannot tell the rollback and archive regimes apart; inspect " +
          "the .bak tree manually before retrying")))
    }
  }

  private[graft] def writeBakEpoch(fs: org.apache.hadoop.fs.FileSystem,
      path: String, epoch: Long): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val root = new HPath(path + ".bak")
    if (!fs.exists(root)) fs.mkdirs(root)
    // write-tmp-then-rename, like the manifest and the forget tombstone:
    // `_epoch` arbitrates which recovery REGIME runs, so a torn direct
    // write (crash between create and close) would leave every reader,
    // writer, and recovery path throwing on an unparseable stamp — the
    // one commit-protocol file that previously skipped the atomic
    // publish discipline
    val tmp = new HPath(root, "_epoch.tmp")
    fs.delete(tmp, true)
    val out = fs.create(tmp, true)
    try out.write(epoch.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(new HPath(root, "_epoch"), true)
    renameOrFail(fs, tmp, new HPath(root, "_epoch"))
  }

  private[graft] def listPartitionDirs(fs: org.apache.hadoop.fs.FileSystem,
      path: String, partCol: String): Seq[String] = {
    import org.apache.hadoop.fs.{Path => HPath}
    val root = new HPath(path)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
      .map(_.getPath.getName.stripPrefix(partCol + "="))
  }

  /** Crash recovery. Two regimes, told apart by the `.bak/_epoch` stamp:
    *
    *  - **In-flight rollback** (`_epoch` == latest manifest epoch): the
    *    previous batch crashed mid-swap before committing its manifest.
    *    Every backed-up partition is rolled BACK over its (half-replaced)
    *    store dir, returning the store to exactly the committed snapshot
    *    readers were already being served ([[readOrInit]] preferred these
    *    same `.bak` copies). Partition dirs NOT listed in the committed
    *    manifest — a crashed batch's brand-new dates, swapped in with no
    *    `.bak` copy and never committed — are deleted too: they were
    *    invisible to manifest readers but would otherwise accumulate as
    *    permanent garbage and surface as torn data if the store were ever
    *    re-bootstrapped from its dirs. The retried merge then applies its
    *    updates to pristine committed data.
    *  - **Orphan restore** (no `_epoch`, or epoch ≠ manifest): backups are
    *    either stale leftovers from a committed batch (post-commit,
    *    pre-cleanup crash) or pre-manifest-era. Only a backup whose store
    *    partition is MISSING (the window between [[swapDir]]'s two
    *    renames) is restored — a backup is never deleted while it is the
    *    only copy. A stale backup whose live partition EXISTS is the
    *    pre-swap content a committed batch replaced: it is ARCHIVED to
    *    `<store>.hist/<bakEpoch>/` — the version store behind [[readAt]]
    *    time travel — rather than deleted (pre-manifest backups, which
    *    carry no epoch stamp, are still swept: there is no epoch to file
    *    them under and no manifest to travel to).
    */
  private def restoreBackups(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val bakRoot = new HPath(path + ".bak")
    if (fs.exists(bakRoot)) {
      val manifest = latestManifest(fs, path)
      val be = bakEpoch(fs, path)
      val inFlight = (be, manifest) match {
        case (Some(b), Some(m)) => b == m.epoch
        case _ => false
      }
      // an outstanding forget tombstone means ORPHAN backups (post-commit
      // regime) are the crashed forget's own pre-delete copies — they
      // carry the forgotten rows, so erasure outranks both the
      // time-travel archive AND the missing-dir restore: delete, never
      // file into .hist or rename back into the live tree. The dst-
      // missing case is exactly a partition the forget EMPTIED and
      // retired from the manifest — restoring it would park the
      // forgotten rows in an unlisted live dir forever (the completing
      // forget reads manifest-filtered and would never rewrite it).
      // Pre-commit crashes are unaffected: they land in the inFlight
      // regime above (bakEpoch == manifest epoch) and roll back, so a
      // backup holding non-forgotten rows is never deleted here.
      val forgetPending = fs.exists(new HPath(path + ".forget.pending"))
      fs.listStatus(bakRoot)
        .filterNot(_.getPath.getName.startsWith("_")).foreach { s =>
          val dst = new HPath(path, s.getPath.getName)
          if (inFlight) {
            if (fs.exists(dst)) fs.delete(dst, true)
            renameOrFail(fs, s.getPath, dst)
          } else if (forgetPending) fs.delete(s.getPath, true)
          else if (!fs.exists(dst)) renameOrFail(fs, s.getPath, dst)
          else be.foreach { e =>
            val histDir = new HPath(s"$path.hist/$e")
            if (!fs.exists(histDir)) fs.mkdirs(histDir)
            renameOrFail(fs, s.getPath, new HPath(histDir, s.getPath.getName))
          }
        }
      // in-flight rollback also sweeps the crashed batch's UNCOMMITTED
      // new-date dirs (swapped in with no .bak copy, listed in no
      // manifest) — see the scaladoc's first regime
      if (inFlight) manifest.foreach { m =>
        val committed = m.partitions.toSet
        listPartitionDirs(fs, path, m.partCol)
          .filterNot(committed)
          .foreach(pv =>
            fs.delete(new HPath(path, s"${m.partCol}=$pv"), true))
      }
      fs.delete(bakRoot, true)
    }
  }

  // fail-loud rename shared with the io tier: graft.io.Sources.renameOrFail
  private def renameOrFail(fs: org.apache.hadoop.fs.FileSystem,
      src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Unit =
    Sources.renameOrFail(fs, src, dst)

  /** Crash-safe directory swap: keep the old dir as a backup until the new
    * one is in place (a failure leaves either the old data or old-as-bak +
    * new-in-temp — never nothing). Backups are dropped by the caller after
    * ALL touched partitions have swapped. */
  private def swapDir(fs: org.apache.hadoop.fs.FileSystem,
      src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path,
      bak: org.apache.hadoop.fs.Path): Unit = {
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(dst)) {
      if (!fs.exists(bak.getParent)) fs.mkdirs(bak.getParent)
      renameOrFail(fs, dst, bak)
    }
    if (!fs.exists(dst.getParent)) fs.mkdirs(dst.getParent)
    renameOrFail(fs, src, dst)
  }
}
