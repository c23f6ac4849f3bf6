package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

import scala.util.Try

/** Scan/source/sink combinators (reference SURVEY.md §2.1, S1-S6).
  *
  * Scale notes (100 TB): every reader here is a plain declarative scan, so
  * Catalyst applies predicate pushdown, column pruning, and partition pruning
  * automatically; a multi-path scan of N parts is a single FileScan with one
  * split list (no per-file union nodes), which is what you want for tens of
  * thousands of input files.
  */
object Sources {

  /** F1: `s3://` → `s3a://` scheme rewrite (reference
    * `scripts/transformation.py:18-27`) — the Hadoop connector expects the
    * `s3a` scheme; everything else passes through untouched. */
  def normalizeScheme(path: String): String =
    if (path.startsWith("s3://")) "s3a://" + path.stripPrefix("s3://")
    else path

  /** S1: primary-format-or-CSV scan. The reference tries Delta and falls back
    * to headered, schema-less CSV (reference `scripts/validation.py:51-64`).
    * Delta jars are not on this classpath, so the lake format here is parquet;
    * the combinator shape (try columnar table, fall back to raw CSV) is the
    * same. Pass a schema to keep the CSV path strongly typed; pass
    * `Schemas.allStrings(s)` for reference-parity stringly typing.
    */
  def readParquetOrCsv(spark: SparkSession, path: String,
      csvSchema: Option[StructType] = None): DataFrame = {
    def csv = {
      val r = spark.read.option("header", "true")
      csvSchema.fold(r)(s => r.schema(s)).csv(path)
    }
    // short-circuit the probe for explicit .csv paths — probing parquet
    // first would cost a doomed footer read per file and a logged error
    if (path.endsWith(".csv")) csv
    else Try(spark.read.parquet(path)).getOrElse(csv)
  }

  /** S2: multi-file union scan (reference `scripts/validation.py:67-80`).
    * When all parts share a declared schema, prefer [[readMultiPath]] — one
    * scan node instead of a `Union` of N scans. The fold form exists for the
    * schema-less case where parts may disagree on column order.
    */
  def readAndUnion(spark: SparkSession, paths: Seq[String],
      csvSchema: Option[StructType] = None): Option[DataFrame] =
    paths.map(readParquetOrCsv(spark, _, csvSchema))
      .reduceOption(_.unionByName(_))

  /** S2 (scale path): single multi-path scan — the planner gets one relation
    * with N files, so file listing, split planning, and pushdown happen once.
    */
  def readMultiPath(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.parquet(paths: _*)

  /** S3: strict single-table scan, None on failure
    * (reference `scripts/transformation.py:107-119`). */
  def readTable(spark: SparkSession, path: String): Option[DataFrame] =
    Try(spark.read.parquet(path)).toOption

  /** Load one testdata table: `<dir>/<name>.parquet`. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Event-time normalizer: epoch MICROSECONDS regardless of the column's
    * physical type. The `events.ts` fixture has shipped as both epoch-nanos
    * int64 (read via the nanosAsLong legacy flag) and parquet
    * `timestamp[us]` (read as TIMESTAMP_NTZ) — and a silent flip between
    * the two once broke every query downstream of `ts`. Every consumer of
    * an event-time column goes through here, so the unit contract lives in
    * ONE place and both physical shapes stay supported:
    *   - timestamp / timestamp_ntz → `unix_micros` (naive values are
    *     interpreted as UTC — sessions here run with
    *     `spark.sql.session.timeZone=UTC`, matching how the DuckDB oracles'
    *     `epoch_us(ts)` reads a naive timestamp);
    *   - long → epoch nanos by the testdata convention, floor-divided
    *     by 1000 (matching the timestamp arm's and DuckDB `//` flooring).
    * Narrow, codegen'd, constant-folded — free at any scale. */
  def epochUs(df: DataFrame, colName: String = "ts"): Column =
    df.schema(colName).dataType match {
      case TimestampType | TimestampNTZType =>
        unix_micros(col(colName).cast(TimestampType))
      // floor division (not bare DIV, which truncates toward zero): the
      // timestamp arm floors via unix_micros, and the normalizer's whole
      // contract is that the physical-shape flip is invisible — pre-1970
      // instants must not disagree by one unit. Subtracting pmod makes
      // the numerator exactly divisible, so DIV's truncation IS floor —
      // all in exact long arithmetic (a double `/` would lose precision
      // at epoch-nano magnitudes > 2^53).
      case LongType =>
        expr(s"(`$colName` - pmod(`$colName`, 1000L)) DIV 1000")
      case other => throw new IllegalArgumentException(
        s"event-time column `$colName`: expected timestamp or epoch-nanos " +
          s"long, got $other")
    }

  /** Event-time normalizer: epoch SECONDS (floor). Same contract as
    * [[epochUs]]. */
  def epochSec(df: DataFrame, colName: String = "ts"): Column =
    df.schema(colName).dataType match {
      case TimestampType | TimestampNTZType =>
        unix_seconds(col(colName).cast(TimestampType))
      case LongType =>
        expr(s"(`$colName` - pmod(`$colName`, 1000000000L)) DIV 1000000000")
      case other => throw new IllegalArgumentException(
        s"event-time column `$colName`: expected timestamp or epoch-nanos " +
          s"long, got $other")
    }

  /** S5: partitioned lake write (reference `scripts/validation.py:121-129`):
    * stamp the literal processing-date partition column and overwrite.
    * Partitioning by `dt` gives downstream readers partition pruning — at
    * 100 TB the transform stage should read `.where($"dt" === date)` and
    * touch one partition, not the whole base path.
    */
  def writePartitioned(df: DataFrame, path: String, dt: String): Unit =
    df.withColumn("dt", lit(dt))
      .write.mode("overwrite").partitionBy("dt").parquet(path)

  /** S5 variant: unpartitioned overwrite (reference products write,
    * `scripts/validation.py:196-199`). */
  def writeUnpartitioned(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** E65: content-stable sharded output write — the training-corpus
    * writer: every row lands in the 16-way shard its id hashes to
    * ([[graft.text.TextAnalysis.shardOf]], the t5/mix1/pk1 hash
    * convention), written as a `shard=N` hive layout so each downstream
    * trainer/reader opens exactly its own directory. Deterministic by
    * construction: a retried/re-run write task re-derives identical shard
    * assignments (vs `repartition(n)`'s round-robin, which reshuffles
    * rows on every retry). The repartition ON the shard column before
    * `partitionBy` means each task writes one shard file, not one file
    * per (task × shard) — at 100 TB that is the difference between 16×
    * tasks files and tasks files. */
  def writeSharded(df: DataFrame, idCol: String, path: String): Unit = {
    val keyed = df.withColumn("shard",
      graft.text.TextAnalysis.shardOf(col(idCol)))
    keyed.repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** Small-files compaction — the maintenance operator every incremental
    * lake store eventually needs: per-batch upserts (e.g.
    * `Pipeline.upsertStore`) accrete one file set per batch, and at 100 TB
    * a scan's task count (and the namenode/listing load) is driven by file
    * COUNT, not bytes. Rewrites the table to ~`targetBytes` files via one
    * round-robin repartition, then swaps directories (crash keeps either
    * the old table or old + finished temp — never a partial mix).
    *
    * Sizing uses the real on-disk byte sum from the FileSystem listing —
    * not a row-count heuristic — so compression ratio carries over.
    *
    * @return (files before, files after)
    */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val fs = FileSystem.get(new java.net.URI(normalizeScheme(path)),
      spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: HPath): Seq[org.apache.hadoop.fs.FileStatus] = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val f = it.next()
        val n = f.getPath.getName
        // skip _ AND . prefixes (ChecksumFileSystem .crc siblings, hidden
        // files) — same filter compactPartitioned applies; counting crc
        // bytes would roughly double totalBytes and miscompute nOut
        if (!n.startsWith("_") && !n.startsWith(".")) buf += f
      }
      buf.toSeq
    }
    val table = new HPath(path)
    // temp/backup live as UNDERSCORE-prefixed siblings: Spark's file
    // listing and partition discovery skip `_`/`.`-prefixed paths, so a
    // crash can never leave a dir that a reader parses as data or as a
    // bogus partition value (a `<part>.compact.tmp` sibling would)
    val tmp = new HPath(table.getParent, s"_${table.getName}.compact.tmp")
    val bak = new HPath(table.getParent, s"_${table.getName}.compact.bak")
    // crash recovery: a prior run that died between the two renames left
    // the table only in the backup — restore it before anything else
    if (!fs.exists(table) && fs.exists(bak)) renameOrFail(fs, bak, table)
    fs.delete(tmp, true)
    fs.delete(bak, true)
    val before = dataFiles(table)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(path).repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    renameOrFail(fs, table, bak)
    renameOrFail(fs, tmp, table)
    fs.delete(bak, true)
    (before.size, dataFiles(table).size)
  }

  /** Hadoop `FileSystem.rename` reports failure by RETURNING FALSE, not
    * throwing — an unchecked rename can silently drop a table (or, on
    * HDFS, nest `src` inside an existing `dst`). Every swap here must
    * fail loud instead. */
  private[graft] def renameOrFail(fs: org.apache.hadoop.fs.FileSystem,
      src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"rename failed: $src -> $dst")

  /** Partition-aware compaction for hive-layout stores (`col=value`
    * subdirectories, e.g. the `order_date`-partitioned KPI store): each
    * partition directory is itself a plain parquet table, so it compacts
    * independently — layout, partition values, and pruning are preserved,
    * and a typical run compacts only the partitions recent batches
    * fragmented. Returns per-partition (before, after) file counts. */
  def compactPartitioned(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Map[String, (Int, Int)] = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val fs = FileSystem.get(new java.net.URI(normalizeScheme(path)),
      spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new HPath(path)).toSeq
      .filter { s =>
        val n = s.getPath.getName
        // real hive partition dirs only — skip `_`/`.` work dirs (e.g. a
        // crashed run's `_<part>.compact.tmp`, which also contains '=')
        s.isDirectory && n.contains("=") &&
          !n.startsWith("_") && !n.startsWith(".")
      }
      .map(s => s.getPath.getName ->
        compact(spark, s.getPath.toString, targetBytes))
      .toMap
  }

  /** S6: JSON result doc (reference `scripts/validation.py:132-142`) — a
    * one-row control message, written driver-side (this is metadata, not
    * data; no reason to spin up a job for it). */
  def writeResultJson(path: String, fields: Map[String, String]): Unit = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val json = fields.map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ", ", "}")
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(p, json)
  }
}
