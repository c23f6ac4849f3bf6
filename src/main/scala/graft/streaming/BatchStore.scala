package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The per-batch committed-increment store protocol shared by the
  * streaming operators (E114 near-dup signatures, E126 anomaly stats):
  * every micro-batch writes its increment to `dir/batch=<id>` with
  * overwrite mode and an explicit `_graft_committed` marker AFTER the
  * parquet lands (`_SUCCESS` is config-dependent on object stores — the
  * store-protocol convention), and readers admit only marked directories,
  * optionally restricted to batches strictly before a given id (the
  * replay-safe view: a replayed batch overwrites its own partial and can
  * never meet its own first attempt as "prior state"). */
object BatchStore {

  val Marker = "_graft_committed"

  /** Idempotent per-batch write: overwrite the batch directory, then
    * mark. Overwrite wiped any prior marker with the dir, so a replay
    * re-commits atomically-enough (marker exists ⇒ parquet complete). */
  def writeBatch(df: DataFrame, dir: String, batchId: Long): Unit = {
    df.write.mode("overwrite").parquet(s"$dir/batch=$batchId")
    touch(df.sparkSession, s"$dir/batch=$batchId/$Marker")
  }

  def touch(spark: SparkSession, path: String): Unit = {
    val p = new HPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(p, true).close()
  }

  /** The COMMITTED store: every marked batch increment (optionally only
    * those strictly before `beforeBatch`), or None when empty. Unmarked
    * (crashed-partial) and non-numeric directories are skipped, never
    * read. */
  def read(spark: SparkSession, storeDir: String,
      beforeBatch: Option[Long] = None): Option[DataFrame] = {
    val p = new HPath(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val dirs = fs.listStatus(p).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .filter(_.stripPrefix("batch=").forall(_.isDigit))
      .filter(n => beforeBatch.forall(b =>
        n.stripPrefix("batch=").toLong < b))
      .filter(n => fs.exists(new HPath(s"$storeDir/$n/$Marker")))
      .map(n => s"$storeDir/$n")
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs.toIndexedSeq: _*))
  }
}
