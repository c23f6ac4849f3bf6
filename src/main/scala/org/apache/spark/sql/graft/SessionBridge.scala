package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}

/** Re-root a DataFrame's logical plan onto another SparkSession of the
  * same SparkContext. Zero data movement: the session boundary holds only
  * conf/listener/temp-view state, while cached blocks and shuffle files
  * are context-level, so the plan re-analyzes and re-plans under the
  * target session's confs and reads whatever the source session cached.
  *
  * This is what lets an iterative operator (graft.dedup.Dedup's
  * connected-components loop) run with its own `shuffle.partitions` /
  * AQE settings on a `spark.newSession()` clone without mutating — or
  * even observing — the caller session's confs. `Dataset.ofRows` is
  * `private[sql]`, hence this one-liner lives in the `org.apache.spark
  * .sql` namespace (public Spark distribution only — same altitude as
  * the codegen expression shims in this package).
  */
object SessionBridge {
  def rebase(df: DataFrame, to: SparkSession): DataFrame =
    ClassicDataset.ofRows(
      to.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.logical)
}
