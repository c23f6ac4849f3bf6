package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins (the 100-TB checklist's "pre-partition once,
  * join many times" tool): writing both sides bucketed AND sorted by the
  * join key lets every subsequent equi-join on that key run with NO
  * shuffle exchange and no sort — each task zips bucket i of the left
  * table with bucket i of the right. For a fact table joined daily
  * against the same keys, this converts the dominant per-job shuffle into
  * a one-time write cost.
  *
  * Bucketing goes through the catalog (`saveAsTable`) — bucket metadata
  * lives in the metastore, not the parquet files. Bucket counts must be
  * equal (or integer multiples, with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`) on both sides.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Join two bucketed tables on their bucket key — plans shuffle-free
    * when both are bucketed by `key` with compatible bucket counts. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
