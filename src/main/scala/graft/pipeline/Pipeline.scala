package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.io.Sources
import graft.kpi.Kpi
import graft.merge.KpiMerge
import graft.schema.Schemas
import graft.validate.Validation

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
      resultPath: String): ValidateResult = {

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
        ordersPaths.map(Sources.normalizeScheme), Some(Schemas.orders))
      val items = Sources.readAndUnion(spark,
        itemsPaths.map(Sources.normalizeScheme), Some(Schemas.orderItems))
      val products = productsPath.map(p =>
        Sources.readParquetOrCsv(spark, Sources.normalizeScheme(p),
          Some(Schemas.products)))

      (orders, items) match {
        case (Some(o), Some(i)) =>
          Validation.validate(o, i, products, Schemas.requiredNonNull) match {
            case Some(err) =>
              emit(ValidateResult("failed", None, Some(err.errorType),
                Some(err.message)))
            case None =>
              // W1 deterministic variant: min(created_at)[:10]
              val dt = o.agg(substring(min(col("created_at")), 1, 10))
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
    * when absent (first run) — the `create_table_if_not_exists` analogue. */
  def readOrInit(spark: SparkSession, path: String, schema: StructType): DataFrame =
    Sources.readTable(spark, path).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema))

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
      val target = readOrInit(spark, s"$storeBase/category_kpi", catSchema)
      val merged = KpiMerge.merge(target, updates,
        Seq("category", "order_date"),
        Seq("daily_revenue", "avg_order_value", "avg_return_rate",
          "last_updated"),
        Some("data_sources"))
        .select(catSchema.fieldNames.map(col): _*)
      writeStore(merged, s"$storeBase/category_kpi")
    }.getOrElse(0L)

    val ordRows = ordKpi.map { k =>
      val updates = k
        .withColumn("order_date", lit(processingDate))
        .withColumn("data_sources", typedLit(sources))
        .withColumn("last_updated", lit(now))
        .select(ordSchema.fieldNames.map(col): _*)
      val target = readOrInit(spark, s"$storeBase/order_kpi", ordSchema)
      val merged = KpiMerge.merge(target, updates,
        Seq("order_date"),
        Seq("total_orders", "total_revenue", "total_items_sold",
          "return_rate", "unique_customers", "last_updated"),
        Some("data_sources"))
        .select(ordSchema.fieldNames.map(col): _*)
      writeStore(merged, s"$storeBase/order_kpi")
    }.getOrElse(0L)

    (catRows, ordRows)
  }

  /** Overwrite the store table safely: the merge plan READS the table being
    * replaced, so write to a sibling temp dir first, then atomically swap —
    * works the same on HDFS/object stores via the Hadoop FileSystem API
    * (no driver-side collect; the store may be arbitrarily large). */
  private def writeStore(df: DataFrame, path: String): Long = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val spark = df.sparkSession
    val tmp = path + ".tmp"
    Sources.writeUnpartitioned(df, tmp)
    val fs = FileSystem.get(new java.net.URI(
      Sources.normalizeScheme(tmp)), spark.sparkContext.hadoopConfiguration)
    val dst = new HPath(path)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(new HPath(tmp), dst)
    spark.read.parquet(path).count()
  }
}
