package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.AsOfJoinApi

import graft.io.Sources

/** The custom as-of join operator: merge-scan physical plan vs the O(n·m)
  * built-in composition — identical results, plus edge-case semantics. */
class AsOfJoinSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("k", LongType),
    StructField("ts", LongType)))

  private def df(rows: (Long, Long, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 3),
      schema)

  /** Reference composition: theta-join on key && r.ts <= l.ts, keep the
    * max-ts right row per left row. The window order carries `rid` desc
    * as the SECOND key so equal-(k, ts) right rows resolve exactly like
    * the custom operator's documented greatest-id tie-break — ordering
    * by rts alone would leave ties to partition layout and the
    * comparison test would only pass while the fixture happens to be
    * tie-free. */
  private def composed(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame) = {
    val j = left.join(right.select(col("id").as("rid"), col("k").as("rk"),
        col("ts").as("rts")),
      col("k") === col("rk") && col("rts") <= col("ts"), "left")
    val w = Window.partitionBy(col("id"))
      .orderBy(col("rts").desc_nulls_last, col("rid").desc_nulls_last)
    j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id"), col("k"), col("ts"), col("rid"), col("rts"))
  }

  test("as-of semantics: latest right row at or before each left ts") {
    val left = df((1L, 7L, 100L), (2L, 7L, 205L), (3L, 8L, 50L), (4L, 9L, 10L))
    val right = df((10L, 7L, 90L), (11L, 7L, 200L), (12L, 7L, 210L),
      (13L, 8L, 50L)) // exact-equal ts must match
    val out = AsOfJoinApi.asofJoin(left, right,
        "k", "k", "ts", "ts")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toMap
    assert(out(1L) === Some(10L)) // 90 <= 100, not 200
    assert(out(2L) === Some(11L)) // 200 <= 205, not 210
    assert(out(3L) === Some(13L)) // ts equality included
    assert(out(4L) === None)      // key 9 has no right rows → null-extended
  }

  test("matches the built-in composition on the real events table") {
    val ev = Sources.table(spark, sf0001, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("id"), col("user_id").as("k"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("id"), col("user_id").as("k"), col("ts"))

    val custom = AsOfJoinApi.asofJoin(purchases,
        clicks.select(col("id").as("rid"), col("k").as("rk"),
          col("ts").as("rts")),
        "k", "rk", "ts", "rts")
      .select(col("id"), col("rid"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap

    val ref = composed(purchases, clicks)
      .collect().map(r => (r.getLong(0), Option(r.get(3)))).toMap

    assert(custom.size === ref.size)
    assert(custom === ref)
    assert(custom.values.exists(_.nonEmpty), "expected some matches")
  }

  test("self-join from one base plan resolves right columns correctly") {
    // left and right share the SAME base plan → same exprIds; without
    // attribute dedup BindReferences silently reads right columns from
    // LEFT ordinals. The api re-aliases the right side when ids overlap.
    val base = df((1L, 7L, 100L), (10L, 7L, 90L), (11L, 7L, 200L))
    val left = base.filter(col("id") < 10L)
    val right = base.filter(col("id") >= 10L)
    val out = AsOfJoinApi.asofJoin(left, right, "k", "k", "ts", "ts")
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(5)) ===
      ((1L, 100L, 10L, 90L)),
      "right-side columns must carry RIGHT values, not aliased left ones")
  }

  test("null keys/timestamps null-extend left rows and drop right rows") {
    import org.apache.spark.sql.Row
    def dfn(rows: Seq[Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val left = dfn(Seq(Row(1L, 7L, 100L), Row(2L, null, 100L),
      Row(3L, 7L, null)))
    val right = dfn(Seq(Row(10L, 7L, 90L), Row(11L, null, 80L),
      Row(12L, 7L, null)))
    val out = AsOfJoinApi.asofJoin(left, right, "k", "k", "ts", "ts")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toMap
    assert(out === Map(
      1L -> Some(10L), // normal match; null-keyed right rows skipped
      2L -> None,      // null key never equals anything (SQL semantics)
      3L -> None))     // null ts cannot order → null-extended
  }

  test("ties on (key, ts) break deterministically (greatest id retained)") {
    val left = df((1L, 7L, 100L))
    val right = df((21L, 7L, 90L), (20L, 7L, 90L), (22L, 7L, 95L),
      (23L, 7L, 95L))
    // latest ts ≤ 100 is 95, held by ids 22 and 23 — the total right-side
    // sort (key, ts, remaining cols) makes 23 the retained match, always
    (1 to 3).foreach { _ =>
      val out = AsOfJoinApi.asofJoin(left, right, "k", "k", "ts", "ts")
        .collect()
      assert(out.map(_.getLong(3)).toSeq === Seq(23L))
    }
  }

  test("physical plan is the custom merge-scan exec") {
    val left = df((1L, 7L, 100L))
    val right = df((10L, 7L, 90L))
    val plan = AsOfJoinApi.asofJoin(left, right,
        "k", "k", "ts", "ts")
      .queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(plan.contains("AsOfJoin"), plan.take(1500))
  }
}
