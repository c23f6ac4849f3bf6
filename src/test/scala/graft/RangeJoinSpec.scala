package graft

import org.apache.spark.sql.functions._

import graft.io.Sources
import graft.operators.RangeJoin

/** Binned range join ≡ the naive containment theta-join, row for row —
  * including intervals that span multiple bins and points on interval
  * endpoints — while planning as a hash equi-join. */
class RangeJoinSpec extends SparkSpec {

  test("binned join equals naive containment join on crafted edge cases") {
    import spark.implicits._
    // bins of width 10; intervals crossing 1, 2 and 3+ bin boundaries,
    // endpoint-inclusive hits, and non-matches
    val points = Seq((1L, 0L), (2L, 9L), (3L, 10L), (4L, 25L), (5L, 99L))
      .toDF("pid", "t")
    val intervals = Seq(
      (100L, 0L, 9L),    // exactly one bin
      (101L, 5L, 26L),   // spans three bins
      (102L, 9L, 10L),   // crosses a boundary, endpoints inclusive
      (103L, 50L, 60L))  // matches nothing
      .toDF("iid", "s", "e")
    val binned = RangeJoin.pointInInterval(points, "t", intervals,
      "s", "e", binWidth = 10L)
      .select(col("pid"), col("iid"))
    val naive = points.join(intervals,
        col("t") >= col("s") && col("t") <= col("e"))
      .select(col("pid"), col("iid"))
    assert(binned.count() === naive.count())
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
    // spot-check the boundary semantics
    val pairs = binned.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((2L, 102L)) && pairs.contains((3L, 102L)),
      "both endpoints are inclusive")
    assert(!pairs.exists(_._2 == 103L))
  }

  test("binned join equals naive join on the real events slice") {
    val ev = Sources.table(spark, sf0001, "events")
    val tsSec = Sources.epochSec(ev)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), tsSec.as("t"))
    val incidents = ev
      .filter(col("event_type") === "error" && col("value") > 50.0)
      .select(col("event_id").as("incident_id"),
        tsSec.as("istart"))
      .withColumn("iend", col("istart") + lit(1800L))
    val binned = RangeJoin.pointInInterval(purchases, "t", incidents,
        "istart", "iend", binWidth = 3600L)
      .select(col("event_id"), col("incident_id"))
    val naive = purchases.join(incidents,
        col("t") >= col("istart") && col("t") <= col("iend"))
      .select(col("event_id"), col("incident_id"))
    assert(binned.count() === naive.count())
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
    assert(binned.count() > 0, "fixture should produce overlaps")
  }

  test("property: binned ≡ naive for random points/intervals and widths") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val pGen = Gen.listOfN(60, Gen.choose(0L, 400L))
    val iGen = Gen.listOfN(15, for {
      s <- Gen.choose(0L, 380L); len <- Gen.choose(0L, 120L)
    } yield (s, s + len))
    (1 to 8).foreach { seed =>
      val ps = pGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val is = iGen.pureApply(Gen.Parameters.default, Seed(seed.toLong + 100))
        .zipWithIndex.map { case ((st, en), i) => (i.toLong, st, en) }
      val points = ps.toDF("pid", "t")
      val intervals = is.toDF("iid", "s", "e")
      val width = Seq(7L, 50L, 1000L)(seed % 3) // narrow, medium, one-bin
      val binned = RangeJoin.pointInInterval(points, "t", intervals,
          "s", "e", width)
        .select(col("pid"), col("iid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val naive = for {
        (pid, t) <- ps; (iid, s, e) <- is; if t >= s && t <= e
      } yield (pid, iid)
      assert(binned === naive.sorted.toSeq, s"seed $seed width $width")
    }
  }

  test("the binned plan is a hash equi-join, not a nested loop") {
    import spark.implicits._
    val points = (0L to 200L).map(i => (i, i * 7 % 500)).toDF("pid", "t")
    val intervals = (0L to 20L).map(i => (i, i * 20, i * 20 + 35))
      .toDF("iid", "s", "e")
    val p = RangeJoin.pointInInterval(points, "t", intervals, "s", "e", 50L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"range join must not plan as a nested loop:\n${p.take(1500)}")
  }
}
