package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

/** Edge-case fixtures for the x22/x23 TPC-H shapes — the semantics the
  * sf corpora happen not to exercise (no cost ties at either SF; the
  * oracle gate can't see an untraveled branch). Each test runs the REAL
  * `SparkEntry.queries` lambda over a planted parquet directory, so the
  * pinned behavior is the shipped query's, not a re-derivation's.
  */
class OlapEdgeSpec extends SparkSpec {

  private def write(dir: String, name: String, df: DataFrame): Unit =
    df.coalesce(1).write.parquet(s"$dir/$name.parquet")

  test("x22: cost ties all return; an out-of-region cheaper supplier never suppresses them") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-x22").toString
    // nation 1 is in region 1 (the query's scope), nation 2 is not
    write(d, "nation", Seq((1, "INSCOPE", 1), (2, "ELSEWHERE", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey"))
    write(d, "supplier", Seq(
      (1L, "s#1", 1), (2L, "s#2", 1), (3L, "s#3", 2))
      .toDF("s_suppkey", "s_name", "s_nationkey"))
    // part 10 in scope; part 11 fails the size filter
    write(d, "part", Seq(
      (10L, "BRAND-A", "SMALL", 5), (11L, "BRAND-B", "SMALL", 40))
      .toDF("p_partkey", "p_brand", "p_type", "p_size"))
    // s1 and s2 tie at the in-region minimum (5.0; s1's cheaper line
    // wins its own (part, supplier) min first); s3 undercuts at 3.0 but
    // sits outside the region — Q2's trap: the correlated min must be
    // REGION-SCOPED, or s3 would suppress both tie rows
    write(d, "lineitem", Seq(
      (10L, 1L, 7.0), (10L, 1L, 5.0), (10L, 2L, 5.0), (10L, 3L, 3.0),
      (11L, 1L, 1.0))
      .toDF("l_partkey", "l_suppkey", "l_extendedprice"))
    val out = SparkEntry.queries("x22_mincost_supplier")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getDouble(4))).toSet
    assert(out === Set(
      (10L, "BRAND-A", "s#1", "INSCOPE", 5.0),
      (10L, "BRAND-A", "s#2", "INSCOPE", 5.0)))
  }

  test("x23: never-ordered and urgent-only customers both land in the zero bucket") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-x23").toString
    write(d, "customer", Seq(1L, 2L, 3L).toDF("c_custkey"))
    // customer 1: two counted orders; customer 2: only URGENT orders —
    // Q13's trap: the priority predicate belongs to the JOIN (an outer
    // WHERE would erase the row, an inner join the customer); customer
    // 3: no orders at all
    write(d, "orders", Seq(
      (101L, 1L, "5-LOW"), (102L, 1L, "2-HIGH"), (103L, 2L, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority"))
    val out = SparkEntry.queries("x23_order_count_histogram")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((2L, 1L), (0L, 2L)))
  }

  test("x24: exactly-half never qualifies; single-supplier parts do; name/date/region scopes all bind") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = Files.createTempDirectory("graft-x24").toString
    // nation 1 is in region 2 (the query's scope), nation 2 is not
    write(d, "nation", Seq((1, "INSCOPE", 2), (2, "ELSEWHERE", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey"))
    write(d, "supplier", Seq(
      (1L, "s#1", 1), (2L, "s#2", 1), (3L, "s#3", 1), (4L, "s#4", 1),
      (5L, "s#5", 2))
      .toDF("s_suppkey", "s_name", "s_nationkey"))
    // 'small…' names are in scope; part 11 fails the name prefix
    write(d, "part", Seq(
      (10L, "small bolt"), (11L, "big bolt"), (12L, "small gear"),
      (13L, "small cog"), (14L, "small nut"))
      .toDF("p_partkey", "p_name"))
    // part 10: s1/s2 at EXACTLY half each — strict > must exclude both;
    // part 12: s3 30 vs s4 10 (s3 dominant), plus s2's 100 shipped in
    //   1995 — outside the window, so it neither qualifies s2 nor
    //   inflates the part total s3 is measured against;
    // part 13: single supplier s4 (two lines, summed) — trivially
    //   dominant, and s4 must appear ONCE though part 12 rejects it;
    // part 11: s1 dominant but the name is out of scope;
    // part 14: s5 dominant but its nation is out of region
    write(d, "lineitem", Seq(
      (10L, 1L, 10.0, "1996-05-01"), (10L, 2L, 10.0, "1996-06-01"),
      (12L, 3L, 30.0, "1996-03-01"), (12L, 4L, 10.0, "1996-03-02"),
      (12L, 2L, 100.0, "1995-06-01"),
      (13L, 4L, 3.0, "1996-07-01"), (13L, 4L, 2.0, "1996-07-02"),
      (11L, 1L, 50.0, "1996-08-01"),
      (14L, 5L, 50.0, "1996-09-01"))
      .toDF("l_partkey", "l_suppkey", "l_quantity", "ship")
      .withColumn("l_shipdate", to_timestamp(col("ship"))).drop("ship"))
    val out = SparkEntry.queries("x24_dominant_supplier")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1)))
    // collect() preserves the ORDER BY — pinned alongside the set
    assert(out.toSeq === Seq(("s#3", "INSCOPE"), ("s#4", "INSCOPE")))
  }
}
