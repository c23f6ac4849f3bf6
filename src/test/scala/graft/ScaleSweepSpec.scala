package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.tools.ScaleSweep

/** The scaling-curve evidence in BASELINE.md rests on the fan-out
  * generator's decorrelation properties — pin them: copies preserve the
  * source corpus's duplicate structure EXACTLY (per-copy substitution is
  * injective), per-copy token spaces are pairwise DISJOINT so the
  * vocabulary grows with the fan-out (a closed shared vocabulary made
  * pair candidates grow quadratically in the factor — the round-7
  * measurement artifact), and ids behave as documented. */
class ScaleSweepSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src1"))
  }

  test("documents fan-out: ids dense, dup structure per copy, decorrelated across copies") {
    val d = docs(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"), // exact dup of 0 — must stay a dup in EVERY copy
      (2L, "epsilon zeta eta theta iota kappa"))
    val out = ScaleSweep.scaleDocuments(d, 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out.size === 9)
    // id layout: copy k shifts by k*(max+1)
    assert(out.keySet === (0L until 9L).toSet)
    // within-copy dup structure preserved by the bijection
    for (k <- 0 until 3) {
      assert(out(k * 3 + 0L) === out(k * 3 + 1L),
        s"copy $k must preserve the planted exact dup")
      assert(out(k * 3 + 0L) !== out(k * 3 + 2L))
    }
    // copy 0 is verbatim
    assert(out(0L) === "alpha beta gamma delta")
    // cross-copy decorrelation, open-vocabulary form: each copy's token
    // space is DISJOINT from every other copy's (and from the source),
    // so no token — let alone shingle, band key, or signature — can
    // collide across copies, and the corpus vocabulary grows ×factor
    // exactly as real corpus growth adds vocabulary
    val copyVocabs = (0 until 3).map { k =>
      (0 until 3).flatMap(i => out(k * 3 + i.toLong).split(" ")).toSet
    }
    for (a <- 0 until 3; b <- a + 1 until 3) {
      assert(copyVocabs(a).intersect(copyVocabs(b)).isEmpty,
        s"copies $a and $b share tokens — closed-vocab artifact is back")
    }
    for (k <- 1 until 3) {
      val orig = out(0L).split(" ").toSeq
      val clone = out(k * 3 + 0L).split(" ").toSeq
      assert(orig.length === clone.length)
      orig.zip(clone).foreach { case (o, c) =>
        assert(o !== c, s"copy $k has a fixed point at token '$o'")
      }
      def shingles(t: Seq[String]) = t.sliding(3).map(_.mkString(" ")).toSet
      assert(shingles(orig).intersect(shingles(clone)).isEmpty,
        s"copy $k clone shares 3-gram shingles with the original")
    }
    // the dedup family's planted-twin convention must hold at any factor:
    // exact dedup on the doubled fan-out collapses every pair
    val scaled = ScaleSweep.scaleDocuments(d, 3)
      .select(col("doc_id"), col("text"))
    val dd = Dedup.exactDedup(scaled.unionByName(scaled))
    assert(dd.agg(min(col("copies"))).head.getLong(0) >= 2L)
  }

  test("embeddings fan-out: copy 0 verbatim, clones perturbed, ids dense") {
    import spark.implicits._
    val e = Seq((0L, Array(1.0f, 0.0f, 0.5f), 1),
        (1L, Array(0.2f, 0.9f, 0.1f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = ScaleSweep.scaleEmbeddings(e, 2).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).toArray).toMap
    assert(out.keySet === Set(0L, 1L, 2L, 3L))
    assert(out(0L).toSeq === Seq(1.0f, 0.0f, 0.5f))
    // the clone differs in every perturbed component but stays close
    // (offsets are bounded by ~0.05 in magnitude)
    val diff = out(2L).zip(out(0L)).map { case (a, b) => math.abs(a - b) }
    assert(diff.forall(_ <= 0.051f))
    assert(diff.exists(_ > 0f), "clone must not be a verbatim copy")
  }

  test("fact fan-out: disjoint key spaces, exact RI, per-copy replicas") {
    import spark.implicits._
    val orders = Seq(
      (1L, 10L, "F", 100.0, java.sql.Timestamp.valueOf("1997-01-01 00:00:00"), "1-URGENT"),
      (2L, 11L, "O", 50.0, java.sql.Timestamp.valueOf("1997-02-01 00:00:00"), "3-MEDIUM"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val li = Seq(
      (1L, 100L, 5L, 1, 2.0, 20.0, 0.1, 0.02, "N", "O",
        java.sql.Timestamp.valueOf("1997-01-05 00:00:00")),
      (1L, 101L, 6L, 2, 1.0, 30.0, 0.0, 0.05, "R", "F",
        java.sql.Timestamp.valueOf("1997-01-06 00:00:00")),
      (2L, 100L, 5L, 1, 3.0, 10.0, 0.2, 0.01, "A", "F",
        java.sql.Timestamp.valueOf("1997-02-03 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val cust = Seq((10L, "Customer#10", 3, 5.0, "BUILDING"),
        (11L, "Customer#11", 3, 7.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val supp = Seq((5L, "Supplier#5", 3, 1.0), (6L, "Supplier#6", 4, 2.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val part = Seq((100L, "part a", "B1", "T1", 4, 9.0),
        (101L, "part b", "B2", "T2", 5, 8.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
    val (o, l, c, s, p) = ScaleSweep.scaleFacts(orders, li, cust, supp, part, 3)
    assert(o.count() === 6L && l.count() === 9L && c.count() === 6L &&
      s.count() === 6L && p.count() === 6L)
    // exact referential integrity in EVERY copy: every fact FK resolves
    assert(l.join(o, l("l_orderkey") === o("o_orderkey")).count() === 9L)
    assert(l.join(p, l("l_partkey") === p("p_partkey")).count() === 9L)
    assert(l.join(s, l("l_suppkey") === s("s_suppkey")).count() === 9L)
    assert(o.join(c, o("o_custkey") === c("c_custkey")).count() === 6L)
    // key spaces pairwise disjoint (keys dense per copy, stride = max+1)
    assert(o.select("o_orderkey").distinct().count() === 6L)
    assert(p.select("p_partkey").distinct().count() === 6L)
    // per-copy replica exactness: basket-size distribution preserved —
    // the property the co-purchase graph family's linear claim rests on
    val sizes = l.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .groupBy(col("n")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes === Map(2L -> 3L, 1L -> 3L),
      "each copy must replicate the source basket-size histogram")
    // er decorrelation: the per-copy name suffixes keep every cross-copy
    // name pair above the match threshold even for identical base names
    val names = c.select(col("c_name")).collect().map(_.getString(0))
    val sameBase = names.filter(_.startsWith("Customer#10"))
    assert(sameBase.length === 3)
    for (a <- sameBase; b <- sameBase if a < b) {
      val dist = spark.sql(
        s"SELECT levenshtein('$a', '$b') AS d").head().getInt(0)
      assert(dist > graft.operators.EntityResolution.ErMaxDist,
        s"cross-copy clones of one customer must never er-match: '$a' vs '$b'")
    }
  }

  test("fact+events fan-out: one shared user stride keeps the cross-tier join per-copy") {
    import spark.implicits._
    // user 10 has events AND orders; user 99 exists only in events —
    // the maxima of the two id spaces DIFFER, which is exactly the case
    // where uncoordinated strides would misalign copies (review-caught)
    val orders = Seq(
      (1L, 10L, "F", 100.0, java.sql.Timestamp.valueOf("1997-01-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val li = Seq((1L, 100L, 5L, 1, 2.0, 20.0, 0.1, 0.02, "N", "O",
        java.sql.Timestamp.valueOf("1997-01-05 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val cust = Seq((10L, "Customer#10", 3, 5.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val supp = Seq((5L, "Supplier#5", 3, 1.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val part = Seq((100L, "part a", "B1", "T1", 4, 9.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("1997-01-02 00:00:00"), 10L, "purchase", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("1997-01-03 00:00:00"), 99L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val shared = Some(100L) // > both maxima, as main() derives
    val evF = ScaleSweep.scaleEvents(ev, 3, shared)
    val (oF, _, _, _, _) =
      ScaleSweep.scaleFacts(orders, li, cust, supp, part, 3, shared)
    val joined = oF.join(evF, oF("o_custkey") === evF("user_id")).count()
    assert(joined === 3L,
      "each copy's orders must meet exactly its own copy's events")
  }
}
