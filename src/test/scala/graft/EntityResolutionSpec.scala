package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.operators.EntityResolution

/** ER1: blocked fuzzy matching — pair semantics, threshold, and the
  * blocking recall trade on a hand-built fixture. */
class EntityResolutionSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_mktsegment", StringType)))

  private def mk(rows: Row*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)

  test("er1: matches within a block at the edit-distance threshold") {
    val df = mk(
      Row(1L, "alice smith", 1, "RETAIL"),
      Row(2L, "alice smyth", 1, "RETAIL"), // dist 1 -> match
      Row(3L, "alice smthy", 1, "RETAIL"), // dist 2 of #1 -> match
      Row(4L, "robert jones", 1, "RETAIL"), // far from all -> no pair
      Row(5L, "alice smith", 2, "RETAIL"), // exact dup, WRONG block
      Row(6L, "alice smith", 1, "AUTO")) // exact dup, wrong segment
    val out = EntityResolution.entityMatchPairs(df).collect()
      .map(r => (r.getLong(2), r.getLong(3)) -> r.getLong(4)).toMap
    // pairs are de-mirrored (a < b) and carry the exact distance
    assert(out((1L, 2L)) === 1L)
    assert(out((1L, 3L)) === 2L)
    // smyth vs smthy: substitution + adjacent slip = 2 -> also a match
    assert(out((2L, 3L)) === 2L)
    // the blocking trade, pinned: identical names in another block or
    // segment are NOT candidates (recall is bought back by unioning
    // more blocking passes, not by widening this one)
    assert(!out.contains((1L, 5L)) && !out.contains((1L, 6L)))
    // nothing matches the distant name
    assert(out.keySet.flatMap(p => Set(p._1, p._2)) === Set(1L, 2L, 3L))
  }

  test("er2: golden records elect max-balance masters per CC cluster") {
    // chain cluster {1,2,3} via pairwise-close names (1~2 and 2~3 at
    // dist 2 match; 1~3 at dist 4 does NOT — transitivity must come
    // from CC, not the comparator); {5,6} a second cluster; 7
    // unmatched -> excluded
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "alpha aaaa", 1, "RETAIL", 100.0),
      Row(2L, "alpha aabb", 1, "RETAIL", 300.0),
      Row(3L, "alpha bbbb", 1, "RETAIL", 200.0),
      Row(5L, "omega x", 2, "AUTO", -50.0),
      Row(6L, "omega y", 2, "AUTO", -50.0),
      Row(7L, "unrelated name", 1, "RETAIL", 999.0)), 2),
      StructType(Seq(StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("c_nationkey", IntegerType),
        StructField("c_mktsegment", StringType),
        StructField("c_acctbal", DoubleType))))
    try {
      val out = EntityResolution.goldenRecords(df).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
          r.getDouble(4), r.getDouble(5))).toMap
      // cluster label = min member key (the CC convention)
      assert(out.keySet === Set(1L, 5L))
      // {1,2,3}: transitive closure through 2; master = key 2 (300.0)
      assert(out(1L) === ((3L, 2L, 300.0, 600.0)))
      // {5,6}: balance tie -> min key wins; decimal sum exact on
      // negatives
      assert(out(5L) === ((2L, 5L, -50.0, -100.0)))
    } finally spark.catalog.clearCache()
  }

  test("er1: threshold is strict and zero-distance dups still pair") {
    val df = mk(
      Row(1L, "acme corp", 3, "AUTO"),
      Row(2L, "acme corp", 3, "AUTO"), // dist 0
      Row(3L, "acme corpXYZ", 3, "AUTO")) // dist 3 from #1 -> out
    val out = EntityResolution.entityMatchPairs(df).collect()
      .map(r => (r.getLong(2), r.getLong(3)) -> r.getLong(4)).toMap
    assert(out === Map((1L, 2L) -> 0L))
    // widening the threshold admits the distant variant
    val wide = EntityResolution.entityMatchPairs(df, maxDist = 3)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(wide === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("er3: matches pair exactly once across passes; blocks play no role") {
    val df = mk(
      Row(1L, "alice smith", 1, "RETAIL"),
      Row(2L, "alice smyth", 2, "AUTO"),   // dist 1, sorts adjacent — pass 1
      Row(3L, "blice smith", 3, "MACH"),   // LEADING typo of #1: far in
                                           // name order, adjacent reversed
      Row(4L, "robert jones", 1, "RETAIL"),
      Row(5L, "zz unrelated", 2, "AUTO"))
    val out = EntityResolution.sortedNeighborhoodPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // blocking keys play no role (2/3 are in other nations/segments);
    // each matched pair appears EXACTLY once despite two passes
    assert(out === Map((1L, 2L) -> 1L, (1L, 3L) -> 1L, (2L, 3L) -> 2L))
  }

  test("er3: a single-pass sort misses the leading typo the window can't reach") {
    // 6 filler names sort between "alice..." and "blice...": with
    // window 5 the name-order pass can't bridge them, so the pair is
    // the REVERSED pass's catch alone — the multi-pass recall argument
    val filler = (0 until 6).map(i =>
      Row(10L + i, s"am filler $i", 1, "RETAIL"))
    val df = mk(Row(1L, "alice smith", 1, "RETAIL") +:
      Row(2L, "blice smith", 2, "AUTO") +: filler: _*)
    val out = EntityResolution.sortedNeighborhoodPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 2L)),
      "the reversed-name pass must catch the leading-typo pair")
  }

  test("goldenRecordsFromPairs: any pair source drives the same survivorship") {
    import spark.implicits._
    val cust = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "a", 1, "R"), Row(2L, "b", 1, "R"),
      Row(3L, "c", 1, "R"), Row(4L, "d", 1, "R")), 2),
      StructType(Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("c_nationkey", IntegerType),
        StructField("c_mktsegment", StringType))))
      .withColumn("c_acctbal",
        org.apache.spark.sql.functions.col("c_custkey") * 10.0)
    // an external pair relation (no name logic at all): {1,2} and {3,4}
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("custkey_a", "custkey_b")
    val out = EntityResolution.goldenRecordsFromPairs(cust, pairs)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(1L, 3L))
    // survivorship: max balance wins (4 over 3, 2 over 1)
    assert(out(1L).getAs[Long]("golden_custkey") === 2L)
    assert(out(3L).getAs[Long]("golden_custkey") === 4L)
    assert(out(1L).getAs[Double]("total_acctbal") === 30.0)
    spark.catalog.clearCache()
  }

  test("er3∘CC chains transitively on digit-structured names (why no er4 query)") {
    // consecutive numeric names sort adjacent at distance 1: SNM pairs
    // form a PATH, and connected components close it into one cluster —
    // the textbook chaining hazard of threshold-ER under transitive
    // closure (production linkers score pairwise agreement instead)
    val df = mk((0 until 12).map(i =>
      Row(i.toLong, f"cust$i%03d", i % 3, "SEG")): _*)
      .withColumn("c_acctbal",
        org.apache.spark.sql.functions.col("c_custkey").cast("double"))
    val out = EntityResolution.goldenRecordsFromPairs(df,
      EntityResolution.sortedNeighborhoodPairs(df)).collect()
    assert(out.length === 1, "the path closes into one giant cluster")
    assert(out(0).getAs[Long]("n_members") === 12L)
    spark.catalog.clearCache()
  }

  test("er3: window-local recall floor vs er1's blocked ground truth") {
    // the round-10 verdict's measurement, spec-pinned at smoke SF (the
    // full passes x window curve is in BASELINE.md): counts are exact —
    // candidates and distances are integer-deterministic, so these are
    // equalities, not tolerances. The truth count is asserted first so
    // a fixture regeneration fails loudly rather than silently.
    import org.apache.spark.sql.functions.col
    val customers = spark.read.parquet(s"$sf0001/customer.parquet")
    val truth = EntityResolution.entityMatchPairs(customers)
      .select(col("custkey_a"), col("custkey_b")).localCheckpoint(true)
    assert(truth.count() === 58L)
    def recalled(passes: Int, window: Int): Long =
      EntityResolution.sortedNeighborhoodPairsKeys(
          customers, EntityResolution.snmKeys(passes), window)
        .join(truth, Seq("custkey_a", "custkey_b"), "left_semi").count()
    // the shipped default (2 block-blind passes, window 5): the
    // documented window-local tradeoff, quantified — same-block truth
    // pairs sort ~|corpus|/|blocks| ranks apart, so recall is LOW
    assert(recalled(2, EntityResolution.SnmWindow) === 10L)
    // window and passes are both monotone recall knobs
    assert(recalled(2, 2) === 5L)
    assert(recalled(2, 10) === 19L)
    // the block-aware third pass (key DESIGN, the published fix that
    // dominates window size) closes the blocked truth completely here
    assert(recalled(3, EntityResolution.SnmWindow) === 58L)
    spark.catalog.clearCache()
  }

  test("er3: candidate volume is bounded by passes x window x n (linear)") {
    // output pairs are a subset of the probe relation, which is exactly
    // `window` exploded ranks per record per pass — never a block
    // square (40 same-ish names all in 3 blocks would give er1 ~260
    // candidate pairs; SNM's bound here is 2*5*40 regardless of blocks)
    val df = mk((1 to 40).map(i =>
      Row(i.toLong, f"name-$i%03d-${"x" * i}", i % 3, "SEG")): _*)
    val probes = 2L * EntityResolution.SnmWindow * 40L
    val out = EntityResolution.sortedNeighborhoodPairs(df)
    assert(out.count() <= probes, "candidates are bounded by passes*w*n")
  }
}
