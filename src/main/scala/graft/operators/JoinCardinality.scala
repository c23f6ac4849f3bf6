package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis.{CmsA, CmsB, CmsRows}
import graft.functions.TextFunctions.HashP

/** JC1 (E96): join-cardinality estimation from count-min sketches — the
  * cost-based-optimizer statistics primitive every real engine keeps: the
  * expected size of an equi-join is the DOT PRODUCT of the two sides'
  * key-frequency vectors, and the count-min inner product
  * `min over r of Σ_bucket nA(r,b)·nB(r,b)` estimates it from FIXED
  * 3×[[JcWidth]] integer state per table (the published CM-sketch
  * inner-product bound: never an underestimate, error ≤ collisions).
  *
  * Scale: each sketch is ONE narrow scan producing ≤768 mergeable rows —
  * the shape of maintained table statistics (cells add across partitions
  * and ingest batches, the t14/b1 fold convention), so at 100 TB the
  * estimate costs two O(1)-state lookups while the exact answer pays a
  * full key-grain shuffle on both sides. The exact side here IS the
  * verifiable twin (both engines build the identical deterministic
  * sketch, so `est_join_rows` hash-compares exactly), and `over_ratio`
  * SHOWS the collision cost instead of hiding it behind a bound.
  */
object JoinCardinality {

  /** Sketch width for join-size estimation — wider than t14's 256: the
    * inner-product error grows ∝ |A|·|B|/width, and a 6× overestimate
    * (measured at 256 against ~1.5k distinct customers) is useless to a
    * CBO. 3×8192 cells is still trivially broadcast/mergeable state. */
  val JcWidth = 8192L

  private def jcBucket(k: Column, r: Int): Column =
    pmod(pmod(k * lit(CmsA(r)) + lit(CmsB(r)), lit(HashP)), lit(JcWidth))

  /** Key-frequency count-min cells over an integer key column: (r,
    * bucket, n). The key feeds the affine bucket family directly (keys
    * < 2^31 · A < 2^63 — overflow-safe in both engines). */
  def keySketch(df: DataFrame, key: String): DataFrame =
    df.select(col(key).cast("long").as("k"))
      .select(explode(array((0 until CmsRows).map(r =>
        struct(lit(r).as("r"), jcBucket(col("k"), r).as("bucket"))): _*))
        .as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** One row: sketch estimate vs exact join size vs ratio. The exact
    * side is computed at KEY grain (Σ_k nA(k)·nB(k)) — the join's size
    * without materializing the join. */
  def estimateJoinSize(a: DataFrame, aKey: String,
      b: DataFrame, bKey: String): DataFrame = {
    val est = keySketch(a, aKey).withColumnRenamed("n", "n_a")
      .join(keySketch(b, bKey).withColumnRenamed("n", "n_b"),
        Seq("r", "bucket"))
      .groupBy(col("r")).agg(sum(col("n_a") * col("n_b")).as("est_r"))
      .agg(min(col("est_r")).as("est_join_rows"))
    val ka = a.select(col(aKey).cast("long").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_a"))
    val kb = b.select(col(bKey).cast("long").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_b"))
    val exact = ka.join(kb, Seq("k"))
      .agg(coalesce(sum(col("n_a") * col("n_b")), lit(0L))
        .as("exact_join_rows"))
    // 1-row × 1-row: the bounds-frame crossJoin convention. over_ratio
    // is explicitly NULL on an empty exact join (disjoint key sets):
    // Spark 4's ANSI mode THROWS on divide-by-zero (the Kpi.ratio
    // rationale, verified empirically — even for double/long) while
    // DuckDB yields Infinity, so without the guard the query would abort
    // on exactly this edge (oracle uses NULLIF for the same reason)
    est.crossJoin(exact).select(col("est_join_rows"),
      col("exact_join_rows"),
      when(col("exact_join_rows") === 0, lit(null).cast("double"))
        .otherwise(col("est_join_rows").cast("double") /
          col("exact_join_rows"))
        .as("over_ratio"))
  }

  /** The driver query's concrete instance: |orders ⋈ events| on the
    * customer key — genuinely many-to-many on both sides, the case where
    * a CBO actually needs the frequency sketch (unique-key joins are
    * trivially bounded by the fact side). */
  def ordersEventsJoinCard(orders: DataFrame, events: DataFrame): DataFrame =
    estimateJoinSize(orders, "o_custkey", events, "user_id")

  def ordersEventsJoinCardSql: String = {
    val aLit = CmsA.mkString("[", ", ", "]")
    val bLit = CmsB.mkString("[", ", ", "]")
    val bucket = s"((k * cst.ca[t.r + 1] + cst.cb[t.r + 1]) % $HashP) % $JcWidth"
    s"""
    WITH cst AS (SELECT $aLit::BIGINT[] AS ca, $bLit::BIGINT[] AS cb),
    rs AS (SELECT unnest([0, 1, 2]) AS r),
    ea AS (SELECT o_custkey::BIGINT AS k FROM orders),
    eb AS (SELECT user_id::BIGINT AS k FROM events),
    sa AS (
      SELECT t.r, $bucket AS bucket, count(*)::BIGINT AS n_a
      FROM ea, rs t, cst GROUP BY 1, 2),
    sb AS (
      SELECT t.r, $bucket AS bucket, count(*)::BIGINT AS n_b
      FROM eb, rs t, cst GROUP BY 1, 2),
    est AS (
      SELECT min(est_r)::BIGINT AS est_join_rows FROM (
        SELECT r, sum(n_a * n_b) AS est_r
        FROM sa JOIN sb USING (r, bucket) GROUP BY 1)),
    ex AS (
      SELECT coalesce(sum(na.n * nb.n), 0)::BIGINT AS exact_join_rows
      FROM (SELECT k, count(*)::BIGINT AS n FROM ea GROUP BY 1) na
      JOIN (SELECT k, count(*)::BIGINT AS n FROM eb GROUP BY 1) nb
        USING (k))
    SELECT est.est_join_rows, ex.exact_join_rows,
      est.est_join_rows::DOUBLE / NULLIF(ex.exact_join_rows, 0) AS over_ratio
    FROM est, ex"""
  }
}
