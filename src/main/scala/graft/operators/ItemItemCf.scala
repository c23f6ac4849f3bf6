package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** REC1 (E147): item-item collaborative filtering — the classic
  * neighborhood recommender (Sarwar et al. WWW'01; Linden et al., the
  * published Amazon item-to-item scheme): for every product, the top-k
  * most-similar products by CO-PURCHASE COSINE
  * cos(i,j) = co(i,j) / √(n_i·n_j), where n_i counts baskets containing
  * i and co counts baskets containing both. The ranked-list member of
  * the basket family — mb1 emits the pair STATISTICS (support /
  * confidence / lift); this turns the same pair relation into the
  * per-item recommendation LIST a serving layer reads.
  *
  * Shape (the mb1 discipline end to end): baskets form in ONE
  * fact-width shuffle (groupBy order → sorted distinct-part array);
  * canonical pairs explode WITHIN each array (element i × later
  * elements — the fact never meets itself in a shuffle); the
  * min-co-count filter (d7 DF-cap) prunes BEFORE symmetrization and
  * the count join-backs; the top-k is a rank-limited window
  * (WindowGroupLimit pushes k into the shuffle — never a full
  * per-partition sort of the whole pair relation).
  *
  * Determinism: co and the basket counts are exact longs; cosine is
  * co / √(n_i·n_j) — the product is an exact long, and IEEE-754
  * requires sqrt and division to be correctly rounded, so both engines
  * produce the identical double bit pattern. Equal cosines tie-break
  * by recommended id (parity hygiene — and unlike v7's commuting sums,
  * here the tie order IS visible in which row survives the k cut). */
object ItemItemCf {

  /** Per-product top-k co-purchase cosine recommendations:
    * (product_id, rec_product_id, co_count, cosine, rank).
    *
    * `minCo` bounds the pair relation the way mb1/d7 do; `k` is the
    * list length. The basket relation feeds two consumers (pairs, item
    * counts) — persisted; Verify/Bench clearCache after each query. */
  def recommend(lineitem: DataFrame, k: Int = 5,
      minCo: Long = 2L): DataFrame = {
    val baskets = Baskets.baskets(lineitem)
    // persisted: the symmetrization below consumes pairCnt TWICE (src
    // and rec direction), and without a cache each union branch re-runs
    // the pair explode + aggregation — the single most expensive stage
    // of the query (measured: the 12 MB pair-agg shuffle was written
    // twice per run). Post-filter the relation is small (minCo prunes
    // the tail); lifetime follows the house contract (Verify/Bench
    // clearCache after each query).
    val pairCnt = Baskets.canonicalPairs(baskets)
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
      .persist()
    // A recommendation list is per-SOURCE, so the canonical (a<b) pair
    // relation symmetrizes — after the minCo prune, half the rows.
    val sym = pairCnt.select(col("part_a").as("src"),
        col("part_b").as("rec"), col("co"))
      .unionByName(pairCnt.select(col("part_b").as("src"),
        col("part_a").as("rec"), col("co")))
    // persisted for the same reason: joined back twice (cnt_s, cnt_r).
    val ic = Baskets.itemCounts(baskets).persist()
    val scored = sym
      .join(ic.select(col("p").as("src"), col("c").as("cnt_s")),
        Seq("src"))
      .join(ic.select(col("p").as("rec"), col("c").as("cnt_r")),
        Seq("rec"))
      .select(col("src"), col("rec"), col("co"),
        (col("co").cast("double") /
          sqrt((col("cnt_s") * col("cnt_r")).cast("double")))
          .as("cosine"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cosine").desc, col("rec"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("src").as("product_id"),
        col("rec").as("rec_product_id"),
        col("co").as("co_count"), col("cosine"), col("rank"))
  }

  /** Oracle twin: mb1's basket CTE shape, the same canonical pairs +
    * symmetrization, the same correctly-rounded co/√(n·n) boundary. */
  def recommendSql(k: Int = 5, minCo: Long = 2L): String =
    s"""
    WITH b AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    ic AS (SELECT p, count(*)::BIGINT AS c FROM b GROUP BY 1),
    pc AS (
      SELECT x.p AS part_a, y.p AS part_b, count(*)::BIGINT AS co
      FROM b x JOIN b y ON x.o = y.o AND x.p < y.p
      GROUP BY 1, 2 HAVING count(*) >= $minCo),
    sym AS (
      SELECT part_a AS src, part_b AS rec, co FROM pc
      UNION ALL
      SELECT part_b AS src, part_a AS rec, co FROM pc),
    scored AS (
      SELECT s.src, s.rec, s.co,
        s.co::DOUBLE / sqrt((cs.c * cr.c)::DOUBLE) AS cosine
      FROM sym s
        JOIN ic cs ON cs.p = s.src
        JOIN ic cr ON cr.p = s.rec),
    rk AS (
      SELECT src, rec, co, cosine,
        row_number() OVER
          (PARTITION BY src ORDER BY cosine DESC, rec) AS rank
      FROM scored)
    SELECT src AS product_id, rec AS rec_product_id, co AS co_count,
      cosine, rank::BIGINT AS rank
    FROM rk WHERE rank <= $k"""
}
